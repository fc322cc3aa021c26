// Minimal .npz reader for the codetr weights-as-args artifact.
//
// np.savez writes an UNCOMPRESSED (method 0, "stored") zip whose members are
// .npy files; this parser walks the local file headers sequentially and
// parses each npy header (dtype descr / fortran_order / shape).  It supports
// exactly what runtime/aot.py:save_executable emits — C-order, little-endian
// f4/f2/i4/u1 and bfloat16 (numpy writes jax bf16 arrays with descr 'V2'
// via their raw bytes? no: the exporter saves fp32) — and fails loudly on
// anything else.  ~150 LoC beats linking libzip for one fixed producer.
// (Reference analog: the TRT engine file simply embeds its weights —
// codetr_inference.cpp:197-227 deserializes them with the engine.)
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace npz {

struct Array {
  std::string dtype;           // numpy descr without byte order, e.g. "f4"
  std::vector<int64_t> shape;  // C-order dims
  std::vector<char> data;      // raw little-endian buffer
  size_t elements() const {
    size_t n = 1;
    for (int64_t d : shape) n *= static_cast<size_t>(d);
    return n;
  }
};

inline uint16_t rd16(const char* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}
inline uint32_t rd32(const char* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

// Parse the npy payload of one zip member.
inline Array parse_npy(const std::vector<char>& buf) {
  if (buf.size() < 10 || std::memcmp(buf.data(), "\x93NUMPY", 6) != 0)
    throw std::runtime_error("npz member is not an npy file");
  uint8_t major = static_cast<uint8_t>(buf[6]);
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(buf.data() + 8);
    hoff = 10;
  } else {  // version 2/3: 4-byte header length
    hlen = rd32(buf.data() + 8);
    hoff = 12;
  }
  std::string header(buf.data() + hoff, buf.data() + hoff + hlen);

  auto dict_value = [&](const std::string& key) -> std::string {
    size_t k = header.find("'" + key + "'");
    if (k == std::string::npos) throw std::runtime_error("npy header missing " + key);
    size_t c = header.find(':', k);
    size_t v = header.find_first_not_of(" ", c + 1);
    return header.substr(v);
  };

  Array a;
  {
    std::string d = dict_value("descr");  // like '<f4', ...
    size_t q0 = d.find('\'');
    size_t q1 = d.find('\'', q0 + 1);
    std::string descr = d.substr(q0 + 1, q1 - q0 - 1);
    if (!descr.empty() && (descr[0] == '<' || descr[0] == '|' || descr[0] == '='))
      descr = descr.substr(1);
    else if (!descr.empty() && descr[0] == '>')
      throw std::runtime_error("big-endian npy not supported");
    a.dtype = descr;
  }
  if (dict_value("fortran_order").rfind("True", 0) == 0)
    throw std::runtime_error("fortran-order npy not supported");
  {
    std::string s = dict_value("shape");  // like (3, 4), or ()
    size_t p0 = s.find('(');
    size_t p1 = s.find(')');
    std::string inner = s.substr(p0 + 1, p1 - p0 - 1);
    size_t pos = 0;
    while (pos < inner.size()) {
      size_t end = inner.find(',', pos);
      std::string tok = inner.substr(pos, end == std::string::npos ? std::string::npos : end - pos);
      size_t ws = tok.find_first_not_of(" ");
      if (ws != std::string::npos && tok.find_first_of("0123456789") != std::string::npos)
        a.shape.push_back(std::stoll(tok.substr(ws)));
      if (end == std::string::npos) break;
      pos = end + 1;
    }
  }
  a.data.assign(buf.begin() + static_cast<long>(hoff + hlen), buf.end());
  return a;
}

// Walk local file headers of an uncompressed zip; returns name -> Array in
// file order (std::vector preserves the writer's member order).
inline std::vector<std::pair<std::string, Array>> load(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::vector<char> zip((std::istreambuf_iterator<char>(f)),
                        std::istreambuf_iterator<char>());
  std::vector<std::pair<std::string, Array>> out;
  size_t off = 0;
  while (off + 30 <= zip.size()) {
    uint32_t sig = rd32(zip.data() + off);
    if (sig != 0x04034b50) break;  // central directory reached
    uint16_t flags = rd16(zip.data() + off + 6);
    uint16_t method = rd16(zip.data() + off + 8);
    uint64_t csize = rd32(zip.data() + off + 18);
    uint64_t usize = rd32(zip.data() + off + 22);
    uint16_t nlen = rd16(zip.data() + off + 26);
    uint16_t elen = rd16(zip.data() + off + 28);
    std::string name(zip.data() + off + 30, zip.data() + off + 30 + nlen);
    // zip64: sizes live in the extra field (tag 0x0001)
    if (csize == 0xffffffffu || usize == 0xffffffffu) {
      const char* e = zip.data() + off + 30 + nlen;
      const char* eend = e + elen;
      while (e + 4 <= eend) {
        uint16_t tag = rd16(e), sz = rd16(e + 2);
        if (tag == 0x0001 && sz >= 16) {
          std::memcpy(&usize, e + 4, 8);
          std::memcpy(&csize, e + 12, 8);
          break;
        }
        e += 4 + sz;
      }
    }
    if (method != 0) throw std::runtime_error("compressed npz member: " + name);
    if (flags & 0x8) throw std::runtime_error("streamed zip member: " + name);
    size_t data_off = off + 30 + nlen + elen;
    if (data_off + csize > zip.size()) throw std::runtime_error("truncated zip");
    std::vector<char> member(zip.begin() + static_cast<long>(data_off),
                             zip.begin() + static_cast<long>(data_off + csize));
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    out.emplace_back(name, parse_npy(member));
    off = data_off + csize;
  }
  if (out.empty()) throw std::runtime_error("no members parsed from " + path);
  return out;
}

}  // namespace npz
