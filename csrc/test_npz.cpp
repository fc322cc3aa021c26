// npz_reader unit check: parse an npz written by numpy (the same producer as
// runtime/aot.py save_executable) and print each member as
//   name dtype shape nbytes checksum
// The Python test (tests/test_native.py) generates the fixture with np.savez
// and asserts the printout matches.
#include <cinttypes>
#include <cstdio>

#include "npz_reader.h"

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s file.npz\n", argv[0]);
    return 2;
  }
  try {
    auto members = npz::load(argv[1]);
    for (auto& kv : members) {
      const npz::Array& a = kv.second;
      uint64_t sum = 0;
      for (unsigned char c : a.data) sum = sum * 131 + c;
      std::printf("%s %s [", kv.first.c_str(), a.dtype.c_str());
      for (size_t i = 0; i < a.shape.size(); ++i)
        std::printf("%s%" PRId64, i ? "," : "", a.shape[i]);
      std::printf("] %zu %" PRIu64 "\n", a.data.size(), sum);
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "FATAL %s\n", e.what());
    return 1;
  }
  return 0;
}
