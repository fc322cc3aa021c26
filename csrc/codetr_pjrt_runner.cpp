// codetr_tpu standalone native runtime: PJRT C API executable runner.
//
// The analog of the reference's C++ engine mode (codetr_inference.cpp:322-438:
// createInferRuntime -> deserializeCudaEngine -> enqueueV3 with manual
// cudaMalloc/Memcpy).  Here the "engine" is the StableHLO module exported by
// export_aot.py (<name>.stablehlo, StableHLO bytecode); the device runtime is
// any PJRT plugin (libtpu.so on a TPU VM, a CPU plugin elsewhere), loaded with
// dlopen and driven through the PJRT C API:
//
//   dlopen(plugin) -> GetPjrtApi() -> PJRT_Client_Create ->
//   PJRT_Client_Compile(StableHLO) -> BufferFromHostBuffer(inputs) ->
//   PJRT_LoadedExecutable_Execute (timed loop) -> ToHostBuffer(outputs)
//
// Pre/post-processing reuses the codetr_host library (keep-ratio resize +
// normalize + pad; per-class NMS) — the same split as the reference binary
// (preprocess_image :31-81, postprocess :83-112).
//
// Build: cmake -S csrc -B csrc/build && cmake --build csrc/build
// Smoke (no devices needed):   codetr_pjrt_runner --plugin libtpu.so --smoke
// Full run (on a TPU host):    codetr_pjrt_runner --plugin libtpu.so \
//     --model out/codetr.stablehlo --height 608 --width 608 [--iterations 20]

#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <vector>

#include "npz_reader.h"
#include "pjrt_c_api.h"

#ifdef HAVE_OPENCV
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#endif

extern "C" int codetr_preprocess(const uint8_t*, int, int, int, int,
                                 const float*, const float*, int, float*,
                                 float*, float*, int*);
extern "C" int codetr_batched_nms(const float*, const float*, const int32_t*,
                                  int, float, float, uint8_t*);

namespace {

struct Args {
  std::string plugin;
  std::string model;
  std::string params;  // companion .params.npz (weights-as-args artifacts)
  std::string image;   // image file (jpg/png via OpenCV) or raw HxWx3 dump
  int image_h = 0, image_w = 0;
  int height = 608, width = 608;
  int iterations = 20;
  bool smoke = false;
  bool bf16 = false;
  float score_threshold = 0.0f;
  float iou_threshold = 0.8f;
  // prefix for raw f32 dumps of the model outputs (<p>.boxes.bin /
  // .scores.bin / .labels.bin) — lets tests compare the native execute
  // path against the Python Inferencer at full precision instead of
  // parsing the 5-row %.1f detection printout
  std::string dump_raw;
  // named PJRT_Client_Create options ("k=v"; all-digit v sent as int64) —
  // plugins like the axon tunnel require topology/session parameters that
  // jax normally supplies (axon/register/pjrt.py _register_backend)
  std::vector<std::pair<std::string, std::string>> client_options;
};

const PJRT_Api* g_api = nullptr;

void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "FATAL %s: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

std::vector<char> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "FATAL cannot open %s\n", path.c_str());
    std::exit(1);
  }
  return std::vector<char>((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
}

// float32 -> bfloat16 (round-to-nearest-even), matching XLA host conversion.
void f32_to_bf16(const float* src, uint16_t* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    uint32_t bits;
    std::memcpy(&bits, &src[i], 4);
    uint32_t lsb = (bits >> 16) & 1;
    bits += 0x7fff + lsb;
    dst[i] = static_cast<uint16_t>(bits >> 16);
  }
}

PJRT_Buffer* to_device(PJRT_Client* client, PJRT_Device* device,
                       const void* data, PJRT_Buffer_Type type,
                       const std::vector<int64_t>& dims) {
  PJRT_Client_BufferFromHostBuffer_Args a;
  std::memset(&a, 0, sizeof(a));
  a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  a.client = client;
  a.data = data;
  a.type = type;
  a.dims = dims.data();
  a.num_dims = dims.size();
  a.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  a.device = device;
  check(g_api->PJRT_Client_BufferFromHostBuffer(&a), "BufferFromHostBuffer");
  // wait until the runtime is done with the host memory
  PJRT_Event_Await_Args ea;
  std::memset(&ea, 0, sizeof(ea));
  ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  ea.event = a.done_with_host_buffer;
  check(g_api->PJRT_Event_Await(&ea), "Event_Await(h2d)");
  PJRT_Event_Destroy_Args ed;
  std::memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.event = a.done_with_host_buffer;
  g_api->PJRT_Event_Destroy(&ed);
  return a.buffer;
}

std::vector<float> to_host_f32(PJRT_Buffer* buf) {
  PJRT_Buffer_ToHostBuffer_Args a;
  std::memset(&a, 0, sizeof(a));
  a.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  a.src = buf;
  a.dst = nullptr;  // query size first
  check(g_api->PJRT_Buffer_ToHostBuffer(&a), "ToHostBuffer(size)");
  std::vector<char> raw(a.dst_size);
  a.dst = raw.data();
  check(g_api->PJRT_Buffer_ToHostBuffer(&a), "ToHostBuffer(copy)");
  PJRT_Event_Await_Args ea;
  std::memset(&ea, 0, sizeof(ea));
  ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  ea.event = a.event;
  check(g_api->PJRT_Event_Await(&ea), "Event_Await(d2h)");
  PJRT_Event_Destroy_Args ed;
  std::memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.event = a.event;
  g_api->PJRT_Event_Destroy(&ed);

  // element type of the result buffer
  PJRT_Buffer_ElementType_Args et;
  std::memset(&et, 0, sizeof(et));
  et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
  et.buffer = buf;
  check(g_api->PJRT_Buffer_ElementType(&et), "ElementType");

  std::vector<float> out;
  if (et.type == PJRT_Buffer_Type_F32) {
    out.resize(raw.size() / 4);
    std::memcpy(out.data(), raw.data(), raw.size());
  } else if (et.type == PJRT_Buffer_Type_BF16) {
    out.resize(raw.size() / 2);
    const uint16_t* p = reinterpret_cast<const uint16_t*>(raw.data());
    for (size_t i = 0; i < out.size(); ++i) {
      uint32_t bits = static_cast<uint32_t>(p[i]) << 16;
      std::memcpy(&out[i], &bits, 4);
    }
  } else if (et.type == PJRT_Buffer_Type_S32) {
    out.resize(raw.size() / 4);
    const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
    for (size_t i = 0; i < out.size(); ++i) out[i] = static_cast<float>(p[i]);
  } else {
    std::fprintf(stderr, "FATAL unsupported output element type %d\n",
                 static_cast<int>(et.type));
    std::exit(1);
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  Args args;
  for (int i = 1; i < argc; ++i) {
    std::string k = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "FATAL missing value for %s\n", k.c_str());
        std::exit(2);
      }
      return argv[++i];
    };
    if (k == "--plugin") args.plugin = next();
    else if (k == "--model") args.model = next();
    else if (k == "--params") args.params = next();
    else if (k == "--image") args.image = next();
    else if (k == "--image-height") args.image_h = std::stoi(next());
    else if (k == "--image-width") args.image_w = std::stoi(next());
    else if (k == "--height") args.height = std::stoi(next());
    else if (k == "--width") args.width = std::stoi(next());
    else if (k == "--iterations") args.iterations = std::stoi(next());
    else if (k == "--score-threshold") args.score_threshold = std::stof(next());
    else if (k == "--iou-threshold") args.iou_threshold = std::stof(next());
    else if (k == "--bf16") args.bf16 = true;
    else if (k == "--dump-raw") args.dump_raw = next();
    else if (k == "--client-option") {
      std::string kv = next();
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        std::fprintf(stderr, "FATAL --client-option expects k=v, got %s\n",
                     kv.c_str());
        return 2;
      }
      args.client_options.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    }
    else if (k == "--smoke") args.smoke = true;
    else {
      std::fprintf(stderr,
                   "usage: %s --plugin <pjrt_plugin.so> [--smoke] "
                   "[--model m.stablehlo [--params m.params.npz] "
                   "--height H --width W [--bf16] "
                   "[--image x.jpg | --image raw_rgb.bin --image-height H "
                   "--image-width W] [--iterations N] [--dump-raw prefix]]\n",
                   argv[0]);
      return 2;
    }
  }
  if (args.plugin.empty()) {
    std::fprintf(stderr, "FATAL --plugin is required\n");
    return 2;
  }

  // ---- plugin load (the reference loads its TRT plugin the same way:
  // codetr_inference.cpp:180-195 registry->loadLibrary) ----
  void* handle = dlopen(args.plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, "FATAL dlopen(%s): %s\n", args.plugin.c_str(),
                 dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "FATAL %s does not export GetPjrtApi\n",
                 args.plugin.c_str());
    return 1;
  }
  g_api = get_api();
  std::printf("plugin: %s\n", args.plugin.c_str());
  std::printf("pjrt api version: %d.%d\n",
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  // plugin-level initialization (required before any other call)
  PJRT_Plugin_Initialize_Args pi;
  std::memset(&pi, 0, sizeof(pi));
  pi.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(g_api->PJRT_Plugin_Initialize(&pi), "Plugin_Initialize");

  if (args.smoke) {
    std::printf("smoke ok: plugin loaded, API table valid\n");
    return 0;
  }

  // ---- client + device ----
  // named create options (e.g. the axon tunnel plugin needs
  // topology/session_id/remote_compile, matching what jax's registration
  // passes in axon/register/pjrt.py); all-digit values go as int64
  std::vector<PJRT_NamedValue> nvs;
  nvs.reserve(args.client_options.size());
  for (auto& [key, val] : args.client_options) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = key.c_str();
    nv.name_size = key.size();
    bool all_digit = !val.empty() &&
                     val.find_first_not_of("0123456789") == std::string::npos;
    if (all_digit) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = std::stoll(val);
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = val.c_str();
      nv.value_size = val.size();
    }
    nvs.push_back(nv);
  }
  PJRT_Client_Create_Args cc;
  std::memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = nvs.empty() ? nullptr : nvs.data();
  cc.num_options = nvs.size();
  check(g_api->PJRT_Client_Create(&cc), "Client_Create");
  PJRT_Client* client = cc.client;

  PJRT_Client_PlatformName_Args pn;
  std::memset(&pn, 0, sizeof(pn));
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = client;
  check(g_api->PJRT_Client_PlatformName(&pn), "PlatformName");
  std::printf("platform: %.*s\n", static_cast<int>(pn.platform_name_size),
              pn.platform_name);

  PJRT_Client_AddressableDevices_Args ad;
  std::memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&ad), "AddressableDevices");
  if (ad.num_addressable_devices == 0) {
    std::fprintf(stderr, "FATAL no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = ad.addressable_devices[0];
  std::printf("devices: %zu\n", ad.num_addressable_devices);

  // ---- compile the StableHLO module (engine-deserialize analog) ----
  if (args.model.empty()) {
    std::fprintf(stderr, "FATAL --model required without --smoke\n");
    return 2;
  }
  std::vector<char> module_bytes = read_file(args.model);
  std::printf("model: %s (%zu bytes)\n", args.model.c_str(),
              module_bytes.size());

  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = module_bytes.data();
  program.code_size = module_bytes.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  // empty serialized xla::CompileOptionsProto == all-defaults options
  comp.compile_options = "";
  comp.compile_options_size = 0;
  auto tc0 = std::chrono::steady_clock::now();
  check(g_api->PJRT_Client_Compile(&comp), "Compile");
  auto tc1 = std::chrono::steady_clock::now();
  std::printf("compile: %.1f s\n",
              std::chrono::duration<double>(tc1 - tc0).count());
  PJRT_LoadedExecutable* exec = comp.executable;

  // ---- weights (weights-as-args artifacts): the companion .params.npz is
  // uploaded leaf-by-leaf in the module's flattened calling-convention
  // order, recorded by save_executable as meta "param_order" (parity with
  // the reference's full-engine mode, codetr_inference.cpp:322-438, where
  // the engine file embeds its weights) ----
  std::vector<PJRT_Buffer*> weight_bufs;
  if (!args.params.empty()) {
    auto members = npz::load(args.params);
    std::map<std::string, const npz::Array*> by_name;
    for (auto& kv : members) by_name[kv.first] = &kv.second;
    // param_order from <base>.meta.json (base = model path minus .stablehlo)
    std::vector<std::string> order;
    std::string base = args.model;
    const std::string suf = ".stablehlo";
    if (base.size() > suf.size() &&
        base.substr(base.size() - suf.size()) == suf)
      base = base.substr(0, base.size() - suf.size());
    std::ifstream mf(base + ".meta.json");
    if (mf) {
      std::string meta((std::istreambuf_iterator<char>(mf)),
                       std::istreambuf_iterator<char>());
      size_t k = meta.find("\"param_order\"");
      if (k != std::string::npos) {
        size_t b0 = meta.find('[', k);
        size_t b1 = meta.find(']', b0);
        size_t pos = b0;
        while (true) {
          size_t q0 = meta.find('"', pos);
          if (q0 == std::string::npos || q0 > b1) break;
          size_t q1 = meta.find('"', q0 + 1);
          order.push_back(meta.substr(q0 + 1, q1 - q0 - 1));
          pos = q1 + 1;
        }
      }
    }
    if (order.empty()) {
      // fall back to the npz member order (the writer inserts in
      // calling-convention order)
      for (auto& kv : members) order.push_back(kv.first);
      std::printf("params: no param_order in meta; using npz member order\n");
    }
    size_t total_bytes = 0;
    for (const std::string& name : order) {
      auto it = by_name.find(name);
      if (it == by_name.end()) {
        std::fprintf(stderr, "FATAL param %s missing from %s\n", name.c_str(),
                     args.params.c_str());
        return 1;
      }
      const npz::Array& a = *it->second;
      PJRT_Buffer_Type t;
      if (a.dtype == "f4") t = PJRT_Buffer_Type_F32;
      else if (a.dtype == "f2") t = PJRT_Buffer_Type_F16;
      else if (a.dtype == "i4") t = PJRT_Buffer_Type_S32;
      else if (a.dtype == "u1") t = PJRT_Buffer_Type_U8;
      else {
        std::fprintf(stderr, "FATAL param %s has unsupported dtype %s\n",
                     name.c_str(), a.dtype.c_str());
        return 1;
      }
      weight_bufs.push_back(
          to_device(client, device, a.data.data(), t, a.shape));
      total_bytes += a.data.size();
    }
    std::printf("params: %zu leaves, %.1f MB uploaded\n", weight_bufs.size(),
                total_bytes / 1048576.0);
  }

  // ---- inputs: preprocess (host lib) or zeros ----
  const int H = args.height, W = args.width;
  std::vector<float> input_f32(static_cast<size_t>(H) * W * 3, 0.0f);
  std::vector<float> mask(static_cast<size_t>(H) * W, 0.0f);
  float scale[2] = {1.0f, 1.0f};
  if (!args.image.empty()) {
    std::vector<uint8_t> rgb;
    int ih = args.image_h, iw = args.image_w;
    bool is_raw = ih > 0 && iw > 0;
    if (is_raw) {
      std::vector<char> raw = read_file(args.image);
      if (raw.size() != static_cast<size_t>(ih) * iw * 3) {
        std::fprintf(stderr, "FATAL bad --image dims\n");
        return 2;
      }
      rgb.assign(raw.begin(), raw.end());
    } else {
#ifdef HAVE_OPENCV
      // image-file input, reference parity (codetr_inference.cpp:571
      // cv::imread); BGR -> RGB like the reference's cvtColor
      cv::Mat bgr = cv::imread(args.image, cv::IMREAD_COLOR);
      if (bgr.empty()) {
        std::fprintf(stderr, "FATAL cv::imread(%s) failed\n",
                     args.image.c_str());
        return 2;
      }
      cv::Mat m;
      cv::cvtColor(bgr, m, cv::COLOR_BGR2RGB);
      ih = m.rows;
      iw = m.cols;
      rgb.resize(static_cast<size_t>(ih) * iw * 3);
      std::memcpy(rgb.data(), m.data, rgb.size());
#else
      std::fprintf(stderr,
                   "FATAL built without OpenCV: pass a raw dump with "
                   "--image-height/--image-width\n");
      return 2;
#endif
    }
    const float kMean[3] = {123.675f, 116.28f, 103.53f};
    const float kStd[3] = {58.395f, 57.12f, 57.375f};
    int resized[2];
    codetr_preprocess(rgb.data(), ih, iw, H, W, kMean, kStd,
                      /*keep_ratio=*/1, input_f32.data(), mask.data(), scale,
                      resized);
    std::printf("preprocess: %dx%d -> resized %dx%d scale %.4f/%.4f\n", iw, ih,
                resized[0], resized[1], scale[0], scale[1]);
  }

  std::vector<int64_t> in_dims = {1, H, W, 3};
  std::vector<int64_t> mask_dims = {1, H, W};
  PJRT_Buffer* in0;
  std::vector<uint16_t> input_bf16;
  if (args.bf16) {
    input_bf16.resize(input_f32.size());
    f32_to_bf16(input_f32.data(), input_bf16.data(), input_f32.size());
    in0 = to_device(client, device, input_bf16.data(), PJRT_Buffer_Type_BF16,
                    in_dims);
  } else {
    in0 = to_device(client, device, input_f32.data(), PJRT_Buffer_Type_F32,
                    in_dims);
  }
  PJRT_Buffer* in1 =
      to_device(client, device, mask.data(), PJRT_Buffer_Type_F32, mask_dims);

  // ---- execute (timed loop, reference codetr_inference.cpp:388-401) ----
  // calling convention: [params leaves..., batch_inputs, img_masks]
  std::vector<PJRT_Buffer*> argv_vec = weight_bufs;
  argv_vec.push_back(in0);
  argv_vec.push_back(in1);
  PJRT_Buffer** argv_bufs = argv_vec.data();
  PJRT_Buffer* const* arg_lists[1] = {argv_bufs};
  std::vector<PJRT_Buffer*> out_bufs(8, nullptr);
  PJRT_Buffer** out_lists[1] = {out_bufs.data()};

  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &opts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = argv_vec.size();
  ex.output_lists = out_lists;
  PJRT_Event* done = nullptr;
  ex.device_complete_events = &done;
  ex.execute_device = device;

  auto run_once = [&]() {
    check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    PJRT_Event_Await_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ea.event = done;
    check(g_api->PJRT_Event_Await(&ea), "Event_Await(exec)");
    PJRT_Event_Destroy_Args ed;
    std::memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = done;
    g_api->PJRT_Event_Destroy(&ed);
  };

  run_once();  // warmup (also materializes outputs)
  std::vector<float> boxes = to_host_f32(out_bufs[0]);
  std::vector<float> scores = to_host_f32(out_bufs[1]);
  std::vector<float> labels_f = to_host_f32(out_bufs[2]);
  const int n = static_cast<int>(scores.size());
  std::printf("outputs: boxes %zu scores %zu labels %zu\n", boxes.size() / 4,
              scores.size(), labels_f.size());

  if (!args.dump_raw.empty()) {
    auto dump = [&](const char* suffix, const std::vector<float>& v) {
      std::string p = args.dump_raw + suffix;
      std::FILE* f = std::fopen(p.c_str(), "wb");
      if (!f) {
        std::fprintf(stderr, "FATAL fopen(%s) failed\n", p.c_str());
        std::exit(2);
      }
      std::fwrite(v.data(), sizeof(float), v.size(), f);
      std::fclose(f);
    };
    dump(".boxes.bin", boxes);
    dump(".scores.bin", scores);
    dump(".labels.bin", labels_f);
    std::printf("raw outputs dumped to %s.{boxes,scores,labels}.bin\n",
                args.dump_raw.c_str());
  }

  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < args.iterations; ++i) run_once();
  auto t1 = std::chrono::steady_clock::now();
  std::printf("latency: %.2f ms/iter over %d iters\n",
              std::chrono::duration<double, std::milli>(t1 - t0).count() /
                  args.iterations,
              args.iterations);

  // ---- postprocess: per-class NMS (host lib) ----
  std::vector<int32_t> labels(n);
  for (int i = 0; i < n; ++i) labels[i] = static_cast<int32_t>(labels_f[i]);
  std::vector<uint8_t> keep(n, 0);
  codetr_batched_nms(boxes.data(), scores.data(), labels.data(), n,
                     args.iou_threshold, args.score_threshold, keep.data());
  int kept = 0;
  for (int i = 0; i < n; ++i) kept += keep[i];
  std::printf("detections after NMS: %d\n", kept);
  for (int i = 0, shown = 0; i < n && shown < 5; ++i) {
    if (!keep[i]) continue;
    std::printf("  box [%.1f %.1f %.1f %.1f] score %.3f label %d\n",
                boxes[i * 4 + 0] / scale[0], boxes[i * 4 + 1] / scale[1],
                boxes[i * 4 + 2] / scale[0], boxes[i * 4 + 3] / scale[1],
                scores[i], labels[i]);
    ++shown;
  }
  std::printf("ok\n");
  return 0;
}
