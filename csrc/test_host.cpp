// Smoke test for the native host library (the analog of the reference's
// plugin load/lookup smoke test, csrc_tests/test_plugin.cpp): exercises
// preprocess + NMS end-to-end and checks invariants.
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
int codetr_preprocess(const uint8_t*, int, int, int, int, const float*,
                      const float*, int, float*, float*, float*, int*);
int codetr_batched_nms(const float*, const float*, const int32_t*, int, float,
                       float, uint8_t*);
const char* codetr_host_version();
}

int main() {
  assert(std::strcmp(codetr_host_version(), "codetr-tpu-host-0.1.0") == 0);

  // preprocess: 40x80 -> 64x64 canvas, keep ratio -> resized 64x32
  const int ih = 40, iw = 80, oh = 64, ow = 64;
  std::vector<uint8_t> img(ih * iw * 3, 100);
  const float mean[3] = {123.675f, 116.28f, 103.53f};
  const float stdv[3] = {58.395f, 57.12f, 57.375f};
  std::vector<float> out(oh * ow * 3), mask(oh * ow);
  float scale[2];
  int resized[2];
  int rc = codetr_preprocess(img.data(), ih, iw, oh, ow, mean, stdv, 1,
                             out.data(), mask.data(), scale, resized);
  assert(rc == 0);
  assert(resized[1] == 64 && resized[0] == 32);
  // constant image -> constant normalized value inside, 0 in padding
  const float want = (100.0f - mean[0]) / stdv[0];
  assert(std::abs(out[0] - want) < 1e-4);
  assert(out[(40 * ow + 0) * 3] == 0.0f);  // padded row
  assert(mask[0] == 0.0f && mask[40 * ow] == 1.0f);

  // NMS: two overlapping boxes same class + one other class
  const float boxes[12] = {0, 0, 10, 10, 1, 1, 11, 11, 0, 0, 10, 10};
  const float scores[3] = {0.9f, 0.8f, 0.7f};
  const int32_t labels[3] = {0, 0, 1};
  uint8_t keep[3];
  int kept = codetr_batched_nms(boxes, scores, labels, 3, 0.5f, 0.1f, keep);
  assert(kept == 2);
  assert(keep[0] == 1 && keep[1] == 0 && keep[2] == 1);

  std::printf("codetr host smoke test: OK\n");
  return 0;
}
