// Native host-side preprocessing for the TPU stereo framework.
//
// C++ counterpart of the reference's deployment-time transform runtime
// (reference: deploy/cpp/src/transforms.cpp + the fused CUDA
// pad/transpose/normalize kernel in deploy/cpp/src/transforms_kernel.cu —
// SURVEY.md §2.10). On TPU the device-side fusion is a jitted op; this
// library covers the *host* hot path the reference also accelerates: image
// decode-adjacent work (PFM parsing) and the fused RightTopPad + /255 +
// mean/std normalization producing NHWC float32 batches, multi-threaded
// across rows. Exposed with a plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int clampi(int v, int lo, int hi) { return v < lo ? lo : (v > hi ? hi : v); }

void pad_normalize_rows(const uint8_t* img, int h, int w,
                        int th, int tw, const float* mean, const float* inv_std,
                        float* out, int row_begin, int row_end) {
  // RightTopPad semantics (reference stereo_trans.py:228-252): pad_top = th-h
  // (edge replicate), pad_right = tw-w (edge replicate).
  const int pad_top = th - std::min(h, th);
  for (int ty = row_begin; ty < row_end; ++ty) {
    const int sy = clampi(ty - pad_top, 0, h - 1);
    const uint8_t* src_row = img + static_cast<size_t>(sy) * w * 3;
    float* dst_row = out + static_cast<size_t>(ty) * tw * 3;
    for (int tx = 0; tx < tw; ++tx) {
      const int sx = std::min(tx, w - 1);
      const uint8_t* p = src_row + sx * 3;
      float* q = dst_row + tx * 3;
      q[0] = (p[0] * (1.0f / 255.0f) - mean[0]) * inv_std[0];
      q[1] = (p[1] * (1.0f / 255.0f) - mean[1]) * inv_std[1];
      q[2] = (p[2] * (1.0f / 255.0f) - mean[2]) * inv_std[2];
    }
  }
}

}  // namespace

extern "C" {

// Fused RightTopPad + /255 + mean/std normalize: uint8 HWC → float32 THxTWx3.
void fused_pad_normalize(const uint8_t* img, int h, int w, int th, int tw,
                         const float* mean, const float* std, float* out,
                         int num_threads) {
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  num_threads = std::max(1, num_threads);
  if (num_threads == 1 || th < 2 * num_threads) {
    pad_normalize_rows(img, h, w, th, tw, mean, inv_std, out, 0, th);
    return;
  }
  std::vector<std::thread> workers;
  const int chunk = (th + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int lo = t * chunk;
    const int hi = std::min(th, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back(pad_normalize_rows, img, h, w, th, tw, mean, inv_std,
                         out, lo, hi);
  }
  for (auto& th_ : workers) th_.join();
}

// Batched variant: n images with identical geometry, parallel over images.
void fused_pad_normalize_batch(const uint8_t* imgs, int n, int h, int w,
                               int th, int tw, const float* mean,
                               const float* std, float* out) {
  std::vector<std::thread> workers;
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(th) * tw * 3;
  for (int i = 0; i < n; ++i) {
    workers.emplace_back([=]() {
      fused_pad_normalize(imgs + i * in_stride, h, w, th, tw, mean, std,
                          out + i * out_stride, 1);
    });
  }
  for (auto& t : workers) t.join();
}

// PFM header probe: returns 0 on success, fills h/w/channels/little_endian.
int pfm_header(const char* path, int* h, int* w, int* channels,
               int* little_endian) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char tag[3] = {0};
  if (std::fscanf(f, "%2s", tag) != 1) { std::fclose(f); return -2; }
  if (tag[0] != 'P' || (tag[1] != 'f' && tag[1] != 'F')) { std::fclose(f); return -3; }
  *channels = (tag[1] == 'F') ? 3 : 1;
  float scale = 0.0f;
  if (std::fscanf(f, "%d %d %f", w, h, &scale) != 3) { std::fclose(f); return -4; }
  *little_endian = scale < 0.0f ? 1 : 0;
  std::fclose(f);
  return 0;
}

// PFM payload: fills out[h*w*channels] in top-down row order (PFM stores
// bottom-up; reference dataset_utils/readpfm.py flips). Returns 0 on success.
int pfm_read(const char* path, float* out) {
  int h, w, channels, little_endian;
  int rc = pfm_header(path, &h, &w, &channels, &little_endian);
  if (rc != 0) return rc;
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  // skip the 3 header lines
  int newlines = 0, c;
  while (newlines < 3 && (c = std::fgetc(f)) != EOF) {
    if (c == '\n') ++newlines;
  }
  const size_t row_elems = static_cast<size_t>(w) * channels;
  std::vector<float> row(row_elems);
  for (int y = h - 1; y >= 0; --y) {  // bottom-up storage → flip
    if (std::fread(row.data(), sizeof(float), row_elems, f) != row_elems) {
      std::fclose(f);
      return -5;
    }
    if (!little_endian) {
      for (size_t i = 0; i < row_elems; ++i) {
        uint32_t v;
        std::memcpy(&v, &row[i], 4);
        v = __builtin_bswap32(v);
        std::memcpy(&row[i], &v, 4);
      }
    }
    std::memcpy(out + static_cast<size_t>(y) * row_elems, row.data(),
                row_elems * sizeof(float));
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
