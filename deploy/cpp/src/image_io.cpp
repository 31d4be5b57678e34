// See image_io.h.
#include "image_io.h"

#include <png.h>

#include <cstdio>
#include <cstring>
#include <stdexcept>

namespace openstereo {

ImageU8 read_png_rgb(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open " + path);
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    throw std::runtime_error("libpng read error: " + path);
  }
  png_init_io(png, f);
  png_read_info(png, info);

  // Normalize everything to 8-bit RGB.
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  ImageU8 img;
  img.h = static_cast<int>(png_get_image_height(png, info));
  img.w = static_cast<int>(png_get_image_width(png, info));
  img.rgb.resize(static_cast<size_t>(img.h) * img.w * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.rgb.data() + static_cast<size_t>(y) * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);
  return img;
}

namespace {

void write_png(const std::string& path, const void* data, int h, int w,
               int color_type, int bit_depth, size_t row_bytes) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open for write: " + path);
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    throw std::runtime_error("libpng write error: " + path);
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, bit_depth, color_type, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  if (bit_depth == 16) png_set_swap(png);  // host little-endian → PNG big-endian
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(
        static_cast<const png_byte*>(data) + static_cast<size_t>(y) * row_bytes);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
}

}  // namespace

void write_png_rgb(const std::string& path, const uint8_t* rgb, int h, int w) {
  write_png(path, rgb, h, w, PNG_COLOR_TYPE_RGB, 8,
            static_cast<size_t>(w) * 3);
}

void write_png_u16(const std::string& path, const uint16_t* gray, int h,
                   int w) {
  write_png(path, gray, h, w, PNG_COLOR_TYPE_GRAY, 16,
            static_cast<size_t>(w) * 2);
}

void disp_to_color(const float* disp, int h, int w, float max_disp,
                   uint8_t* rgb_out) {
  // 7-bin KITTI histogram (visualization.py:_BIN_W/_COLORS).
  static const float bin_w[7] = {114.f, 185.f, 114.f, 174.f, 114.f, 185.f, 114.f};
  static const float colors[8][3] = {
      {0, 0, 0}, {0, 0, 1}, {1, 0, 0}, {1, 0, 1},
      {0, 1, 0}, {0, 1, 1}, {1, 1, 0}, {1, 1, 1}};
  float cbins[7];
  float total = 0.f;
  for (int i = 0; i < 7; ++i) total += bin_w[i];
  float acc = 0.f;
  for (int i = 0; i < 7; ++i) {
    acc += bin_w[i];
    cbins[i] = acc / total;
  }
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    float x = disp[i] / max_disp;
    x = x < 0.f ? 0.f : (x > 1.f ? 1.f : x);
    int idx = 0;
    while (idx < 6 && x > cbins[idx]) ++idx;
    const float lower = idx == 0 ? 0.f : cbins[idx - 1];
    const float width = cbins[idx] - lower;
    float t = width > 1e-12f ? (x - lower) / width : 0.f;
    t = t < 0.f ? 0.f : (t > 1.f ? 1.f : t);
    for (int c = 0; c < 3; ++c) {
      const float v = colors[idx][c] * (1.f - t) + colors[idx + 1][c] * t;
      rgb_out[i * 3 + c] = static_cast<uint8_t>(v * 255.f + 0.5f);
    }
  }
}

}  // namespace openstereo
