// PNG/PFM image IO for the native inference app.
//
// Replaces the reference's OpenCV dependency (reference:
// deploy/cpp/main.cpp cv::imread/cv::imwrite) with libpng + the PFM
// reader already in native/src/preprocess.cpp.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace openstereo {

// 8-bit RGB image, row-major HWC.
struct ImageU8 {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// Reads an 8-bit PNG (gray/RGB/RGBA → RGB). Throws on failure.
ImageU8 read_png_rgb(const std::string& path);

// Writes an 8-bit RGB PNG.
void write_png_rgb(const std::string& path, const uint8_t* rgb, int h, int w);

// Writes a 16-bit grayscale PNG (KITTI disparity submission format:
// uint16 = disparity * 256, reference tools/test_kitti.py:118-122).
void write_png_u16(const std::string& path, const uint16_t* gray, int h,
                   int w);

// KITTI devkit disparity colormap (7-bin histogram), matching
// openstereo_tpu/utils/visualization.py::disp_to_color.
void disp_to_color(const float* disp, int h, int w, float max_disp,
                   uint8_t* rgb_out);

}  // namespace openstereo
