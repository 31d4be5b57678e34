// Native stereo inference CLI — TPU counterpart of the reference's
// TensorRT deployment app (reference: deploy/cpp/main.cpp — engine load,
// config-driven transform pipeline :101-111, warm-up loop, timed
// inference, colormapped PNG output).
//
// Usage:
//   stereo_infer --bundle deploy/exported/lightstereo_544x960_bundle \
//       --left left.png --right right.png --out disp.png \
//       [--plugin /opt/axon/libaxon_pjrt.so] [--warmup 3] [--reps 10] \
//       [--save_u16 disp16.png] [--raw_out disp.f32]
//
// The transform pipeline comes from the bundle's meta.json (the EVALUATING
// section of the training YAML, same vocabulary as the reference C++
// Transform dispatcher: RightTopPad / DivisiblePad / RightBottomCrop /
// CropOrPad / NormalizeImage). Pad+normalize runs through the fused
// multi-threaded kernel in native/src/preprocess.cpp (the reference fuses
// the same stage in CUDA, transforms_kernel.cu:73-122). Images are NHWC
// float32 — no TransposeImage on TPU.
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <stdexcept>
#include <thread>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "image_io.h"
#include "mini_json.h"
#include "pjrt_engine.h"

extern "C" {
// native/src/preprocess.cpp
void fused_pad_normalize(const uint8_t* img, int h, int w, int th, int tw,
                         const float* mean, const float* std, float* out,
                         int num_threads);
}

namespace {

using openstereo::ClientOption;
using openstereo::ImageU8;
using openstereo::JsonParser;
using openstereo::JsonValue;

std::string read_text(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// Resolved preprocessing geometry: optional crop (anchored bottom-right or
// center pad/crop), then pad to (th, tw), then normalize.
struct Pipeline {
  int th = 0, tw = 0;          // final padded dims
  int crop_h = 0, crop_w = 0;  // 0 → no crop
  bool crop_bottom_right = false;
  float mean[3] = {0.f, 0.f, 0.f};
  float stddev[3] = {1.f, 1.f, 1.f};
  int pad_top = 0, pad_right = 0;  // recorded for unpadding (DivisiblePad)
};

Pipeline resolve_pipeline(const JsonValue& meta, int img_h, int img_w) {
  Pipeline p;
  p.th = img_h;
  p.tw = img_w;
  int cur_h = img_h, cur_w = img_w;
  for (const auto& t : meta.at("transforms").arr) {
    const std::string name = t.at("NAME").str;
    if (name == "RightTopPad" || name == "CropOrPad") {
      const auto& size = t.at("SIZE").arr;
      p.th = size[0].as_int();
      p.tw = size[1].as_int();
      if (name == "CropOrPad" && (p.th < cur_h || p.tw < cur_w)) {
        p.crop_h = std::min(cur_h, p.th);
        p.crop_w = std::min(cur_w, p.tw);
        p.crop_bottom_right = true;
      }
      cur_h = p.th;
      cur_w = p.tw;
    } else if (name == "DivisiblePad") {
      // Only the default top/right mode is implemented here; the Python
      // transform also supports MODE: round (centered padding), which this
      // preprocessing path would silently mis-align with.
      if (t.has("MODE") && t.at("MODE").str != "tr")
        throw std::runtime_error("unsupported DivisiblePad MODE: " +
                                 t.at("MODE").str);
      const int by = t.at("BY").as_int();
      p.th = (cur_h + by - 1) / by * by;
      p.tw = (cur_w + by - 1) / by * by;
      p.pad_top = p.th - cur_h;
      p.pad_right = p.tw - cur_w;
      cur_h = p.th;
      cur_w = p.tw;
    } else if (name == "RightBottomCrop") {
      const auto& size = t.at("SIZE").arr;
      p.crop_h = std::min(cur_h, size[0].as_int());
      p.crop_w = std::min(cur_w, size[1].as_int());
      p.crop_bottom_right = true;
      p.th = cur_h = p.crop_h;
      p.tw = cur_w = p.crop_w;
    } else if (name == "NormalizeImage") {
      const auto& mean = t.at("MEAN").arr;
      const auto& stddev = t.at("STD").arr;
      for (int c = 0; c < 3; ++c) {
        p.mean[c] = static_cast<float>(mean[c].num);
        p.stddev[c] = static_cast<float>(stddev[c].num);
      }
    } else {
      throw std::runtime_error("unsupported eval transform: " + name);
    }
  }
  return p;
}

// Crop (if requested) then fused pad+normalize into out[th*tw*3].
void preprocess(const ImageU8& img, const Pipeline& p, float* out) {
  const uint8_t* src = img.rgb.data();
  std::vector<uint8_t> cropped;
  int h = img.h, w = img.w;
  if (p.crop_h > 0) {
    const int y0 = p.crop_bottom_right ? img.h - p.crop_h : 0;
    const int x0 = p.crop_bottom_right ? img.w - p.crop_w : 0;
    cropped.resize(static_cast<size_t>(p.crop_h) * p.crop_w * 3);
    for (int y = 0; y < p.crop_h; ++y)
      std::memcpy(cropped.data() + static_cast<size_t>(y) * p.crop_w * 3,
                  img.rgb.data() +
                      (static_cast<size_t>(y0 + y) * img.w + x0) * 3,
                  static_cast<size_t>(p.crop_w) * 3);
    src = cropped.data();
    h = p.crop_h;
    w = p.crop_w;
  }
  fused_pad_normalize(src, h, w, p.th, p.tw, p.mean, p.stddev, out,
                      static_cast<int>(std::thread::hardware_concurrency()));
}

std::vector<ClientOption> client_options(const std::string& plugin) {
  std::vector<ClientOption> opts;
  if (plugin.find("axon") == std::string::npos) return opts;  // stock libtpu
  // Emulated-TPU provider: same create options axon/register/pjrt.py
  // sends for pool mode with remote compile.
  auto add_int = [&](const char* k, int64_t v) {
    ClientOption o;
    o.name = k;
    o.is_string = false;
    o.int_value = v;
    opts.push_back(o);
  };
  auto add_str = [&](const char* k, std::string v) {
    ClientOption o;
    o.name = k;
    o.str_value = std::move(v);
    opts.push_back(o);
  };
  const char* topo = std::getenv("AXON_TOPOLOGY");
  const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
  add_int("remote_compile", 1);
  add_int("local_only", 0);
  add_int("priority", 0);
  add_str("topology",
          topo ? topo : (std::string(gen ? gen : "v5e") + ":1x1x1"));
  add_int("n_slices", 1);
  add_str("session_id",
          "stereo-infer-" + std::to_string(::getpid()) + "-" +
              std::to_string(std::chrono::steady_clock::now()
                                 .time_since_epoch()
                                 .count()));
  add_int("rank", 0xFFFFFFFFll);
  return opts;
}

}  // namespace

int main(int argc, char** argv) {
  std::string bundle, left_path, right_path, out_path, save_u16, raw_out;
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  int warmup = 3, reps = 10;
  float max_disp = 0.f;  // 0 → min-max normalize like the reference app
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (++i >= argc) { std::fprintf(stderr, "missing value for %s\n", a.c_str()); std::exit(1); }
      return argv[i];
    };
    if (a == "--bundle") bundle = next();
    else if (a == "--left") left_path = next();
    else if (a == "--right") right_path = next();
    else if (a == "--out") out_path = next();
    else if (a == "--save_u16") save_u16 = next();
    else if (a == "--raw_out") raw_out = next();
    else if (a == "--plugin") plugin = next();
    else if (a == "--warmup") warmup = std::stoi(next());
    else if (a == "--reps") reps = std::stoi(next());
    else if (a == "--max_disp") max_disp = std::stof(next());
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 1; }
  }
  if (bundle.empty() || left_path.empty() || right_path.empty()) {
    std::fprintf(stderr,
                 "usage: stereo_infer --bundle DIR --left PNG --right PNG "
                 "[--out PNG] [--save_u16 PNG] [--raw_out F32] [--plugin SO] "
                 "[--warmup N] [--reps N] [--max_disp D]\n");
    return 1;
  }

  try {
    JsonValue meta = JsonParser(read_text(bundle + "/meta.json")).parse();
    const int bh = meta.at("input_h").as_int();
    const int bw = meta.at("input_w").as_int();
    std::printf("model %s, input %dx%d\n", meta.at("model").str.c_str(), bh, bw);

    ImageU8 left = openstereo::read_png_rgb(left_path);
    ImageU8 right = openstereo::read_png_rgb(right_path);
    if (left.h != right.h || left.w != right.w)
      throw std::runtime_error("left/right size mismatch");

    Pipeline pipe = resolve_pipeline(meta, left.h, left.w);
    if (pipe.th != bh || pipe.tw != bw)
      throw std::runtime_error(
          "transform output " + std::to_string(pipe.th) + "x" +
          std::to_string(pipe.tw) + " != bundle input " + std::to_string(bh) +
          "x" + std::to_string(bw) + " — re-export with matching --shape");

    std::vector<float> left_f(static_cast<size_t>(bh) * bw * 3);
    std::vector<float> right_f(left_f.size());
    auto t0 = std::chrono::steady_clock::now();
    preprocess(left, pipe, left_f.data());
    preprocess(right, pipe, right_f.data());
    auto t1 = std::chrono::steady_clock::now();
    std::printf("preprocess: %.2f ms\n",
                std::chrono::duration<double, std::milli>(t1 - t0).count());

    openstereo::InferenceEngine engine(plugin, bundle, client_options(plugin));
    engine.set_shapes(1, bh, bw);
    std::printf("engine ready (compiled)\n");

    std::vector<float> disp(static_cast<size_t>(bh) * bw);
    for (int i = 0; i < warmup; ++i)
      engine.run(left_f.data(), right_f.data(), disp.data());
    auto tr0 = std::chrono::steady_clock::now();
    for (int i = 0; i < reps; ++i)
      engine.run(left_f.data(), right_f.data(), disp.data());
    auto tr1 = std::chrono::steady_clock::now();
    // Whole-frame wall time (h2d + execute + d2h): execute dispatch is
    // async on some backends, so only the synced frame time is meaningful.
    std::printf("inference: %.2f ms/frame over %d reps "
                "(last frame: h2d %.2f ms, dispatch %.2f ms, sync+d2h %.2f ms)\n",
                std::chrono::duration<double, std::milli>(tr1 - tr0).count() / reps,
                reps, engine.last_h2d_ms(), engine.last_infer_ms(),
                engine.last_d2h_ms());

    // Unpad to the original image extent. RightTopPad puts the source at
    // the bottom-left (reference test_kitti.py:114-115 unpads the same way);
    // DivisiblePad records (pad_top, pad_right).
    const int oh = pipe.crop_h > 0 ? pipe.crop_h : left.h;
    const int ow = pipe.crop_w > 0 ? pipe.crop_w : left.w;
    const int pad_top = pipe.th - oh;
    std::vector<float> disp_out(static_cast<size_t>(oh) * ow);
    for (int y = 0; y < oh; ++y)
      std::memcpy(disp_out.data() + static_cast<size_t>(y) * ow,
                  disp.data() + static_cast<size_t>(y + pad_top) * bw,
                  static_cast<size_t>(ow) * sizeof(float));

    if (!raw_out.empty()) {
      std::ofstream f(raw_out, std::ios::binary);
      f.write(reinterpret_cast<const char*>(disp_out.data()),
              disp_out.size() * sizeof(float));
      std::printf("raw f32 [%d,%d] → %s\n", oh, ow, raw_out.c_str());
    }
    if (!save_u16.empty()) {
      std::vector<uint16_t> u16(disp_out.size());
      for (size_t i = 0; i < disp_out.size(); ++i) {
        float v = disp_out[i] * 256.f;
        u16[i] = static_cast<uint16_t>(v < 0.f ? 0.f : (v > 65535.f ? 65535.f : v));
      }
      openstereo::write_png_u16(save_u16, u16.data(), oh, ow);
      std::printf("uint16 disparity → %s\n", save_u16.c_str());
    }
    if (!out_path.empty()) {
      float md = max_disp;
      if (md <= 0.f) {
        for (float v : disp_out) md = std::max(md, v);
        md = std::max(md, 1e-6f);
      }
      std::vector<uint8_t> rgb(disp_out.size() * 3);
      openstereo::disp_to_color(disp_out.data(), oh, ow, md, rgb.data());
      openstereo::write_png_rgb(out_path, rgb.data(), oh, ow);
      std::printf("colormap → %s\n", out_path.c_str());
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "FATAL: %s\n", e.what());
    return 1;
  }
  return 0;
}
