// Native TPU inference engine over the PJRT C API.
//
// C++ counterpart of the reference's TensorRT runtime
// (reference: deploy/cpp/include/inference.h + src/inference.cpp —
// engine deserialize, buffer allocation, enqueueV3, D2H postprocess).
// On TPU the "engine" is a StableHLO bundle produced by
// `deploy/export.py --format bundle`; this class dlopens a PJRT plugin
// (.so exporting GetPjrtApi — e.g. libtpu or an emulated-TPU provider),
// creates a client, compiles the module once, and then serves
// upload → execute → download with reusable host staging.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

// Forward decls from the PJRT C API (defined in xla/pjrt/c/pjrt_c_api.h).
typedef struct PJRT_Api PJRT_Api;
typedef struct PJRT_Client PJRT_Client;
typedef struct PJRT_Device PJRT_Device;
typedef struct PJRT_LoadedExecutable PJRT_LoadedExecutable;

namespace openstereo {

// One client-create option (subset of PJRT_NamedValue the runtime needs).
struct ClientOption {
  std::string name;
  bool is_string = true;
  std::string str_value;
  int64_t int_value = 0;
};

class InferenceEngine {
 public:
  // plugin_so: path to a PJRT plugin; bundle_dir: output of
  // `export.py --format bundle` (module.mlir.bc + compile_options.pb).
  InferenceEngine(const std::string& plugin_so, const std::string& bundle_dir,
                  const std::vector<ClientOption>& options);
  ~InferenceEngine();

  InferenceEngine(const InferenceEngine&) = delete;
  InferenceEngine& operator=(const InferenceEngine&) = delete;

  // Synchronous inference: two NHWC float32 inputs [batch,h,w,3] →
  // disparity [batch,h,w]. Shapes are fixed at export time.
  void run(const float* left, const float* right, float* disp_out);

  // Input/output geometry (parsed by the caller from meta.json and
  // passed in via set_shapes before the first run()).
  void set_shapes(int batch, int h, int w);

  double last_h2d_ms() const { return h2d_ms_; }
  double last_infer_ms() const { return infer_ms_; }
  double last_d2h_ms() const { return d2h_ms_; }

 private:
  struct Impl;
  Impl* impl_;
  double h2d_ms_ = 0.0, infer_ms_ = 0.0, d2h_ms_ = 0.0;
};

}  // namespace openstereo
