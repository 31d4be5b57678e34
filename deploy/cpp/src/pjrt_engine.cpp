// PJRT C API inference engine implementation. See pjrt_engine.h.
//
// Call sequence mirrors the reference TensorRT runtime
// (reference: deploy/cpp/src/inference.cpp:49-51 buffer binding,
// :139-166 H2D preprocess copies, :201 enqueueV3):
//   GetPjrtApi → Plugin_Initialize → Client_Create → Client_Compile
//   then per frame: BufferFromHostBuffer ×2 → Execute → ToHostBuffer.
#include "pjrt_engine.h"

#include <dlfcn.h>

#include <chrono>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace openstereo {
namespace {

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

double now_ms() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

struct InferenceEngine::Impl {
  void* dl = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  int batch = 1, h = 0, w = 0;

  void check(PJRT_Error* err, const char* what) {
    if (!err) return;
    PJRT_Error_Message_Args m;
    std::memset(&m, 0, sizeof(m));
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = err;
    api->PJRT_Error_Message(&m);
    std::string msg(m.message, m.message_size);
    PJRT_Error_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    api->PJRT_Error_Destroy(&d);
    throw std::runtime_error(std::string(what) + ": " + msg);
  }

  void await(PJRT_Event* ev, const char* what) {
    PJRT_Event_Await_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    a.event = ev;
    check(api->PJRT_Event_Await(&a), what);
    PJRT_Event_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = ev;
    api->PJRT_Event_Destroy(&d);
  }

  PJRT_Buffer* upload(const float* data, const int64_t* dims, size_t ndims) {
    PJRT_Client_BufferFromHostBuffer_Args b;
    std::memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = client;
    b.data = data;
    b.type = PJRT_Buffer_Type_F32;
    b.dims = dims;
    b.num_dims = ndims;
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = device;
    check(api->PJRT_Client_BufferFromHostBuffer(&b), "BufferFromHostBuffer");
    await(b.done_with_host_buffer, "h2d");
    return b.buffer;
  }

  void destroy_buffer(PJRT_Buffer* buf) {
    PJRT_Buffer_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = buf;
    api->PJRT_Buffer_Destroy(&d);
  }
};

InferenceEngine::InferenceEngine(const std::string& plugin_so,
                                 const std::string& bundle_dir,
                                 const std::vector<ClientOption>& options)
    : impl_(new Impl) {
  impl_->dl = dlopen(plugin_so.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!impl_->dl)
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(impl_->dl, "GetPjrtApi"));
  if (!get_api)
    throw std::runtime_error(plugin_so + " does not export GetPjrtApi");
  impl_->api = get_api();

  PJRT_Plugin_Initialize_Args pi;
  std::memset(&pi, 0, sizeof(pi));
  pi.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  impl_->check(impl_->api->PJRT_Plugin_Initialize(&pi), "Plugin_Initialize");

  std::vector<PJRT_NamedValue> nvs;
  nvs.reserve(options.size());
  for (const auto& o : options) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = o.name.c_str();
    nv.name_size = o.name.size();
    if (o.is_string) {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = o.str_value.c_str();
      nv.value_size = o.str_value.size();
    } else {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = o.int_value;
      nv.value_size = 1;
    }
    nvs.push_back(nv);
  }

  PJRT_Client_Create_Args cc;
  std::memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = nvs.data();
  cc.num_options = nvs.size();
  impl_->check(impl_->api->PJRT_Client_Create(&cc), "Client_Create");
  impl_->client = cc.client;

  PJRT_Client_AddressableDevices_Args ad;
  std::memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = impl_->client;
  impl_->check(impl_->api->PJRT_Client_AddressableDevices(&ad),
               "AddressableDevices");
  if (ad.num_addressable_devices == 0)
    throw std::runtime_error("no addressable devices");
  impl_->device = ad.addressable_devices[0];

  std::string code = read_file(bundle_dir + "/module.mlir.bc");
  std::string copts = read_file(bundle_dir + "/compile_options.pb");
  PJRT_Program prog;
  std::memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = code.data();
  prog.code_size = code.size();
  prog.format = "mlir";
  prog.format_size = 4;

  PJRT_Client_Compile_Args ca;
  std::memset(&ca, 0, sizeof(ca));
  ca.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  ca.client = impl_->client;
  ca.program = &prog;
  ca.compile_options = copts.data();
  ca.compile_options_size = copts.size();
  impl_->check(impl_->api->PJRT_Client_Compile(&ca), "Client_Compile");
  impl_->exec = ca.executable;
}

InferenceEngine::~InferenceEngine() {
  if (!impl_) return;
  if (impl_->api) {
    if (impl_->exec) {
      PJRT_LoadedExecutable_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      d.executable = impl_->exec;
      impl_->api->PJRT_LoadedExecutable_Destroy(&d);
    }
    if (impl_->client) {
      PJRT_Client_Destroy_Args d;
      std::memset(&d, 0, sizeof(d));
      d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
      d.client = impl_->client;
      impl_->api->PJRT_Client_Destroy(&d);
    }
  }
  if (impl_->dl) dlclose(impl_->dl);
  delete impl_;
}

void InferenceEngine::set_shapes(int batch, int h, int w) {
  impl_->batch = batch;
  impl_->h = h;
  impl_->w = w;
}

void InferenceEngine::run(const float* left, const float* right,
                          float* disp_out) {
  auto* im = impl_;
  const int64_t in_dims[4] = {im->batch, im->h, im->w, 3};

  double t0 = now_ms();
  PJRT_Buffer* bl = im->upload(left, in_dims, 4);
  PJRT_Buffer* br = im->upload(right, in_dims, 4);
  double t1 = now_ms();

  PJRT_ExecuteOptions eo;
  std::memset(&eo, 0, sizeof(eo));
  eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* arg_list[2] = {bl, br};
  PJRT_Buffer* const* arg_lists[1] = {arg_list};
  PJRT_Buffer* out_list[1] = {nullptr};
  PJRT_Buffer** out_lists[1] = {out_list};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args ea;
  std::memset(&ea, 0, sizeof(ea));
  ea.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ea.executable = im->exec;
  ea.options = &eo;
  ea.argument_lists = arg_lists;
  ea.num_devices = 1;
  ea.num_args = 2;
  ea.output_lists = out_lists;
  ea.device_complete_events = done;
  im->check(im->api->PJRT_LoadedExecutable_Execute(&ea), "Execute");
  im->await(done[0], "execute");
  double t2 = now_ms();

  const size_t out_bytes =
      static_cast<size_t>(im->batch) * im->h * im->w * sizeof(float);
  PJRT_Buffer_ToHostBuffer_Args th;
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = out_list[0];
  th.dst = disp_out;
  th.dst_size = out_bytes;
  im->check(im->api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
  im->await(th.event, "d2h");
  double t3 = now_ms();

  im->destroy_buffer(bl);
  im->destroy_buffer(br);
  im->destroy_buffer(out_list[0]);

  h2d_ms_ = t1 - t0;
  infer_ms_ = t2 - t1;
  d2h_ms_ = t3 - t2;
}

}  // namespace openstereo
