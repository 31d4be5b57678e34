"""Model export for serving (reference: deploy/export.py).

The reference exports TorchScript/ONNX/TensorRT/OpenVINO/CoreML/Paddle
(export.py:81-92); the TPU-native serving path is XLA ahead-of-time:

- **stablehlo**: `jax.export` serializes the jitted forward to portable
  StableHLO bytes (loadable from C++ via PJRT or re-imported in JAX with
  `jax.export.deserialize`) — the ONNX-equivalent interchange artifact;
- **aot**: lowers AND compiles for the attached TPU, reporting FLOPs and
  memory from XLA's cost analysis (the dry-run + checker step,
  reference export.py:159-161,357-363);
- **bundle**: a self-contained serving artifact for the native C++ PJRT
  runtime (`deploy/cpp/`) — the TPU analogue of the reference's TensorRT
  engine build (reference export.py:198-247 feeding deploy/cpp/main.cpp):
  raw StableHLO module bytecode (weights embedded as constants), serialized
  XLA CompileOptionsProto, and a meta.json carrying input shapes and the
  EVALUATING transform pipeline for the C++ preprocessor.

Usage:
    python deploy/export.py --cfg_file cfgs/lightstereo/lightstereo_s_sceneflow.yaml \
        --shape 544 960 [--ckpt_dir output/...] [--format stablehlo aot] [--f32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--shape", type=int, nargs=2, default=[544, 960])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt", type=int, default=None)
    p.add_argument("--format", nargs="+", default=["stablehlo", "aot"],
                   choices=["stablehlo", "aot", "bundle"])
    p.add_argument("--out_dir", default="deploy/exported")
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from openstereo_tpu.config import load_config
    from openstereo_tpu.models import build_model

    cfg = load_config(args.cfg_file)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = build_model(cfg.MODEL, dtype=dtype)

    h, w = args.shape
    data = {
        "left": jnp.zeros((args.batch, h, w, 3), jnp.float32),
        "right": jnp.zeros((args.batch, h, w, 3), jnp.float32),
    }
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=False))(data)

    if args.ckpt_dir:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.join(os.path.abspath(args.ckpt_dir), "ckpt"))
        step = mgr.latest_step() if args.ckpt is None else args.ckpt
        restored = mgr.restore(step, args=ocp.args.StandardRestore(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))
        variables = restored
        print(f"restored checkpoint epoch {step}")

    fwd = jax.jit(lambda b: model.apply(variables, b, train=False)["disp_pred"])

    os.makedirs(args.out_dir, exist_ok=True)
    name = cfg.MODEL.NAME.lower()

    if "stablehlo" in args.format:
        from jax import export as jexport

        exported = jexport.export(fwd)(data)
        blob = exported.serialize()
        path = os.path.join(args.out_dir, f"{name}_{h}x{w}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"stablehlo: {path} ({len(blob)/1e6:.1f} MB)")
        # round-trip check
        back = jexport.deserialize(blob)
        out = back.call(data)
        assert out.shape == (args.batch, h, w), out.shape
        print("stablehlo round-trip OK")

    if "bundle" in args.format:
        import json

        from jax import export as jexport

        try:
            from jax.lib import xla_client as xc  # public alias
        except ImportError as e:  # pragma: no cover - depends on jax version
            raise SystemExit(
                "bundle export needs jax.lib.xla_client (for the "
                "CompileOptionsProto); this jax build does not expose it: "
                f"{e}") from e

        # Positional (left, right) signature pins the PJRT argument order;
        # weights are baked into the module as constants — the artifact is
        # self-contained like a TensorRT engine.
        fwd_pos = jax.jit(lambda left, right: model.apply(
            variables, {"left": left, "right": right}, train=False)["disp_pred"])
        exported = jexport.export(fwd_pos)(data["left"], data["right"])

        bundle_dir = os.path.join(args.out_dir, f"{name}_{h}x{w}_bundle")
        os.makedirs(bundle_dir, exist_ok=True)
        with open(os.path.join(bundle_dir, "module.mlir.bc"), "wb") as f:
            f.write(exported.mlir_module_serialized)
        with open(os.path.join(bundle_dir, "compile_options.pb"), "wb") as f:
            f.write(xc.CompileOptions().SerializeAsString())
        transforms = [dict(t) for t in
                      cfg.DATA_CONFIG.DATA_TRANSFORM.get("EVALUATING", [])]
        meta = {
            "model": cfg.MODEL.NAME,
            "batch": args.batch,
            "input_h": h,
            "input_w": w,
            "inputs": ["left", "right"],
            "input_dtype": "f32",
            "output": "disp_pred",
            "output_shape": [args.batch, h, w],
            "transforms": transforms,
        }
        with open(os.path.join(bundle_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        size = os.path.getsize(os.path.join(bundle_dir, "module.mlir.bc"))
        print(f"bundle: {bundle_dir} (module {size/1e6:.1f} MB)")

    if "aot" in args.format:
        compiled = fwd.lower(data).compile()
        cost = compiled.cost_analysis()
        mem = compiled.memory_analysis()
        out = compiled(data)
        jax.block_until_ready(out)
        assert np.isfinite(np.asarray(out)).all()
        flops = cost.get("flops", float("nan"))
        print(f"aot compile OK on {jax.devices()[0].platform}: "
              f"{flops/1e9:.1f} GFLOPs, "
              f"argument size {getattr(mem, 'argument_size_in_bytes', 0)/1e6:.1f} MB, "
              f"temp size {getattr(mem, 'temp_size_in_bytes', 0)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
