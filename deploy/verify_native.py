"""End-to-end verification of the native C++ PJRT runtime against the
Python inference path (the TPU analogue of checking the TensorRT engine
against the torch model, reference deploy/export.py:357-363).

Steps: export a bundle → cmake-build stereo_infer → run it on a synthetic
stereo pair → compare its raw f32 disparity to the jitted Python forward.
Requires an attached TPU (both paths compile for the same device, so the
comparison is apples-to-apples and should be bit-exact).

Usage: python deploy/verify_native.py [--cfg cfgs/lightstereo/lightstereo_s_sceneflow.yaml]
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLUGIN = os.environ.get("PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfgs/lightstereo/lightstereo_s_sceneflow.yaml")
    p.add_argument("--tol", type=float, default=1e-3)
    args = p.parse_args()

    import numpy as np

    work = tempfile.mkdtemp(prefix="verify_native_")

    # 1. export bundle
    subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/export.py"),
         "--cfg_file", args.cfg, "--format", "bundle", "--out_dir", work],
        check=True, cwd=REPO)
    bundle = next(os.path.join(work, d) for d in os.listdir(work)
                  if d.endswith("_bundle"))

    # 2. build the runtime if needed
    binary = os.path.join(REPO, "deploy/cpp/build/stereo_infer")
    if not os.path.exists(binary):
        subprocess.run(["cmake", "-S", os.path.join(REPO, "deploy/cpp"),
                        "-B", os.path.join(REPO, "deploy/cpp/build"),
                        "-G", "Ninja"], check=True)
        subprocess.run(["cmake", "--build",
                        os.path.join(REPO, "deploy/cpp/build")], check=True)

    # 3. synthetic pair (odd size exercises the pad/unpad path)
    from PIL import Image

    rng = np.random.RandomState(42)
    h, w = 540, 956
    left = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    right = np.roll(left, -7, axis=1)
    lp, rp = os.path.join(work, "l.png"), os.path.join(work, "r.png")
    Image.fromarray(left).save(lp)
    Image.fromarray(right).save(rp)

    # 4. run the native app
    raw = os.path.join(work, "disp.f32")
    env = dict(os.environ,
               AXON_COMPAT_VERSION=os.environ.get("AXON_COMPAT_VERSION", "49"),
               AXON_POOL_SVC_OVERRIDE=os.environ.get(
                   "AXON_POOL_SVC_OVERRIDE", "127.0.0.1"),
               TPU_WORKER_HOSTNAMES=os.environ.get(
                   "TPU_WORKER_HOSTNAMES", "localhost"))
    subprocess.run([binary, "--bundle", bundle, "--left", lp, "--right", rp,
                    "--raw_out", raw, "--plugin", PLUGIN,
                    "--warmup", "1", "--reps", "3"], check=True, env=env)
    cpp = np.fromfile(raw, np.float32).reshape(h, w)

    # 5. python reference
    import jax
    import jax.numpy as jnp

    from openstereo_tpu.config import load_config
    from openstereo_tpu.data.transforms import build_transforms
    from openstereo_tpu.models import build_model

    cfg = load_config(os.path.join(REPO, args.cfg))
    model = build_model(cfg.MODEL, dtype=jnp.bfloat16)
    sample = {"left": left.astype(np.float32), "right": right.astype(np.float32)}
    sample = build_transforms(cfg.DATA_CONFIG.DATA_TRANSFORM["EVALUATING"])(sample)
    data = {"left": jnp.asarray(sample["left"][None]),
            "right": jnp.asarray(sample["right"][None])}
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=False))(data)
    out = np.asarray(jax.jit(
        lambda b: model.apply(variables, b, train=False)["disp_pred"])(data))[0]
    py = out[out.shape[0] - h:, :w]

    diff = np.abs(py - cpp)
    print(f"max |py - cpp| = {diff.max():.2e}, mean = {diff.mean():.2e}")
    assert diff.max() <= args.tol, f"native/python mismatch: {diff.max()}"
    print("NATIVE RUNTIME PARITY OK")


if __name__ == "__main__":
    main()
