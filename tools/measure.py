"""Latency/FLOPs measurement CLI (reference: tools/measure.py:32-89).

Protocol parity: input [1, 544, 960, 3], 10 warm-up, 100 timed reps under
block_until_ready discipline; FLOPs from XLA's compiled cost analysis
(replacing thop.profile).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--shape", type=int, nargs=2, default=[544, 960])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
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
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))

    fwd = jax.jit(lambda b: model.apply(variables, b, train=False)["disp_pred"])
    lowered = fwd.lower(data)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = float("nan")

    for _ in range(10):
        out = fwd(data)
    # full device round-trip: on remote-attached TPUs block_until_ready can
    # return before the first execution actually finished
    np.asarray(out)
    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(5):
                out = fwd(data)
            jax.block_until_ready(out)
        print(f"profiler trace written to {args.profile}")
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fwd(data)
    # host round-trip as the barrier: block_until_ready returns early
    # through the remote-attached chip (see docs/BENCHMARKS.md)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / args.reps * 1e3

    print(f"model: {cfg.MODEL.NAME}  params: {n_params/1e6:.2f}M  "
          f"flops: {flops/1e9:.1f}G  input: {args.batch}x{h}x{w}x3 {dtype.__name__}")
    print(f"latency: {ms:.2f} ms  ({args.batch/ms*1e3:.1f} frames/s)")


if __name__ == "__main__":
    main()
