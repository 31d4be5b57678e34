"""Scaling-efficiency benchmark: training throughput vs device count.

The north star (BASELINE.json) asks for frames/s scaling efficiency measured
at 1 chip → 1 host → N hosts. The reference has no such harness (its
multi-node story is "launch torchrun and watch the logs",
reference: tools/scripts/train_multinodes.sh); this tool measures it
directly: for each device count n it builds a ('data','model') mesh over the
first n devices, jits the full training step (forward + backward + optimizer
+ BN stats — gradient all-reduce compiled in by XLA), and times steady-state
steps with the per-device batch held constant (weak scaling, DDP-style).

Efficiency(n) = throughput(n) / (n × throughput(1)).

On a multi-host pod slice, run with --dist on every host; device counts then
cover full hosts (jit executes on all processes' devices collectively).
For harness validation without hardware:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py --cfg_file cfgs/lightstereo/... --tiny

Output: one JSON document with per-n throughput (samples/s) and efficiency.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--shape", type=int, nargs=2, default=[320, 736],
                   help="training crop HxW")
    p.add_argument("--batch_per_device", type=int, default=None,
                   help="default: OPTIMIZATION.BATCH_SIZE_PER_GPU")
    p.add_argument("--steps", type=int, default=20, help="timed steps")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--model_par", type=int, default=1)
    p.add_argument("--device_counts", type=int, nargs="*", default=None,
                   help="default: powers of two up to all devices")
    p.add_argument("--tiny", action="store_true",
                   help="tiny shapes/batch for CPU harness validation")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (pair with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    p.add_argument("--dist", action="store_true",
                   help="multi-host: jax.distributed.initialize()")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.dist:
        import jax

        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from openstereo_tpu.config import load_config
    from openstereo_tpu.models import build_model
    from openstereo_tpu.parallel import make_mesh, shard_batch, replicate
    from openstereo_tpu.runtime.train_state import TrainState

    cfg = load_config(args.cfg_file)
    if args.tiny:
        h, w, bpd = 64, 128, 1
        cfg.MODEL["MAX_DISP"] = min(int(cfg.MODEL.get("MAX_DISP", 192)), 32)
    else:
        h, w = args.shape
        bpd = args.batch_per_device or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)

    dtype = jnp.bfloat16 if cfg.OPTIMIZATION.get("AMP", False) else jnp.float32
    model = build_model(cfg.MODEL, dtype=dtype)

    n_dev = len(jax.devices())
    counts = args.device_counts
    if not counts:
        counts, c = [], 1
        while c <= n_dev:
            counts.append(c)
            c *= 2
        if counts[-1] != n_dev:
            counts.append(n_dev)
    counts = [c for c in counts if c % args.model_par == 0 and c <= n_dev]

    rng = np.random.RandomState(0)
    results = []
    for n in counts:
        mesh = make_mesh(data=n // args.model_par, model=args.model_par,
                         devices=jax.devices()[:n])
        data_par = mesh.shape["data"]
        gb = bpd * data_par
        batch_np = {
            "left": rng.rand(gb, h, w, 3).astype(np.float32),
            "right": rng.rand(gb, h, w, 3).astype(np.float32),
            "disp": (rng.rand(gb, h, w) * 60 + 1).astype(np.float32),
        }
        if cfg.MODEL.NAME == "STTR":
            # STTR's loss needs occlusion GT: exact left-border occlusion
            # from the synthetic disparities (see tools/overfit_check.py)
            xs = np.arange(w, dtype=np.float32)[None, None, :]
            batch_np["occ_mask"] = (xs - batch_np["disp"] < 0).astype(np.float32)
            batch_np["occ_mask_right"] = (xs + batch_np["disp"] >= w).astype(np.float32)
        with jax.set_mesh(mesh):
            batch = shard_batch(batch_np, mesh)
            variables = jax.jit(
                lambda b: model.init(jax.random.key(0), b, train=True))(batch)
            tx = optax.chain(optax.clip(0.1), optax.adamw(1e-4))
            state = TrainState.create(
                apply_fn=model.apply, params=variables["params"],
                batch_stats=variables.get("batch_stats", {}), tx=tx)
            state = replicate(state, mesh)

            def train_step(state, batch):
                def loss_fn(params):
                    out, mutated = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch, train=True, mutable=["batch_stats"])
                    loss, _ = model.get_loss(out, batch)
                    return loss, mutated["batch_stats"]

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return state.apply_gradients(grads, new_bs), loss

            step = jax.jit(train_step, donate_argnums=(0,))
            for _ in range(args.warmup):
                state, loss = step(state, batch)
            np.asarray(loss)

            # Differential timing: successive steps are chained through the
            # donated state, so a group of n steps costs n·step + one
            # host-drain round-trip (np.asarray — NEVER block_until_ready,
            # which returns before execution completes on remote-attached
            # chips). Timing n and 3n steps and differencing cancels the
            # round-trip, which through a tunnel can be ~100 ms.
            def timed(k):
                nonlocal state, loss
                t0 = time.perf_counter()
                for _ in range(k):
                    state, loss = step(state, batch)
                np.asarray(loss)
                return time.perf_counter() - t0

            g = max(1, args.steps // 3)
            dt = min((timed(3 * g) - timed(g)) / (2 * g) for _ in range(2))
        results.append({"devices": n, "global_batch": gb,
                        "step_ms": round(1e3 * dt, 2),
                        "samples_per_s": round(gb / dt, 1)})
        del state, batch

    base = results[0]["samples_per_s"] / results[0]["devices"]
    for r in results:
        r["efficiency"] = round(r["samples_per_s"] / (r["devices"] * base), 3)
    out = {"model": cfg.MODEL.NAME, "shape": [h, w], "batch_per_device": bpd,
           "model_par": args.model_par, "weak_scaling": results}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
