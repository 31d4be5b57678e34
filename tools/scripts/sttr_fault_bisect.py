"""Bisect the STTR fused-attention TPU-worker fault at wide crops.

Round-4 finding (docs/BENCHMARKS.md): the Pallas rel-attention kernel is
stable under eval at W'>=240 but faults the TPU worker when invoked
inside a training step. This script isolates the faulting layer:

  1. fused fwd, need_raw=False          (the eval configuration)
  2. fused fwd, need_raw=True           (raw-attention HBM output on)
  3. grad through rel_attention_trainable (custom_vjp fwd + jnp bwd)
  4. grad + adamw update (optimizer in the graph)

Run stages individually so a fault identifies its stage:
  python tools/scripts/sttr_fault_bisect.py --stage 1 --w 240
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, required=True)
    ap.add_argument("--w", type=int, default=240)
    ap.add_argument("--b", type=int, default=182, help="epipolar lines (H')")
    ap.add_argument("--e", type=int, default=128)
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from openstereo_tpu.ops.pallas.rel_attention import (
        rel_attention, rel_attention_trainable)

    rng = np.random.RandomState(0)
    b, w, e = args.b, args.w, args.e
    q = jnp.asarray(rng.randn(b, w, e), jnp.bfloat16) * 0.1
    k = jnp.asarray(rng.randn(b, w, e), jnp.bfloat16) * 0.1
    v = jnp.asarray(rng.randn(b, w, e), jnp.bfloat16) * 0.1
    ke = jnp.asarray(rng.randn(2 * w - 1, e), jnp.bfloat16) * 0.1
    qe = jnp.asarray(rng.randn(2 * w - 1, e), jnp.bfloat16) * 0.1

    if args.stage == 1:
        f = jax.jit(lambda *a: rel_attention(*a, nheads=args.heads,
                                             need_raw=False)[0])
        out = f(q, k, v, ke, qe)
    elif args.stage == 2:
        f = jax.jit(lambda *a: rel_attention(*a, nheads=args.heads,
                                             need_raw=True)[1])
        out = f(q, k, v, ke, qe)
    elif args.stage == 3:
        def loss(q, k, v, ke, qe):
            o, _ = rel_attention_trainable(q, k, v, ke, qe, args.heads)
            return jnp.sum(o.astype(jnp.float32))
        f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        out = f(q, k, v, ke, qe)[0]
    elif args.stage == 4:
        import optax
        tx = optax.adamw(1e-4)
        params = {"q": q, "k": k, "v": v, "ke": ke, "qe": qe}
        state = tx.init(params)

        def loss(p):
            o, _ = rel_attention_trainable(p["q"], p["k"], p["v"],
                                           p["ke"], p["qe"], args.heads)
            return jnp.sum(o.astype(jnp.float32))

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        params, state = step(params, state)
        out = params["q"]
    else:
        raise SystemExit("stage 1-4")

    print(f"stage {args.stage} W={w}: OK, out checksum "
          f"{float(jnp.sum(jnp.abs(out.astype(jnp.float32)))):.4f}")


if __name__ == "__main__":
    main()
