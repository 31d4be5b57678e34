"""Training-stack validation: overfit on random-dot stereograms.

Generates synthetic stereo pairs with exact ground-truth disparity (a random
texture warped by a smooth disparity field), trains a model for a few hundred
steps on one chip, and reports the EPE trajectory. Converging to low EPE
validates the full pipeline — volumes, aggregation, loss, optimizer, bf16 —
end to end with real stereo structure (no dataset needed).

    python tools/overfit_check.py [--model LightStereo] [--steps 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_stereogram(rng, h, w, max_disp):
    """Random texture + smooth disparity field → (left, right, disp)."""
    # smooth disparity in [4, max_disp*0.75]
    coarse = rng.rand(h // 32 + 2, w // 32 + 2).astype(np.float32)
    import cv2

    disp = cv2.resize(coarse, (w, h), interpolation=cv2.INTER_CUBIC)
    disp = 4.0 + (max_disp * 0.75 - 4.0) * (disp - disp.min()) / (np.ptp(disp) + 1e-6)

    texture = rng.rand(h, w + max_disp, 3).astype(np.float32)
    texture = cv2.GaussianBlur(texture, (5, 5), 1.5)
    left = texture[:, max_disp:]
    # right[y, x] = texture[y, x + max_disp - disp] (sample left view shifted)
    xs = np.arange(w, dtype=np.float32)[None, :] + max_disp - disp
    right = np.stack([
        np.stack([np.interp(xs[y], np.arange(w + max_disp), texture[y, :, c])
                  for c in range(3)], axis=-1)
        for y in range(h)])
    return left * 255, right.astype(np.float32) * 255, disp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="LightStereo")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, nargs=2, default=[192, 384])
    p.add_argument("--max_disp", type=int, default=64)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--cosine", action="store_true",
                   help="cosine-decay the lr to 0 over --steps (stabilises "
                        "the tail for models that oscillate at fixed lr, "
                        "e.g. MonSter's mix-phase heads)")
    p.add_argument("--kwargs", default="{}",
                   help='extra model kwargs as JSON, e.g. \'{"s_disp_range":16}\'')
    args = p.parse_args()
    import json as _json
    extra_kwargs = _json.loads(args.kwargs)

    import jax
    import jax.numpy as jnp
    import optax

    import openstereo_tpu.models  # noqa: F401
    from openstereo_tpu.registry import MODELS
    from openstereo_tpu.runtime.train_state import TrainState

    h, w = args.size
    rng = np.random.RandomState(0)
    samples = [make_stereogram(rng, h, w, args.max_disp) for _ in range(args.batch)]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    batch = {
        "left": jnp.asarray(np.stack([(s[0] / 255 - mean) / std for s in samples])),
        "right": jnp.asarray(np.stack([(s[1] / 255 - mean) / std for s in samples])),
        "disp": jnp.asarray(np.stack([s[2] for s in samples])),
    }
    if args.model == "STTR":
        # STTR's loss needs occlusion GT; the stereogram's disparity gives
        # exact border occlusion (reference _left_border_occ semantics:
        # a left pixel with x - disp < 0 has no right correspondence)
        disp_np = np.stack([s[2] for s in samples])
        xs = np.arange(w, dtype=np.float32)[None, None, :]
        batch["occ_mask"] = jnp.asarray((xs - disp_np < 0).astype(np.float32))
        batch["occ_mask_right"] = jnp.asarray(
            (xs + disp_np >= w).astype(np.float32))

    model = MODELS.get(args.model)(max_disp=args.max_disp, dtype=jnp.bfloat16,
                                   **extra_kwargs)
    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=True))(batch)
    lr = (optax.cosine_decay_schedule(args.lr, args.steps)
          if args.cosine else args.lr)
    tx = optax.chain(optax.clip(0.1), optax.adamw(lr))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}), tx=tx)

    @jax.jit
    def step(state, batch):
        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"])
            loss, _ = model.get_loss(out, batch)
            return loss, (mut["batch_stats"], out["disp_pred"])

        (loss, (bs, pred)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        epe = jnp.mean(jnp.abs(pred - batch["disp"]))
        return state.apply_gradients(grads, bs), loss, epe

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss, epe = step(state, batch)
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):7.3f}  train-EPE {float(epe):6.2f} px"
                  + (f"  ({time.perf_counter()-t0:.0f}s)" if i else ""))
    final = float(epe)
    print(f"final EPE {final:.2f} px "
          f"({'CONVERGED' if final < 3.0 else 'check hyperparameters'})")


if __name__ == "__main__":
    main()
