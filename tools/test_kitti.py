"""KITTI leaderboard submission tool (reference: tools/test_kitti.py).

Runs the model on the KITTI test split with a DivisiblePad transform, unpads
predictions using the recorded pad (reference test_kitti.py:114-115), and
writes uint16 PNGs ×256 ready for server upload.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--data_path", required=True, help="KITTI root directory")
    p.add_argument("--split_file", required=True, help="test split list")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt", type=int, default=None)
    p.add_argument("--out_dir", default="output/kitti_submission/disp_0")
    p.add_argument("--pad_by", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openstereo_tpu.config import load_config
    from openstereo_tpu.data.readers import read_image_rgb
    from openstereo_tpu.data.transforms import build_transforms
    from openstereo_tpu.models import build_model
    from PIL import Image

    cfg = load_config(args.cfg_file)
    model = build_model(cfg.MODEL, dtype=jnp.bfloat16)

    tf = build_transforms([
        {"NAME": "DivisiblePad", "BY": args.pad_by, "MODE": "tr"},
        {"NAME": "NormalizeImage", "MEAN": [0.485, 0.456, 0.406],
         "STD": [0.229, 0.224, 0.225]},
    ])

    with open(args.split_file) as f:
        items = [ln.strip().split(" ") for ln in f if ln.strip()]

    os.makedirs(args.out_dir, exist_ok=True)
    variables = None
    fwd = None
    for item in items:
        left_p = os.path.join(args.data_path, item[0])
        right_p = os.path.join(args.data_path, item[1])
        sample = {"left": read_image_rgb(left_p), "right": read_image_rgb(right_p)}
        sample = tf(sample)
        batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
                 if isinstance(v, np.ndarray) and v.ndim >= 2}

        if variables is None:
            variables = jax.jit(
                lambda b: model.init(jax.random.key(0), b, train=False))(batch)
            if args.ckpt_dir:
                import orbax.checkpoint as ocp

                mgr = ocp.CheckpointManager(
                    os.path.join(os.path.abspath(args.ckpt_dir), "ckpt"))
                step = mgr.latest_step() if args.ckpt is None else args.ckpt
                variables = mgr.restore(step, args=ocp.args.StandardRestore(
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}))
            fwd = jax.jit(lambda b: model.apply(variables, b, train=False)["disp_pred"])

        disp = np.asarray(fwd(batch)[0], np.float32)
        top, right, _, _ = [int(x) for x in sample["pad"]]
        disp = disp[top:, : disp.shape[1] - right if right else disp.shape[1]]

        name = os.path.basename(left_p)
        Image.fromarray((disp * 256.0).astype(np.uint16)).save(
            os.path.join(args.out_dir, name))
        print(f"wrote {name}  range {disp.min():.1f}..{disp.max():.1f}")


if __name__ == "__main__":
    main()
