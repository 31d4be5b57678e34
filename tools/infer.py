"""Single image-pair inference CLI (reference: tools/infer.py).

Builds the EVALUATING transform from the config, runs the jitted model, writes
a 16-bit disparity PNG (×256) and optionally a KITTI-colormapped PNG.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--left_img_path", required=True)
    p.add_argument("--right_img_path", required=True)
    p.add_argument("--ckpt_dir", default=None, help="run dir containing ckpt/")
    p.add_argument("--ckpt", type=int, default=None)
    p.add_argument("--pretrained", default=None,
                   help="converted .msgpack (tools/convert_ckpt.py) or "
                        "reference .pth weights")
    p.add_argument("--out", default="disp_pred.png")
    p.add_argument("--colored", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from openstereo_tpu.config import load_config
    from openstereo_tpu.data.readers import read_image_rgb
    from openstereo_tpu.data.transforms import build_transforms
    from openstereo_tpu.models import build_model
    from openstereo_tpu.utils.visualization import disp_to_color

    cfg = load_config(args.cfg_file)
    model = build_model(cfg.MODEL, dtype=jnp.bfloat16)

    sample = {
        "left": read_image_rgb(args.left_img_path),
        "right": read_image_rgb(args.right_img_path),
    }
    tf = build_transforms(cfg.DATA_CONFIG.DATA_TRANSFORM["EVALUATING"])
    sample = tf(sample)
    batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
             if isinstance(v, np.ndarray) and v.ndim >= 2}

    variables = jax.jit(lambda b: model.init(jax.random.key(0), b, train=False))(batch)
    if args.ckpt_dir:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.join(os.path.abspath(args.ckpt_dir), "ckpt"))
        step = mgr.latest_step() if args.ckpt is None else args.ckpt
        restored = mgr.restore(step, args=ocp.args.StandardRestore(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}))
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    elif args.pretrained:
        from openstereo_tpu.runtime.pretrained import load_variables, partial_load

        new = load_variables(args.pretrained, cfg.MODEL.get("NAME"))
        params, loaded, _ = partial_load(variables["params"], new["params"])
        variables = dict(variables, params=params)
        if new.get("batch_stats") and variables.get("batch_stats"):
            bs, l2, _ = partial_load(variables["batch_stats"], new["batch_stats"])
            variables = dict(variables, batch_stats=bs)
            loaded += l2
        print(f"loaded {loaded} tensors from {args.pretrained}")

    out = jax.jit(lambda b: model.apply(variables, b, train=False))(batch)
    disp = np.asarray(out["disp_pred"][0], np.float32)

    if args.colored:
        Image.fromarray(disp_to_color(disp)).save(args.out)
    else:
        Image.fromarray((disp * 256.0).astype(np.uint16)).save(args.out)
    print(f"wrote {args.out}  (disp range {disp.min():.2f}..{disp.max():.2f})")


if __name__ == "__main__":
    main()
