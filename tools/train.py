"""Training CLI (reference: tools/train.py).

Single-host single/multi-chip by default; multi-host via
`jax.distributed.initialize()` (replaces torchrun/NCCL rendezvous —
set JAX_COORDINATOR_ADDRESS etc. or run under a TPU pod runtime).

Usage:
    python tools/train.py --cfg_file cfgs/lightstereo/lightstereo_s_sceneflow.yaml \
        [--extra_tag tag] [--ckpt -1] [--model_par 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--save_root", default="output")
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--worker_type", choices=["thread", "process"], default="thread")
    p.add_argument("--ckpt", type=int, default=None,
                   help="resume epoch; latest if omitted and ckpts exist")
    p.add_argument("--model_par", type=int, default=1,
                   help="mesh size along the 'model' (disparity) axis")
    p.add_argument("--dist", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    return p.parse_args()


def inject_data_paths(cfg, path="cfgs/data_paths.yaml"):
    """Overwrite DATA_PATH per dataset from the machine-local mapping
    (reference: cfgs/data_basic.py DATA_PATH_DICT + tools/train.py:46-50)."""
    if not os.path.exists(path):
        return cfg
    import yaml

    with open(path) as f:
        roots = yaml.safe_load(f) or {}
    for info in cfg.DATA_CONFIG.DATA_INFOS:
        if info.DATASET in roots:
            info.DATA_PATH = roots[info.DATASET]
    return cfg


def run_dir_for(args, cfg):
    """save_root/<Dataset>/<Model>/<cfg_name>/<tag> (reference train.py:75-86)."""
    ds = cfg.DATA_CONFIG.DATA_INFOS[0].DATASET.replace("Dataset", "")
    cfg_name = os.path.splitext(os.path.basename(args.cfg_file))[0]
    return os.path.join(args.save_root, ds, cfg.MODEL.NAME, cfg_name, args.extra_tag)


def main():
    args = parse_args()
    if args.dist:
        jax.distributed.initialize()

    from openstereo_tpu.config import load_config
    from openstereo_tpu.parallel import make_mesh
    from openstereo_tpu.runtime import Trainer
    from openstereo_tpu.utils import set_random_seed

    cfg = load_config(args.cfg_file)
    cfg = inject_data_paths(cfg)
    set_random_seed(args.seed + jax.process_index())
    mesh = make_mesh(model=args.model_par)
    trainer = Trainer(cfg, run_dir_for(args, cfg), run_mode="train", mesh=mesh,
                      seed=args.seed, num_workers=args.workers, worker_type=args.worker_type)
    # resume priority: --ckpt flag, then MODEL.CKPT from the yaml (the
    # reference's staged recipes, e.g. cfnet_sceneflow_part2.yaml CKPT: 20,
    # encode the resume epoch in config — trainer_template.py:51,120-121)
    ckpt = args.ckpt
    if ckpt is None:
        cfg_ckpt = int(cfg.MODEL.get("CKPT", -1))
        if cfg_ckpt > -1:
            ckpt = cfg_ckpt
    if ckpt is None or ckpt >= 0:
        trainer.resume_ckpt(ckpt)
    trainer.train()


if __name__ == "__main__":
    main()
