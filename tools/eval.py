"""Evaluation CLI (reference: tools/eval.py).

Supports cross-dataset generalization eval by overriding DATA_CONFIG and
EVALUATOR from a standalone eval-data YAML (reference eval.py:37-41).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--eval_data_cfg_file", default=None)
    p.add_argument("--run_dir", default="output/eval")
    p.add_argument("--ckpt", type=int, default=None)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--worker_type", choices=["thread", "process"], default="thread")
    p.add_argument("--model_par", type=int, default=1)
    p.add_argument("--dist", action="store_true")
    args = p.parse_args()
    if args.dist:
        jax.distributed.initialize()

    from openstereo_tpu.config import load_config
    from openstereo_tpu.parallel import make_mesh
    from openstereo_tpu.runtime import Trainer

    from train import inject_data_paths

    cfg = load_config(args.cfg_file)
    if args.eval_data_cfg_file:
        ecfg = load_config(args.eval_data_cfg_file)
        cfg.DATA_CONFIG = ecfg.DATA_CONFIG
        cfg.EVALUATOR = ecfg.EVALUATOR
    cfg = inject_data_paths(cfg)

    mesh = make_mesh(model=args.model_par)
    trainer = Trainer(cfg, args.run_dir, run_mode="eval", mesh=mesh,
                      num_workers=args.workers, worker_type=args.worker_type)
    if args.ckpt is None or args.ckpt >= 0:
        trainer.resume_ckpt(args.ckpt)
    trainer.evaluate(0)


if __name__ == "__main__":
    main()
