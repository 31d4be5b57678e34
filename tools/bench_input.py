"""Input-pipeline throughput benchmark.

Measures StereoDataLoader end-to-end (PNG decode + PFM read + the full
train augmentation pipeline) on synthetic full-resolution SceneFlow-format
samples, across num_workers settings, and reports the **data-stall
fraction** against a target train step time:

    stall = (max(step, 1/rate) - step) / max(step, 1/rate)

i.e. the share of wall-clock the chip would sit idle waiting for data in
steady state (the prefetch queue hides transients but cannot beat the
producer's sustained rate).

Reference behavior matched: the torch stack loads each batch with
num_workers DataLoader processes (stereo/datasets/__init__.py:38-73); here
num_workers threads decode a batch's samples in parallel inside one
producer (data/loader.py).

Usage:
    python tools/bench_input.py --batch-size 4 --step-ms 34 --workers 1 2 4 8
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def write_pfm(path: str, data: np.ndarray):
    """Minimal little-endian Pf writer (inverse of readers.read_disp_pfm)."""
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(data.astype(np.float32)).tobytes())


def build_synth_root(root: str, n: int, h: int = 540, w: int = 960) -> str:
    """n SceneFlow-format samples: left/right PNG + left PFM + split file."""
    from PIL import Image

    os.makedirs(os.path.join(root, "left"), exist_ok=True)
    os.makedirs(os.path.join(root, "right"), exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        # textured images so PNG decode cost is realistic (not RLE-trivial)
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "left", f"{i:04d}.png"))
        Image.fromarray(np.roll(img, -7, axis=1)).save(
            os.path.join(root, "right", f"{i:04d}.png"))
        write_pfm(os.path.join(root, "left", f"{i:04d}.pfm"),
                  rng.rand(h, w).astype(np.float32) * 100 + 1)
        lines.append(f"left/{i:04d}.png right/{i:04d}.png left/{i:04d}.pfm")
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        f.write("\n".join(lines))
    return split


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--workers", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--worker-types", nargs="*", default=["thread", "process"])
    p.add_argument("--step-ms", type=float, default=34.0,
                   help="train step time to compare against "
                        "(default: LightStereo-S b4, docs/BENCHMARKS.md)")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--pipeline", choices=["full", "lightstereo"], default="full",
                   help="'full' = jitter+erase+crop+normalize (StereoBase/IGEV"
                        " style); 'lightstereo' = crop+normalize only")
    args = p.parse_args()

    from openstereo_tpu.config import Config
    from openstereo_tpu.data.loader import StereoDataLoader

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    split = build_synth_root(tmp, args.n_samples)
    data_cfg = Config.from_dict({
        "DATA_INFOS": [{
            "DATASET": "SceneFlowDataset",
            "DATA_SPLIT": {"TRAINING": split, "EVALUATING": split},
            "DATA_PATH": tmp,
            "RETURN_RIGHT_DISP": False,
        }],
        "DATA_TRANSFORM": {
            "TRAINING": ([
                {"NAME": "StereoColorJitter", "BRIGHTNESS": [0.6, 1.4],
                 "CONTRAST": [0.6, 1.4], "SATURATION": [0.6, 1.4],
                 "HUE": 0.5, "ASYMMETRIC_PROB": 0.2},
                {"NAME": "RandomErase", "PROB": 0.5, "MAX_TIME": 2,
                 "BOUNDS": [50, 100]},
            ] if args.pipeline == "full" else []) + [
                {"NAME": "RandomCrop", "SIZE": [320, 736], "Y_JITTER": False},
                {"NAME": "NormalizeImage", "MEAN": [0.485, 0.456, 0.406],
                 "STD": [0.229, 0.224, 0.225]},
            ],
        },
    })

    step_s = args.step_ms / 1e3
    results = {}
    for wt in args.worker_types:
        for nw in args.workers:
            loader = StereoDataLoader(data_cfg, args.batch_size, mode="training",
                                      num_workers=nw, prefetch=2,
                                      worker_type=wt)
            # warm epoch (page cache, pool spin-up), then timed epochs
            for _ in loader.epoch(0):
                pass
            t0 = time.perf_counter()
            n_batches = 0
            for e in range(1, args.epochs + 1):
                for _ in loader.epoch(e):
                    n_batches += 1
            dt = time.perf_counter() - t0
            rate = n_batches / dt  # batches/s sustained
            eff = max(step_s, 1.0 / rate)
            stall = (eff - step_s) / eff
            results[f"{wt}-{nw}"] = {
                "batches_per_s": round(rate, 2),
                "samples_per_s": round(rate * args.batch_size, 2),
                "stall_frac_at_step": round(stall, 4),
            }
            print(f"{wt:7s} num_workers={nw}: {rate:6.2f} batches/s "
                  f"({rate * args.batch_size:7.2f} samples/s), "
                  f"stall at {args.step_ms:.1f} ms step: {stall * 100:5.1f}%")

    print(json.dumps({"step_ms": args.step_ms, "batch_size": args.batch_size,
                      "results": results}))


if __name__ == "__main__":
    main()
