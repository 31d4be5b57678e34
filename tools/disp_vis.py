#!/usr/bin/env python
"""Colorize a single disparity file (pfm / png / npy) to a PNG.

TPU-native counterpart of /root/reference/tools/disp_vis.py:1-27, using
the same KITTI-style colormap as the training-time triptych visualizer.
Supports one more input type than the reference (npy, which several of
our export paths emit).

Usage:
    python tools/disp_vis.py --disp_path d.pfm --savename d.png \
        [--type pfm|png|npy] [--max_disp 192]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openstereo_tpu.data.readers import (  # noqa: E402
    read_disp_pfm, read_disp_png_scaled)
from openstereo_tpu.utils.visualization import disp_to_color  # noqa: E402


def load_disp(path: str, ftype: str) -> np.ndarray:
    if ftype == "pfm":
        return read_disp_pfm(path)
    if ftype == "png":
        return read_disp_png_scaled(path)
    if ftype == "npy":
        return np.load(path).astype(np.float32)
    raise SystemExit(f"type undefined: {ftype!r} (want pfm|png|npy)")


def main():
    from PIL import Image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--disp_path", required=True)
    ap.add_argument("--savename", required=True)
    ap.add_argument("--type", default="pfm", choices=["pfm", "png", "npy"])
    ap.add_argument("--max_disp", type=float, default=192.0)
    args = ap.parse_args()

    disp = np.ascontiguousarray(load_disp(args.disp_path, args.type),
                                dtype=np.float32)
    color = disp_to_color(disp, max_disp=args.max_disp).astype(np.uint8)
    Image.fromarray(color).save(args.savename)
    print(f"wrote {args.savename} ({disp.shape[1]}x{disp.shape[0]}, "
          f"disp range [{disp.min():.2f}, {disp.max():.2f}])")


if __name__ == "__main__":
    main()
