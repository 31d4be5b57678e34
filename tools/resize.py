#!/usr/bin/env python
"""Batch cover-resize images listed in a txt file into a mirrored tree.

TPU-native counterpart of /root/reference/tools/resize.py:1-71 (used to
shrink pretraining corpora like ImageNet-21k): each image is scaled so
that BOTH target dimensions are covered (max-scale, aspect preserved),
then written under output_path_root with the same relative layout.

Usage:
    python tools/resize.py --input_path_file all.txt \
        --input_path_root /data/in/ --output_path_root /data/out/ \
        [--width 768 --height 384]
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor


def cover_size(h: int, w: int, tw: int, th: int) -> tuple[int, int]:
    """New (w, h) scaled by max ratio so the target box is covered."""
    scale = max(th / h, tw / w)
    nw, nh = int(w * scale), int(h * scale)
    # guard against int() truncation leaving one side short of the target
    if nw < tw:
        nw = tw
        nh = int(h * (nw / w))
    elif nh < th:
        nh = th
        nw = int(w * (nh / h))
    return nw, nh


def resize_one(path: str, in_root: str, out_root: str, tw: int, th: int):
    import cv2

    img = cv2.imread(path)
    if img is None:
        print("File open error:", path)
        return
    out_path = path.replace(in_root, out_root)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    nw, nh = cover_size(img.shape[0], img.shape[1], tw, th)
    cv2.imwrite(out_path, cv2.resize(img, (nw, nh)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_path_file", required=True)
    ap.add_argument("--input_path_root", required=True)
    ap.add_argument("--output_path_root", required=True)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()

    paths = sorted(ln.strip() for ln in open(args.input_path_file) if ln.strip())
    print(f"resizing {len(paths)} images to cover "
          f"{args.width}x{args.height} ...")
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        done = 0
        for _ in ex.map(lambda p: resize_one(
                p, args.input_path_root, args.output_path_root,
                args.width, args.height), paths):
            done += 1
            if done % 10000 == 0:
                print(f"  {done}/{len(paths)}")
    print("done")


if __name__ == "__main__":
    main()
