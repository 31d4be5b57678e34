#!/usr/bin/env python
"""Scan a split/path file and report images that fail to decode.

TPU-native counterpart of the reference data-integrity scanner
(/root/reference/tools/check_data.py:1-45): reads a txt file of image
paths (one per line, as produced by tools/make_splits.py), decodes each
with the same reader the training pipeline uses, and writes the failing
paths to an error file.  Runs with a thread pool — decoding is
GIL-releasing C code, so threads scale.

Usage:
    python tools/check_data.py --input_path_file image.txt \
        --error_path_file image_error.txt [--workers 16]
"""

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openstereo_tpu.data.readers import read_image_rgb  # noqa: E402


def check_one(path: str) -> str | None:
    """Return the path if it fails to decode, else None."""
    try:
        img = read_image_rgb(path)
        if img is None or img.size == 0:
            return path
    except Exception:
        return path
    return None


def check_all(input_txt: str, error_txt: str, workers: int | None) -> int:
    paths = [ln.strip() for ln in open(input_txt) if ln.strip()]
    if not paths:
        print(f"no paths found in {input_txt}")
        return 0
    print(f"checking {len(paths)} images (first: {paths[0]}) ...")
    bad = []
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for i, res in enumerate(ex.map(check_one, paths)):
            if res is not None:
                print("decode failure:", res)
                bad.append(res)
            if (i + 1) % 10000 == 0:
                print(f"  {i + 1}/{len(paths)} checked, {len(bad)} bad")
    with open(error_txt, "w") as f:
        for p in sorted(bad):
            f.write(p + "\n")
    print(f"done: {len(bad)} failures written to {error_txt}")
    return len(bad)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_path_file", required=True,
                    help="txt file with one image path per line")
    ap.add_argument("--error_path_file", required=True,
                    help="where to write the failing paths")
    ap.add_argument("--workers", type=int, default=None,
                    help="thread-pool size (default: cpu count)")
    args = ap.parse_args()
    n_bad = check_all(args.input_path_file, args.error_path_file, args.workers)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
