"""Generate split files (`data/<DS>/*.txt`) by scanning a dataset root.

The reference ships pre-built split lists (reference: data/<DS>/*.txt,
consumed by stereo/datasets/dataset_template.py:17-35 — space-separated
root-relative paths, one sample per line). This tool regenerates them from
an on-disk dataset so users do not depend on checked-in lists:

    python tools/make_splits.py kitti15 --root /data/KITTI15 --out data/KITTI15
    python tools/make_splits.py sceneflow --root /data/SceneFlow --out data/SceneFlow

Line formats per dataset match the reference conventions exactly (columns:
left image, right image, disparity[, disp_right, occ, occ_right]); test
splits carry only the two image columns.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Callable, Dict, List

GENERATORS: Dict[str, Callable] = {}


def generator(name):
    def deco(fn):
        GENERATORS[name] = fn
        return fn
    return deco


def _rel_glob(root: str, pattern: str) -> List[str]:
    hits = glob.glob(os.path.join(root, pattern), recursive=True)
    return sorted(os.path.relpath(p, root) for p in hits)


def _write(out_dir: str, name: str, lines: List[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"{path}: {len(lines)} samples")


@generator("kitti12")
def kitti12(root, out):
    train = [f"training/colored_0/{os.path.basename(p)} "
             f"training/colored_1/{os.path.basename(p)} "
             f"training/disp_occ/{os.path.basename(p)}"
             for p in _rel_glob(root, "training/colored_0/*_10.png")]
    _write(out, "kitti12_train194.txt", train)
    _write(out, "kitti12_train180.txt", train[:180])
    _write(out, "kitti12_val14.txt", train[180:])
    test = [f"testing/colored_0/{os.path.basename(p)} "
            f"testing/colored_1/{os.path.basename(p)}"
            for p in _rel_glob(root, "testing/colored_0/*_10.png")]
    _write(out, "kitti12_test.txt", test)


@generator("kitti15")
def kitti15(root, out):
    train = [f"training/image_2/{os.path.basename(p)} "
             f"training/image_3/{os.path.basename(p)} "
             f"training/disp_occ_0/{os.path.basename(p)}"
             for p in _rel_glob(root, "training/image_2/*_10.png")]
    _write(out, "kitti15_train200.txt", train)
    _write(out, "kitti15_train180.txt", train[:180])
    _write(out, "kitti15_val20.txt", train[180:])
    test = [f"testing/image_2/{os.path.basename(p)} "
            f"testing/image_3/{os.path.basename(p)}"
            for p in _rel_glob(root, "testing/image_2/*_10.png")]
    _write(out, "kitti15_test.txt", test)


def _sceneflow_lines(root, pass_name, split):
    """FlyingThings3D `TRAIN`/`TEST` plus (train only) Driving + Monkaa."""
    lines = []
    ft = f"FlyingThings3D/frames_{pass_name}/{split}/*/*/left/*.png"
    for p in _rel_glob(root, ft):
        disp = p.replace(f"frames_{pass_name}", "disparity")[:-4] + ".pfm"
        lines.append(f"{p} {p.replace('/left/', '/right/')} {disp}")
    if split == "TRAIN":
        for sub in (f"Driving/frames_{pass_name}/**/left/*.png",
                    f"Monkaa/frames_{pass_name}/*/left/*.png"):
            for p in _rel_glob(root, sub):
                disp = p.replace(f"frames_{pass_name}", "disparity")[:-4] + ".pfm"
                lines.append(f"{p} {p.replace('/left/', '/right/')} {disp}")
    return lines


@generator("sceneflow")
def sceneflow(root, out):
    for pass_name in ("finalpass", "cleanpass"):
        if not os.path.isdir(os.path.join(root, "FlyingThings3D",
                                          f"frames_{pass_name}")):
            continue
        _write(out, f"sceneflow_{pass_name}_train.txt",
               _sceneflow_lines(root, pass_name, "TRAIN"))
        _write(out, f"sceneflow_{pass_name}_test.txt",
               _sceneflow_lines(root, pass_name, "TEST"))


@generator("flyingthings3d_sttr")
def flyingthings3d_sttr(root, out):
    """STTR's occlusion-mask split: FlyingThings3D TEST frames paired with
    the sequentially numbered FlyingThings3D_subset/val occlusion PNGs."""
    lines = []
    counter = 0
    frames = _rel_glob(root, "FlyingThings3D/frames_finalpass/TEST/*/*/left/*.png")
    for p in frames:
        disp = p.replace("frames_finalpass", "disparity")[:-4] + ".pfm"
        occ = f"FlyingThings3D_subset/val/disparity_occlusions/left/{counter:07d}.png"
        lines.append(" ".join([
            p, p.replace("/left/", "/right/"),
            disp, disp.replace("/left/", "/right/"),
            occ, occ.replace("/left/", "/right/"),
        ]))
        counter += 1
    _write(out, "FlyingThings3D_sttr_test.txt", lines)


@generator("middlebury")
def middlebury(root, out):
    for res in ("Q", "H", "F"):
        lines = [f"{os.path.dirname(p)}/im0.png {os.path.dirname(p)}/im1.png "
                 f"{os.path.dirname(p)}/disp0GT.pfm"
                 for p in _rel_glob(root, f"MiddEval3/training{res}/*/im0.png")]
        _write(out, f"MiddEval3_train_{res.lower()}.txt", lines)


@generator("eth3d")
def eth3d(root, out):
    train = [f"{os.path.dirname(p)}/im0.png {os.path.dirname(p)}/im1.png "
             f"{os.path.dirname(p)}/disp0GT.pfm"
             for p in _rel_glob(root, "two_view_training/*/im0.png")]
    _write(out, "ETH3D_train.txt", train)
    test = [f"{os.path.dirname(p)}/im0.png {os.path.dirname(p)}/im1.png"
            for p in _rel_glob(root, "two_view_testing/*/im0.png")]
    _write(out, "ETH3D_test.txt", test)


@generator("sintel")
def sintel(root, out):
    for pass_name in ("clean", "final"):
        lines = []
        for p in _rel_glob(root, f"training/{pass_name}_left/*/frame_*.png"):
            disp = p.replace(f"{pass_name}_left", "disparities")
            lines.append(f"{p} {p.replace(f'{pass_name}_left', f'{pass_name}_right')} {disp}")
        _write(out, f"Sintel_{pass_name}_train.txt", lines)


@generator("instereo2k")
def instereo2k(root, out):
    train = [f"{os.path.dirname(p)}/left.png {os.path.dirname(p)}/right.png "
             f"{os.path.dirname(p)}/left_disp.png"
             for p in _rel_glob(root, "train/part*/*/left.png")]
    _write(out, "InStereo2K_train.txt", train)
    test = [f"{os.path.dirname(p)}/left.png {os.path.dirname(p)}/right.png "
            f"{os.path.dirname(p)}/left_disp.png"
            for p in _rel_glob(root, "test/*/left.png")]
    _write(out, "InStereo2K_test.txt", test)


@generator("spring")
def spring(root, out):
    train = []
    for p in _rel_glob(root, "train/*/frame_left/frame_left_*.png"):
        disp = (p.replace("frame_left", "disp1_left")[:-4] + ".dsp5")
        train.append(f"{p} {p.replace('frame_left', 'frame_right')} {disp}")
    _write(out, "spring_train.txt", train)
    test = [f"{p} {p.replace('frame_left', 'frame_right')}"
            for p in _rel_glob(root, "test/*/frame_left/frame_left_*.png")]
    _write(out, "spring_test.txt", test)


@generator("unrealstereo4k")
def unrealstereo4k(root, out):
    lines = []
    for p in _rel_glob(root, "*/Image0/*.png"):
        disp = p.replace("Image0", "Disp0")[:-4] + ".npy"
        lines.append(f"{p} {p.replace('Image0', 'Image1')} {disp}")
    _write(out, "unrealstereo4k_all.txt", lines)


@generator("drivingstereo")
def drivingstereo(root, out):
    for size, ext in (("full", "png"), ("half", "jpg")):
        test = []
        for p in _rel_glob(
                root, f"test-left-image/left-image-{size}-size/*/*.{ext}"):
            right = p.replace("left", "right")
            disp = (p.replace("test-left-image", "test-disparity-map")
                    .replace(f"left-image-{size}-size", f"disparity-map-{size}-size")
                    [: -len(ext)] + "png")
            test.append(f"{p} {right} {disp}")
        _write(out, f"driving_stereo_{size}_test.txt", test)
    train = []
    for p in _rel_glob(root, "train-left-image/*/*.jpg"):
        right = p.replace("left", "right")
        disp = p.replace("train-left-image", "train-disparity-map")[:-4] + ".png"
        train.append(f"{p} {right} {disp}")
    if train:
        _write(out, "driving_stereo_train.txt", train)


@generator("argoverse")
def argoverse(root, out):
    """Left/right frames have distinct timestamps; pair by sorted order
    within each log (counts match per log)."""
    for split in ("train", "val", "test"):
        lines = []
        logs = _rel_glob(root, f"rectified_stereo_images_v1.1/{split}/*")
        for log in logs:
            lefts = _rel_glob(root, f"{log}/stereo_front_left_rect/*.jpg")
            rights = _rel_glob(root, f"{log}/stereo_front_right_rect/*.jpg")
            for lp, rp in zip(lefts, rights):
                if split == "test":
                    lines.append(f"{lp} {rp}")
                    continue
                ts = os.path.basename(lp).rsplit("_", 1)[1][:-4]
                log_id = os.path.basename(log)
                disp = (f"disparity_maps_v1.1/{split}/{log_id}/"
                        f"stereo_front_left_rect_disparity/disparity_{ts}.png")
                lines.append(f"{lp} {rp} {disp}")
        if lines:
            _write(out, f"argoverse_{split}.txt", lines)


@generator("crestereo")
def crestereo(root, out):
    lines = []
    for part in ("hole", "reflective", "shapenet", "tree"):
        for p in _rel_glob(root, f"{part}/*_left.jpg"):
            lines.append(f"{p} {p.replace('_left.jpg', '_right.jpg')} "
                         f"{p.replace('_left.jpg', '_left.disp.png')}")
    _write(out, "crestereo_train.txt", lines)


@generator("fallingthings")
def fallingthings(root, out):
    lines = []
    for p in _rel_glob(root, "fat/**/*.left.jpg"):
        lines.append(f"{p} {p.replace('.left.jpg', '.right.jpg')} "
                     f"{p.replace('.left.jpg', '.left.depth.png')}")
    _write(out, "fallingthings_all.txt", lines)


@generator("virtualkitti2")
def virtualkitti2(root, out):
    lines = []
    for p in _rel_glob(root, "Scene*/*/frames/rgb/Camera_0/rgb_*.jpg"):
        right = p.replace("Camera_0", "Camera_1")
        depth = (p.replace("/rgb/", "/depth/").replace("rgb_", "depth_")
                 [:-4] + ".png")
        lines.append(f"{p} {right} {depth}")
    _write(out, "virtualkitti2_all.txt", lines)


@generator("tartanair")
def tartanair(root, out):
    lines = []
    for p in _rel_glob(root, "*/*/*/*/image_left/*_left.png"):
        right = p.replace("image_left", "image_right").replace("_left.png", "_right.png")
        depth = p.replace("image_left", "depth_left").replace("_left.png", "_left_depth.npy")
        lines.append(f"{p} {right} {depth}")
    _write(out, "tartanair_all.txt", lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("dataset", choices=sorted(GENERATORS))
    ap.add_argument("--root", required=True, help="dataset root directory")
    ap.add_argument("--out", required=True, help="output dir for .txt files")
    args = ap.parse_args(argv)
    if not os.path.isdir(args.root):
        sys.exit(f"root not found: {args.root}")
    GENERATORS[args.dataset](args.root, args.out)


if __name__ == "__main__":
    main()
