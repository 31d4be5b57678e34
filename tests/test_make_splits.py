"""tools/make_splits.py — split files regenerated from a scanned dataset root
match the reference line conventions (reference: data/<DS>/*.txt)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import make_splits  # noqa: E402


def _touch(root, rel):
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"")


def _lines(out, name):
    with open(os.path.join(out, name)) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_kitti15_splits(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    for i in range(200):
        _touch(root, f"training/image_2/{i:06d}_10.png")
        _touch(root, f"training/image_2/{i:06d}_11.png")  # non-_10 ignored
    for i in range(5):
        _touch(root, f"testing/image_2/{i:06d}_10.png")
    make_splits.main(["kitti15", "--root", str(root), "--out", str(out)])

    train = _lines(out, "kitti15_train200.txt")
    assert len(train) == 200
    assert train[0] == ("training/image_2/000000_10.png "
                        "training/image_3/000000_10.png "
                        "training/disp_occ_0/000000_10.png")
    assert len(_lines(out, "kitti15_train180.txt")) == 180
    val = _lines(out, "kitti15_val20.txt")
    assert len(val) == 20 and val[0].startswith("training/image_2/000180_10.png")
    test = _lines(out, "kitti15_test.txt")
    assert test[0] == "testing/image_2/000000_10.png testing/image_3/000000_10.png"


def test_kitti12_splits(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    for i in range(194):
        _touch(root, f"training/colored_0/{i:06d}_10.png")
    make_splits.main(["kitti12", "--root", str(root), "--out", str(out)])
    assert len(_lines(out, "kitti12_train194.txt")) == 194
    assert len(_lines(out, "kitti12_val14.txt")) == 14
    assert _lines(out, "kitti12_train194.txt")[0].endswith(
        "training/disp_occ/000000_10.png")


def test_sceneflow_splits(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    for split, scene in (("TRAIN", "A/0000"), ("TEST", "A/0001")):
        for side in ("left", "right"):
            _touch(root, f"FlyingThings3D/frames_finalpass/{split}/{scene}/{side}/0006.png")
    _touch(root, "Driving/frames_finalpass/15mm_focallength/scene_forwards/fast/left/0001.png")
    _touch(root, "Monkaa/frames_finalpass/a_rain_of_stones_x2/left/0001.png")
    make_splits.main(["sceneflow", "--root", str(root), "--out", str(out)])

    train = _lines(out, "sceneflow_finalpass_train.txt")
    assert train[0] == ("FlyingThings3D/frames_finalpass/TRAIN/A/0000/left/0006.png "
                        "FlyingThings3D/frames_finalpass/TRAIN/A/0000/right/0006.png "
                        "FlyingThings3D/disparity/TRAIN/A/0000/left/0006.pfm")
    assert any(ln.startswith("Driving/") for ln in train)
    assert any(ln.startswith("Monkaa/") for ln in train)
    test = _lines(out, "sceneflow_finalpass_test.txt")
    assert len(test) == 1 and "/TEST/" in test[0]


def test_sttr_split_pairs_sequential_occlusions(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    for scene, frame in (("A/0000", "0006"), ("A/0000", "0007"), ("B/0001", "0006")):
        _touch(root, f"FlyingThings3D/frames_finalpass/TEST/{scene}/left/{frame}.png")
    make_splits.main(["flyingthings3d_sttr", "--root", str(root), "--out", str(out)])
    lines = _lines(out, "FlyingThings3D_sttr_test.txt")
    assert len(lines) == 3
    cols = lines[0].split(" ")
    assert len(cols) == 6
    assert cols[4] == "FlyingThings3D_subset/val/disparity_occlusions/left/0000000.png"
    assert lines[2].split(" ")[4].endswith("0000002.png")


def test_middlebury_eth3d_instereo2k(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    _touch(root, "MiddEval3/trainingQ/Adirondack/im0.png")
    make_splits.main(["middlebury", "--root", str(root), "--out", str(out)])
    assert _lines(out, "MiddEval3_train_q.txt")[0] == (
        "MiddEval3/trainingQ/Adirondack/im0.png "
        "MiddEval3/trainingQ/Adirondack/im1.png "
        "MiddEval3/trainingQ/Adirondack/disp0GT.pfm")

    root2, out2 = tmp_path / "ds2", tmp_path / "out2"
    _touch(root2, "two_view_training/delivery_area_1l/im0.png")
    _touch(root2, "two_view_testing/lakeside_1l/im0.png")
    make_splits.main(["eth3d", "--root", str(root2), "--out", str(out2)])
    assert _lines(out2, "ETH3D_train.txt")[0].endswith("disp0GT.pfm")
    assert len(_lines(out2, "ETH3D_test.txt")[0].split(" ")) == 2

    root3, out3 = tmp_path / "ds3", tmp_path / "out3"
    _touch(root3, "train/part1/000000/left.png")
    _touch(root3, "test/000040/left.png")
    make_splits.main(["instereo2k", "--root", str(root3), "--out", str(out3)])
    assert _lines(out3, "InStereo2K_train.txt")[0] == (
        "train/part1/000000/left.png train/part1/000000/right.png "
        "train/part1/000000/left_disp.png")


def test_spring_and_driving(tmp_path):
    root, out = tmp_path / "ds", tmp_path / "out"
    _touch(root, "train/0001/frame_left/frame_left_0001.png")
    _touch(root, "test/0003/frame_left/frame_left_0001.png")
    make_splits.main(["spring", "--root", str(root), "--out", str(out)])
    assert _lines(out, "spring_train.txt")[0] == (
        "train/0001/frame_left/frame_left_0001.png "
        "train/0001/frame_right/frame_right_0001.png "
        "train/0001/disp1_left/disp1_left_0001.dsp5")
    assert len(_lines(out, "spring_test.txt")[0].split(" ")) == 2

    root2, out2 = tmp_path / "ds2", tmp_path / "out2"
    _touch(root2, "test-left-image/left-image-half-size/2018-07-11/a.jpg")
    make_splits.main(["drivingstereo", "--root", str(root2), "--out", str(out2)])
    line = _lines(out2, "driving_stereo_half_test.txt")[0]
    assert line == ("test-left-image/left-image-half-size/2018-07-11/a.jpg "
                    "test-right-image/right-image-half-size/2018-07-11/a.jpg "
                    "test-disparity-map/disparity-map-half-size/2018-07-11/a.png")


def test_generated_split_loads_via_dataset(tmp_path):
    """Close the loop: a generated split parses through DatasetTemplate."""
    from openstereo_tpu.config import Config
    from openstereo_tpu.data.datasets import KittiDataset

    root, out = tmp_path / "ds", tmp_path / "out"
    for i in range(3):
        _touch(root, f"training/image_2/{i:06d}_10.png")
    make_splits.main(["kitti15", "--root", str(root), "--out", str(out)])
    info = Config.from_dict({
        "DATASET": "KittiDataset",
        "DATA_SPLIT": {"TRAINING": os.path.join(str(out), "kitti15_train200.txt")},
        "DATA_PATH": str(root),
    })
    cfg = Config.from_dict({"DATA_TRANSFORM": {"TRAINING": []}})
    ds = KittiDataset(info, cfg, mode="training")
    assert len(ds) == 3
    assert ds._paths(0, 3)[2].endswith("training/disp_occ_0/000000_10.png")
