"""Split-file stereo datasets.

Covers the reference's 14 dataset loaders
(reference: stereo/datasets/{sceneflow,kitti,driving,middlebury,eth3d,sintel,
fallingthings,instereo2k,unrealstereo4k,crestereo,argoverse,spring,
virtual_kitti2,tartanair}_dataset.py — registry at datasets/__init__.py:21-35).

Each dataset reads a space-separated split file of root-relative paths and
yields numpy sample dicts:
  {'left' [H,W,3] f32, 'right' [H,W,3] f32, 'disp' [H,W] f32,
   ['disp_right'], ['occ_mask','occ_mask_right'], ['pad'], 'index', 'name'}
Transforms are applied per-sample on host; '_rng' carries the sample's
np.random.Generator for deterministic augmentation.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..config import Config
from ..registry import DATASETS
from . import readers
from .superpixels import cached_superpixels
from .transforms import build_transforms


class DatasetTemplate:
    """Reference: stereo/datasets/dataset_template.py:17-35."""

    def __init__(self, data_info: Config, data_cfg: Config, mode: str):
        self.data_info = data_info
        self.data_cfg = data_cfg
        self.mode = mode
        self.root = data_info.DATA_PATH
        split_file = data_info.DATA_SPLIT[mode.upper()]
        self.data_list: List[List[str]] = []
        if os.path.exists(split_file):
            with open(split_file) as fp:
                self.data_list = [ln.strip().split(" ") for ln in fp if ln.strip()]
        self.transform = build_transforms(data_cfg.DATA_TRANSFORM[mode.upper()])

    def __len__(self) -> int:
        return len(self.data_list)

    def _paths(self, idx: int, n: Optional[int] = None) -> List[str]:
        item = self.data_list[idx]
        return [os.path.join(self.root, p) for p in (item[:n] if n else item)]

    # cache-directory name under <root>/../SuperPixelLabel/ — the reference
    # uses per-dataset folder names (e.g. sceneflow_dataset.py:36)
    _spx_dir: Optional[str] = None

    def _add_super_pixels(self, sample: Dict, rel_path: str) -> Dict:
        """RETURN_SUPER_PIXEL: attach the (cached) superpixel label map and
        the occlusion placeholders NMRF's criterion consumes
        (reference sceneflow_dataset.py:26-59)."""
        if (self.data_info.get("RETURN_SUPER_PIXEL", False)
                and self.mode == "training"):
            sample.setdefault(
                "occ_mask", np.zeros_like(sample["disp"], dtype=bool))
            name = self._spx_dir or type(self).__name__.removesuffix("Dataset")
            sample["super_pixel_label"] = cached_superpixels(
                sample["left"], self.root, rel_path, name)
        return sample

    def _finish(self, sample: Dict, idx: int, name: str,
                rng: Optional[np.random.Generator] = None) -> Dict:
        sample["_rng"] = rng
        sample = self.transform(sample)
        sample.pop("_rng", None)
        if "disp" in sample:
            # post-transform validity (reference adds it across loaders,
            # e.g. sceneflow_dataset.py:71)
            sample["valid"] = sample["disp"] < 512
        sample["index"] = idx
        sample["name"] = name
        return sample

    def load(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        raise NotImplementedError


@DATASETS.register
class SceneFlowDataset(DatasetTemplate):
    """PFM disparities (reference: sceneflow_dataset.py:10-40)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_pfm(disp_p),
        }
        assert not np.isnan(sample["disp"]).any(), f"NaN disparity in {disp_p}"
        if self.data_info.get("RETURN_RIGHT_DISP", False):
            sample["disp_right"] = readers.read_disp_pfm(disp_p.replace("left", "right"))
        self._add_super_pixels(sample, self.data_list[idx][0])
        return self._finish(sample, idx, left_p, rng)


def _left_border_occ(disp: np.ndarray) -> np.ndarray:
    """Pixels whose match falls left of the frame (reference sceneflow_dataset.py:116-127)."""
    w = disp.shape[-1]
    return (np.arange(w, dtype=np.float32)[None, :] - disp) < 0


def _right_border_occ(disp_right: np.ndarray) -> np.ndarray:
    w = disp_right.shape[-1]
    return (np.arange(w, dtype=np.float32)[None, :] + disp_right) > w


@DATASETS.register
class FlyingThings3DSubsetDataset(DatasetTemplate):
    """Occlusion-mask variant used by STTR (reference: sceneflow_dataset.py:43-140)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p, disp_r_p, occ_p, occ_r_p = self._paths(idx, 6)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": np.nan_to_num(readers.read_disp_pfm(disp_p), nan=0.0),
            "disp_right": np.nan_to_num(readers.read_disp_pfm(disp_r_p), nan=0.0),
        }
        if self.data_info.get("RETURN_OCC_MASK", False):
            sample["occ_mask"] = np.array(Image.open(occ_p)).astype(bool)
            sample["occ_mask_right"] = np.array(Image.open(occ_r_p)).astype(bool)
        if self.data_info.get("ZEROING_OCC", False):
            sample = self._zero_occ(sample)
        return self._finish(sample, idx, left_p, rng)

    @staticmethod
    def _zero_occ(sample: Dict) -> Dict:
        disp = sample["disp"]
        w = disp.shape[-1]
        disp[(disp > w) | (disp < 0)] = 0
        sample["occ_mask"] |= _left_border_occ(disp)
        if "disp_right" in sample:
            sample["occ_mask_right"] |= _right_border_occ(sample["disp_right"])
        sample.pop("disp_right", None)
        disp[sample["occ_mask"]] = 0
        sample["disp"] = np.ascontiguousarray(disp, np.float32)
        return sample


@DATASETS.register
class KittiDataset(DatasetTemplate):
    """uint16 PNG / 256 (reference: kitti_dataset.py:8-40)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        if self.data_info.get("USE_NOC", False):
            disp_p = disp_p.replace("disp_occ", "disp_noc")
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_png_scaled(disp_p, 256.0),
        }
        if self.data_info.get("RETURN_RIGHT_DISP", False):
            sample["disp_right"] = readers.read_disp_png_scaled(
                disp_p.replace("c_0", "c_1"), 256.0)
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class DrivingDataset(DatasetTemplate):
    """DrivingStereo, KITTI-format PNGs (reference: driving_dataset.py)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_png_scaled(disp_p, 256.0),
        }
        return self._finish(sample, idx, left_p, rng)


class _PfmWithNoccMask(DatasetTemplate):
    """PFM disparity + nocc mask PNG (mask != 255 → occluded)."""

    mask_subst = ("", "")

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        disp = readers.read_disp_pfm(disp_p)
        disp[np.isinf(disp)] = 0
        mask_p = (left_p if self.mask_from_left else disp_p).replace(*self.mask_subst)
        occ = np.array(Image.open(mask_p).convert("L"), np.float32) != 255.0
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": disp,
            "occ_mask": occ,
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class MiddleburyDataset(_PfmWithNoccMask):
    """Reference: middlebury_dataset.py."""

    mask_from_left = True
    mask_subst = ("im0.png", "mask0nocc.png")


@DATASETS.register
class ETH3DDataset(_PfmWithNoccMask):
    """Reference: eth3d_dataset.py."""

    mask_from_left = False
    mask_subst = ("disp0GT.pfm", "mask0nocc.png")


@DATASETS.register
class SintelDataset(DatasetTemplate):
    """RGB-packed disparity (reference: sintel_dataset.py:42-47)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_sintel(disp_p),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class FallingThingsDataset(DatasetTemplate):
    """Depth PNG → disparity (reference: fallingthings_dataset.py).

    depth stored as uint16 cm ×100; fx·baseline/depth with the dataset's
    fixed camera intrinsics.
    """

    def load(self, idx, rng=None):
        left_p, right_p, depth_p = self._paths(idx, 3)
        depth = np.array(Image.open(depth_p), np.float32) / 100.0
        disp = readers.depth_to_disp(depth, fx=768.1605834960938, baseline=6.0)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": disp,
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class InStereo2KDataset(DatasetTemplate):
    """PNG / 100 (reference: instereo2k_dataset.py)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_png_scaled(disp_p, 100.0),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class UnrealStereo4KDataset(DatasetTemplate):
    """.npy disparity (reference: unrealstereo4k_dataset.py:23)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": np.abs(np.asarray(readers.read_disp_npy(disp_p), np.float32)),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class CREStereoDataset(DatasetTemplate):
    """PNG / 32 (reference: crestereo_dataset.py)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_png_scaled(disp_p, 32.0),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class ArgoverseDataset(DatasetTemplate):
    """PNG / 256 (reference: argoverse_dataset.py)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": readers.read_disp_png_scaled(disp_p, 256.0),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class SpringDataset(DatasetTemplate):
    """.dsp5 disparity stored at 2× resolution (reference: spring.py:46-52)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        disp = readers.read_disp_dsp5(disp_p)[::2, ::2]
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": np.ascontiguousarray(disp),
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class VirtualKitti2Dataset(DatasetTemplate):
    """Depth PNG (cm) → disparity with VKITTI2 intrinsics
    (reference: virtual_kitti2 loader)."""

    def load(self, idx, rng=None):
        left_p, right_p, depth_p = self._paths(idx, 3)
        depth = np.array(Image.open(depth_p), np.float32) / 100.0
        disp = readers.depth_to_disp(depth, fx=725.0087, baseline=0.532725)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": disp,
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class TartanAirDataset(DatasetTemplate):
    """Depth .npy → disparity, fx·baseline = 80 (reference: tartanair loader)."""

    def load(self, idx, rng=None):
        left_p, right_p, depth_p = self._paths(idx, 3)
        depth = np.load(depth_p).astype(np.float32)
        disp = readers.depth_to_disp(depth, fx=320.0, baseline=0.25)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": disp,
        }
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class CarlaDataset(DatasetTemplate):
    """CARLA depth PNGs (cm) → disparity with the simulated rig's
    baseline read from the path (reference: carla_dataset.py:18-77)."""

    _BASELINES = {"baseline_010": 10.0, "baseline_054": 54.0,
                  "baseline_100": 100.0, "baseline_200": 200.0,
                  "baseline_300": 300.0}

    def load(self, idx, rng=None):
        left_p, right_p, depth_p = self._paths(idx, 3)
        baseline = next((b for k, b in self._BASELINES.items()
                         if k in right_p), 54.0)
        depth = np.array(Image.open(depth_p), np.float32)  # cm
        disp = baseline * 1385.64 / (depth + 1e-6)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": disp.astype(np.float32),
        }
        self._add_super_pixels(sample, self.data_list[idx][0])
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class DynamicReplicaDataset(DatasetTemplate):
    """PNG disparity / 100 (reference: dynamic_replica.py:11-71)."""

    _spx_dir = "DynamicReplica"

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": np.array(Image.open(disp_p), np.float32) / 100.0,
        }
        self._add_super_pixels(sample, self.data_list[idx][0])
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class RealfillDataset(DatasetTemplate):
    """npy disparity (reference: realfill_dataset.py:14-51)."""

    def load(self, idx, rng=None):
        left_p, right_p, disp_p = self._paths(idx, 3)
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": np.load(disp_p).astype(np.float32),
        }
        self._add_super_pixels(sample, self.data_list[idx][0])
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class FoundationStereoDataset(DatasetTemplate):
    """NVIDIA FoundationStereo synthetic dump: folder-scanned (no split
    file), uint8-triple-encoded disparity PNGs
    (reference: foundationstereo.py:13-95)."""

    _spx_dir = "FoundationStereoDataset"

    def __init__(self, data_info, data_cfg, mode):
        super().__init__(data_info, data_cfg, mode)
        if not self.data_list and mode.upper() in data_info.DATA_SPLIT:
            import glob

            lefts = sorted(glob.glob(os.path.join(
                self.root, "*/dataset/data/left/rgb/*.jpg")))
            self.data_list = [[p] for p in lefts]

    @staticmethod
    def _decode_disp(png: np.ndarray, scale: float = 1000.0) -> np.ndarray:
        d = png.astype(np.float64)
        # (sic) the reference multiplies by 255, not 256
        # (foundationstereo.py:13-16)
        return ((d[..., 0] * 255 * 255 + d[..., 1] * 255 + d[..., 2])
                / scale).astype(np.float32)

    def load(self, idx, rng=None):
        left_p = self.data_list[idx][0]
        if not os.path.isabs(left_p):
            left_p = os.path.join(self.root, left_p)
        right_p = left_p.replace("left", "right")
        disp_p = left_p.replace("rgb", "disparity").replace(".jpg", ".png")
        sample = {
            "left": readers.read_image_rgb(left_p),
            "right": readers.read_image_rgb(right_p),
            "disp": self._decode_disp(np.array(Image.open(disp_p))),
        }
        rel = os.path.relpath(left_p, self.root)
        self._add_super_pixels(sample, rel)
        return self._finish(sample, idx, left_p, rng)


@DATASETS.register
class MonoDataset(DatasetTemplate):
    """Mono image + relative depth → synthesised stereo pair via the
    forward-splat warp (reference: mono_dataset.py:14-57 + mono.py;
    re-derived in data/mono_warp.py). Split lines: <image> <depth_png>."""

    def load(self, idx, rng=None):
        from . import mono_warp

        rng = rng or np.random.default_rng(idx)
        left_p, depth_p = self._paths(idx, 2)
        left = readers.read_image_rgb(left_p)
        bg_idx = int(rng.integers(0, len(self.data_list)))
        bg = readers.read_image_rgb(self._paths(bg_idx, 1)[0])
        import cv2

        disp_raw = cv2.imread(depth_p, cv2.IMREAD_UNCHANGED)
        disp_raw = np.asarray(disp_raw, np.float32) / 100.0

        left, bg, disp_raw = mono_warp.prepare_sizes(left, bg, disp_raw, rng)
        bg = mono_warp.transfer_color(bg, left)
        disp = mono_warp.process_disparity(disp_raw, rng,
                                           max_disparity_range=(50, 192))
        right = mono_warp.project_image(left, disp, bg)
        sample = {
            "left": left.astype(np.float32),
            "right": right.astype(np.float32),
            "disp": disp.astype(np.float32),
        }
        if (self.data_info.get("RETURN_SUPER_PIXEL", False)
                and self.mode == "training"):
            # synthesised views are never cached (random warp each epoch)
            from .superpixels import slic_superpixels

            sample["occ_mask"] = np.zeros_like(disp, dtype=bool)
            sample["super_pixel_label"] = slic_superpixels(left)
        return self._finish(sample, idx, left_p, rng)
