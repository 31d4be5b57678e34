"""DPT depth head + DepthAnythingV2 wrapper (flax, NHWC).

Reference: stereo/modeling/models/monster/depth_anything_v2/dpt.py:24-393 and
util/blocks.py:4-148 (the FoundationStereo family vendors the same head).
Consumes DinoViT token taps, reassembles them into a 4-level pyramid,
fuses with RefineNet blocks (align-corners bilinear, implemented as the
banded interpolation matmuls in ops/upsample.py), and emits

- `feat`: the half-resolution feature map after ``output_conv1``
  (``features//2`` channels) — what FoundationStereo concatenates into its
  stereo feature pyramid (reference foundationstereo/core/extractor.py:306-316);
- `depth`: the relative-depth map after ``output_conv2`` + ReLU — what
  MonSter's mono branch feeds into iterative mutual refinement.

TPU notes: everything is NHWC convs and resize-matmuls; the trunk runs in
bf16 with f32 heads; the whole branch sits under one jit with the stereo
network, so XLA overlaps mono and stereo work on the MXU.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize_linear_align_corners
from .dinov2 import VIT_CONFIGS, DinoViT

DAV2_CONFIGS = {
    # encoder: (features, out_channels) — reference extractor model_configs
    "vits": (64, (48, 96, 192, 384)),
    "vitb": (128, (96, 192, 384, 768)),
    "vitl": (256, (256, 512, 1024, 1024)),
}


class ResidualConvUnit(nn.Module):
    """relu-conv ×2 with skip (reference util/blocks.py:29-81, bn=False)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """RefineNet fusion: add skip, refine, ×2 (or to `size`) align-corners
    bilinear, 1×1 out conv (reference util/blocks.py:84-148)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw: Tuple[int, int] | None = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="rcu1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_linear_align_corners(x, out_hw, axes=(1, 2))
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHead(nn.Module):
    """Reassemble ViT taps → fused pyramid → (feat, depth)
    (reference dpt.py:38-164)."""

    in_dim: int
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: List[Tuple[jnp.ndarray, jnp.ndarray]],
                 patch_h: int, patch_w: int):
        f = self.features
        levels = []
        for i, (tok, _cls) in enumerate(taps):
            x = tok.reshape(tok.shape[0], patch_h, patch_w, self.in_dim)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4),
                                     padding="VALID", dtype=self.dtype,
                                     name="resize0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2),
                                     padding="VALID", dtype=self.dtype,
                                     name="resize1")(x)
            elif i == 3:
                # torch Conv2d(k=3, s=2, padding=1) pads symmetrically;
                # XLA "SAME" at stride 2 does not — make it explicit
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name="resize3")(x)
            x = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"layer{i + 1}_rn")(x)
            levels.append(x)

        l1, l2, l3, l4 = levels
        p4 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet4")(
            l4, out_hw=l3.shape[1:3])
        p3 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet3")(
            p4, l3, out_hw=l2.shape[1:3])
        p2 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet2")(
            p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet1")(p2, l1)

        feat = nn.Conv(f // 2, (3, 3), padding="SAME", dtype=self.dtype,
                       name="output_conv1")(p1)
        # the reference returns `out` AFTER the align-corners upsample to the
        # full ViT-input resolution (dpt.py:135-141); FoundationStereo's
        # extractor then resizes that to (H/4, W/4) — two chained resizes,
        # so returning the pre-upsample map is not numerically equivalent.
        up = resize_linear_align_corners(
            feat, (patch_h * 14, patch_w * 14), axes=(1, 2))
        d = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                    name="output_conv2a")(up)
        d = nn.relu(d)
        d = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2b")(d)
        depth = nn.relu(d[..., 0])
        return up, depth


class DPTPyramidDecoder(nn.Module):
    """DPT decoder variant returning the 4 fusion paths as a feature
    pyramid instead of a depth map (reference dpt.py:167-288,
    DPTHead_decoder: refinenets applied at their own resolution, explicit
    align-corners upsampling between levels). MonSter's trainable
    'feat_decoder' branch."""

    in_dim: int
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: List[Tuple[jnp.ndarray, jnp.ndarray]],
                 patch_h: int, patch_w: int):
        f = self.features
        levels = []
        for i, (tok, _cls) in enumerate(taps):
            x = tok.reshape(tok.shape[0], patch_h, patch_w, self.in_dim)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4),
                                     padding="VALID", dtype=self.dtype,
                                     name="resize0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2),
                                     padding="VALID", dtype=self.dtype,
                                     name="resize1")(x)
            elif i == 3:
                # torch Conv2d(k=3, s=2, padding=1) pads symmetrically;
                # XLA "SAME" at stride 2 does not — make it explicit
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name="resize3")(x)
            x = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"layer{i + 1}_rn")(x)
            levels.append(x)

        l1, l2, l3, l4 = levels
        up = lambda x, ref: resize_linear_align_corners(  # noqa: E731
            x, (ref.shape[1], ref.shape[2]), axes=(1, 2))
        p4 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet4")(
            l4, out_hw=l4.shape[1:3])
        p3 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet3")(
            up(p4, l3), l3, out_hw=l3.shape[1:3])
        p2 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet2")(
            up(p3, l2), l2, out_hw=l2.shape[1:3])
        p1 = FeatureFusionBlock(f, dtype=self.dtype, name="refinenet1")(
            up(p2, l1), l1, out_hw=l1.shape[1:3])
        return p1, p2, p3, p4


class DepthAnythingV2(nn.Module):
    """DINOv2 trunk + DPT head (reference dpt.py:309-345).

    __call__(images [B,H,W,3], H,W multiples of 14) →
      (feat [B,h',w',features//2] — the FoundationStereo 'vit_feat' source,
       depth [B,H,W] relative depth). The trunk is frozen in every consumer
    (reference extractor.py:330: freeze_model) — callers wrap this module's
    params with stop_gradient via the FROZEN collection convention or just
    exclude them from the optimizer.
    """

    encoder: str = "vits"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats, out_ch = DAV2_CONFIGS[self.encoder]
        dim = VIT_CONFIGS[self.encoder][0]
        taps = DinoViT(self.encoder, dtype=self.dtype, name="pretrained")(x)
        return DPTHead(dim, feats, out_ch, dtype=self.dtype,
                       name="depth_head")(taps, x.shape[1] // 14, x.shape[2] // 14)
