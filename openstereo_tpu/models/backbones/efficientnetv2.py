"""EfficientNetV2-S feature extractor (flax.linen, NHWC), from scratch.

The reference's LightStereo-LX pulls `timm.create_model('efficientnetv2_rw_s',
features_only=True)` (reference: models/lightstereo/backbone.py:36-38) and
taps stage outputs with channels [48, 64, 160, 272]. timm and pretrained
weights are unavailable here, so this is the standard EfficientNetV2-S
topology (Tan & Le 2021, the rw_s channel plan) trained from scratch:

    stem 24 → FusedMBConv stages (24×2, 48×4 s2, 64×4 s2)
            → MBConv+SE stages (128×6 s2, 160×9, 272×15 s2)

tap points: c1 24@1/2 · c2 48@1/4 · c3 64@1/8 · c4 160@1/16 · c5 272@1/32.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBlock


def silu(x):
    return x * nn.sigmoid(x)


class SqueezeExcite(nn.Module):
    reduce_from: int  # channels the reduction ratio is computed from
    ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(1, int(self.reduce_from * self.ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = silu(nn.Conv(hidden, (1, 1), dtype=self.dtype, name="reduce")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                               name="expand")(s))
        return x * s


class FusedMBConv(nn.Module):
    features: int
    strides: int = 1
    expand: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        use_res = self.strides == 1 and inp == self.features
        y = x
        if self.expand != 1:
            y = ConvBlock(inp * self.expand, 3, strides=self.strides,
                          norm="batch", act=silu, dtype=self.dtype,
                          name="expand_conv")(y, train=train)
            y = ConvBlock(self.features, 1, norm="batch", dtype=self.dtype,
                          name="project")(y, train=train)
        else:
            y = ConvBlock(self.features, 3, strides=self.strides, norm="batch",
                          act=silu, dtype=self.dtype, name="conv")(y, train=train)
        return x + y if use_res else y


class MBConv(nn.Module):
    features: int
    strides: int = 1
    expand: int = 6
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand
        use_res = self.strides == 1 and inp == self.features
        y = ConvBlock(hidden, 1, norm="batch", act=silu, dtype=self.dtype,
                      name="pw")(x, train=train)
        y = ConvBlock(hidden, 3, strides=self.strides, groups=hidden,
                      norm="batch", act=silu, dtype=self.dtype,
                      name="dw")(y, train=train)
        y = SqueezeExcite(inp, self.se_ratio, dtype=self.dtype, name="se")(y)
        y = ConvBlock(self.features, 1, norm="batch", dtype=self.dtype,
                      name="pw_linear")(y, train=train)
        return x + y if use_res else y


# (block, expand, channels, repeats, stride)
_STAGES = [
    ("fused", 1, 24, 2, 1),
    ("fused", 4, 48, 4, 2),
    ("fused", 4, 64, 4, 2),
    ("mb", 4, 128, 6, 2),
    ("mb", 6, 160, 9, 1),
    ("mb", 6, 272, 15, 2),
]


class EfficientNetV2Features(nn.Module):
    """Returns [c1@1/2, c2@1/4, c3@1/8, c4@1/16, c5@1/32]
    with channels [24, 48, 64, 160, 272]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBlock(24, 3, strides=2, norm="batch", act=silu,
                      dtype=self.dtype, name="stem")(x, train=train)
        taps = []
        for si, (kind, e, c, n, s) in enumerate(_STAGES):
            for bi in range(n):
                stride = s if bi == 0 else 1
                if kind == "fused":
                    x = FusedMBConv(c, stride, e, dtype=self.dtype,
                                    name=f"stage{si}_block{bi}")(x, train=train)
                else:
                    x = MBConv(c, stride, e, dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(x, train=train)
            if si in (0, 1, 2, 4, 5):
                taps.append(x)
        return taps
