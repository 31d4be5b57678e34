"""MobileNetV2 feature extractor (flax.linen, NHWC), built from scratch.

The reference pulls `timm.create_model('mobilenetv2_100', features_only=True)`
(reference: stereo/modeling/models/lightstereo/backbone.py:33-36) and taps the
stage outputs. timm is unavailable here and pretrained ImageNet weights can't
be fetched on this box, so this is the standard MobileNetV2-1.0 topology
(Sandler et al. 2018) trained from scratch with the rest of the model; the
stage tap points and channel counts match the reference exactly:

    c1 16@1/2 · c2 24@1/4 · c3 32@1/8 · c4 96@1/16 · c5 160@1/32
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBlock, relu6


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        use_res = self.strides == 1 and inp == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBlock(hidden, 1, norm="batch", act=relu6, dtype=self.dtype,
                          name="pw")(y, train=train)
        y = ConvBlock(hidden, 3, strides=self.strides, groups=hidden,
                      norm="batch", act=relu6, dtype=self.dtype,
                      name="dw")(y, train=train)
        y = ConvBlock(self.features, 1, norm="batch", dtype=self.dtype,
                      name="pw_linear")(y, train=train)
        return x + y if use_res else y


# (expand_ratio, channels, repeats, stride) per stage — MobileNetV2-1.0
_STAGES = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
]


class MobileNetV2Features(nn.Module):
    """Returns [c1@1/2, c2@1/4, c3@1/8, c4@1/16, c5@1/32] feature maps.

    stem_act=False reproduces CoEx's trunk quirk — its Feature.forward
    applies bn1 without timm's act1 (reference coex_backbone.py:62-63)."""

    dtype: Any = jnp.float32
    stem_act: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBlock(32, 3, strides=2, norm="batch",
                      act=relu6 if self.stem_act else None,
                      dtype=self.dtype, name="stem")(x, train=train)
        taps = []
        for si, (t, c, n, s) in enumerate(_STAGES):
            for bi in range(n):
                x = InvertedResidual(
                    c, strides=s if bi == 0 else 1, expand_ratio=t,
                    dtype=self.dtype, name=f"stage{si}_block{bi}",
                )(x, train=train)
            # tap after stages 0 (16@/2), 1 (24@/4), 2 (32@/8), 4 (96@/16), 5 (160@/32)
            if si in (0, 1, 2, 4, 5):
                taps.append(x)
        return taps
