"""MobileNetV3-Large-1.0 feature trunk (flax.linen, NHWC), built from scratch.

IINet's UNet matching encoder slices `timm.create_model(
'mobilenetv3_large_100')` into 5 stages (reference:
stereo/modeling/models/iinet/networks.py:355-371, layers=[1,2,3,5,6]);
this is the standard MobileNetV3-Large topology (Howard et al. 2019) with
the same stage taps and channel counts:

    s1 16@1/2 · s2 24@1/4 · s3 40@1/8 · s4 112@1/16 · s5 160@1/32

Module names mirror timm's parameter tree (conv_stem/bn1,
blocks.{i}.{j}.{conv_pw,conv_dw,conv_pwl,se.conv_reduce,se.conv_expand})
so converted checkpoints map 1:1 (utils/torch_convert).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


def _bn(mod, x, train, name):
    use_ra = (not train) or (not mod.is_mutable_collection("batch_stats"))
    return nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                        epsilon=1e-5, dtype=mod.dtype, name=name)(x)


def _act(kind):
    return {"re": nn.relu, "hs": jax.nn.hard_swish}[kind]


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: mean-pool → 1x1 reduce (relu) → 1x1 expand →
    hard-sigmoid gate."""

    reduced: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * jax.nn.hard_sigmoid(s)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (blocks.0.0): dw3x3 + pw, residual."""

    features: int
    act: str = "re"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        y = nn.Conv(inp, (3, 3), padding=[(1, 1)] * 2, feature_group_count=inp,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        y = _act(self.act)(_bn(self, y, train, "bn1"))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(y)
        y = _bn(self, y, train, "bn2")
        return x + y if inp == self.features else y


class InvertedResidualV3(nn.Module):
    """timm InvertedResidual: pw-expand + dw + optional SE + pw-linear."""

    features: int
    exp: int
    kernel: int = 3
    strides: int = 1
    act: str = "re"
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        use_res = self.strides == 1 and inp == self.features
        p = self.kernel // 2
        a = _act(self.act)
        y = nn.Conv(self.exp, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        y = a(_bn(self, y, train, "bn1"))
        y = nn.Conv(self.exp, (self.kernel,) * 2, strides=(self.strides,) * 2,
                    padding=[(p, p)] * 2, feature_group_count=self.exp,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(y)
        y = a(_bn(self, y, train, "bn2"))
        if self.use_se:
            y = SqueezeExcite(make_divisible(self.exp * 0.25),
                              dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = _bn(self, y, train, "bn3")
        return x + y if use_res else y


# (out, exp, kernel, stride, act, se) per block, grouped in timm stages —
# mobilenetv3_large_100 blocks 0-5 (6 = final ConvBnAct, unused by IINet)
MNV3_LARGE_BLOCKS: Sequence[Sequence[tuple]] = (
    (("ds", 16, 16, 3, 1, "re", False),),
    (("ir", 24, 64, 3, 2, "re", False), ("ir", 24, 72, 3, 1, "re", False)),
    (("ir", 40, 72, 5, 2, "re", True), ("ir", 40, 120, 5, 1, "re", True),
     ("ir", 40, 120, 5, 1, "re", True)),
    (("ir", 80, 240, 3, 2, "hs", False), ("ir", 80, 200, 3, 1, "hs", False),
     ("ir", 80, 184, 3, 1, "hs", False), ("ir", 80, 184, 3, 1, "hs", False),
     ("ir", 112, 480, 3, 1, "hs", True), ("ir", 112, 672, 3, 1, "hs", True)),
    (("ir", 160, 672, 5, 2, "hs", True), ("ir", 160, 960, 5, 1, "hs", True),
     ("ir", 160, 960, 5, 1, "hs", True)),
)


class MobileNetV3Features(nn.Module):
    """Returns [s1@1/2, s2@1/4, s3@1/8, s4@1/16, s5@1/32] feature maps —
    IINet's stage grouping (networks.py:366-371): timm blocks
    [0], [1], [2], [3,4], [5], where timm stage 3 and 4 fuse into one
    1/16 stage (stride-2 entry in 3, stride-1 blocks to 112ch in 4)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jnp.ndarray]:
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = jax.nn.hard_swish(_bn(self, x, train, "bn1"))
        taps = []
        for si, blocks in enumerate(MNV3_LARGE_BLOCKS):
            for bi, spec in enumerate(blocks):
                kind, out, exp, k, s, act, se = spec
                # timm block index: stage 3 in this table covers timm
                # stages 3 (4 blocks) and 4 (2 blocks)
                if si == 3:
                    tsi, tbi = (3, bi) if bi < 4 else (4, bi - 4)
                elif si == 4:
                    tsi, tbi = 5, bi
                else:
                    tsi, tbi = si, bi
                name = f"blocks_{tsi}_{tbi}"
                if kind == "ds":
                    x = DepthwiseSeparable(out, act, dtype=self.dtype,
                                           name=name)(x, train=train)
                else:
                    x = InvertedResidualV3(out, exp, k, s, act, se,
                                           dtype=self.dtype,
                                           name=name)(x, train=train)
            taps.append(x)
        return taps
