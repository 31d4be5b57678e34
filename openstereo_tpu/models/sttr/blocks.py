"""STTR feature extractor / tokenizer / context-adjustment blocks.

TPU-native equivalents of the reference STTR utilities
(reference: stereo/modeling/models/sttr/utilities/{feat_extractor_backbone_in.py,
feat_extractor_tokenizer.py,densenet_in.py,context_adjustment_layer.py}):
instance-normed SPP contracting path, DenseNet expanding path producing
full-resolution per-pixel tokens, and the WDSR-style context adjustment layer.
All NHWC.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize_bilinear
from ..layers import ConvBlock, head_dtype


class TVBasicBlockIN(nn.Module):
    """torchvision BasicBlock with InstanceNorm (reference backbone _make_layer)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBlock(self.features, 3, strides=self.strides, norm="instance",
                      act=nn.relu, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, norm="instance", dtype=self.dtype,
                      name="conv2")(y, train=train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides, norm="instance",
                          dtype=self.dtype, name="downsample")(x, train=train)
        return nn.relu(x + y)


class SppBackboneIN(nn.Module):
    """Contracting path → [src(3), 64@1/4, 128@1/8, 128@1/16]
    (reference feat_extractor_backbone_in.py:15-103)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jnp.ndarray]:
        src = x
        y = ConvBlock(16, 3, strides=2, norm="instance", act=nn.relu,
                      dtype=self.dtype, name="in_conv0")(x, train=train)
        y = ConvBlock(16, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                      name="in_conv1")(y, train=train)
        y = ConvBlock(32, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                      name="in_conv2")(y, train=train)
        for i in range(3):
            y = TVBasicBlockIN(64, strides=2 if i == 0 else 1, dtype=self.dtype,
                               name=f"res1_{i}")(y, train=train)
        out1 = y
        for i in range(3):
            y = TVBasicBlockIN(128, strides=2 if i == 0 else 1, dtype=self.dtype,
                               name=f"res2_{i}")(y, train=train)
        out2 = y

        h16 = -(-src.shape[1] // 16)
        w16 = -(-src.shape[2] // 16)
        branches = []
        for i, pool in enumerate((16, 8, 4, 2)):
            ph, pw = min(pool, out2.shape[1]), min(pool, out2.shape[2])
            b = nn.avg_pool(out2, (ph, pw), strides=(ph, pw))
            b = ConvBlock(32, 1, norm="instance", act=nn.relu, dtype=self.dtype,
                          name=f"branch{i}")(b, train=train)
            branches.append(resize_bilinear(b, (h16, w16)))
        out3 = jnp.concatenate(branches, axis=-1)  # 128 @ 1/16
        return [src, out1, out2, out3]


class DenseBlockIN(nn.Module):
    """DenseNet block with InstanceNorm (reference densenet_in.py).

    Each layer: IN-relu-conv1x1(bn_size·growth) → IN-relu-conv3x3(growth),
    concatenated. Returns the full concatenation (callers slice new features).
    """

    num_layers: int
    growth_rate: int = 4
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def instance_norm(v, name):
            # epsilon matches torch nn.InstanceNorm2d (1e-5, not flax's 1e-6)
            return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                                use_bias=False, use_scale=False,
                                dtype=self.dtype, name=name)(v)

        feats = x
        for i in range(self.num_layers):
            y = nn.relu(instance_norm(feats, f"norm1_{i}"))
            y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"conv1_{i}")(y)
            y = nn.relu(instance_norm(y, f"norm2_{i}"))
            y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv2_{i}")(y)
            feats = jnp.concatenate([feats, y], axis=-1)
        return feats


def center_crop(x, th, tw):
    h, w = x.shape[1], x.shape[2]
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return x[:, y0 : y0 + th, x0 : x0 + tw]


class TransitionUp(nn.Module):
    """Deconv ×2 (or ×4) + center crop + concat skip
    (reference feat_extractor_tokenizer.py:13-39)."""

    features: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        # torch ConvTranspose2d(k3, s2, p0): out = 2·in + 1 → crop to skip
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2), padding="VALID",
                             use_bias=self.scale == 2, dtype=self.dtype, name="up1")(x)
        if self.scale == 4:
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             use_bias=False, use_scale=False, dtype=self.dtype,
                             name="in")(x)
            x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                                 padding="VALID", use_bias=True, dtype=self.dtype,
                                 name="up2")(x)
        x = center_crop(x, skip.shape[1], skip.shape[2])
        return jnp.concatenate([x, skip], axis=-1)


class Tokenizer(nn.Module):
    """Expanding path → full-res hidden_dim tokens
    (reference feat_extractor_tokenizer.py:63-120)."""

    hidden_dim: int = 128
    growth_rate: int = 4
    block_config: Sequence[int] = (4, 4, 4, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], *, train: bool = False):
        src, out1, out2, out3 = features
        g = self.growth_rate
        bc = list(self.block_config)[::-1]

        y = DenseBlockIN(bc[0], g, dtype=self.dtype, name="bottleneck")(
            out3, train=train)[..., -bc[0] * g:]
        # 1/16 → 1/8
        y = TransitionUp(bc[0] * g, 2, dtype=self.dtype, name="up0")(y, out2)
        y = DenseBlockIN(bc[1], g, dtype=self.dtype, name="dense0")(
            y, train=train)[..., -bc[1] * g:]
        # 1/8 → 1/4
        y = TransitionUp(bc[1] * g, 2, dtype=self.dtype, name="up1")(y, out1)
        y = DenseBlockIN(bc[2], g, dtype=self.dtype, name="dense1")(
            y, train=train)[..., -bc[2] * g:]
        # 1/4 → full, concat raw image, fuse
        y = TransitionUp(self.hidden_dim, 4, dtype=self.dtype, name="up2")(y, src)
        y = ConvBlock(self.hidden_dim, 3, norm="instance", act=nn.relu,
                      dtype=self.dtype, name="final0")(y, train=train)
        y = ConvBlock(self.hidden_dim, 3, norm="instance", act=nn.relu,
                      dtype=self.dtype, name="final1")(y, train=train)
        return y


class WNConv(nn.Module):
    """Weight-normalised conv (reference CAL uses torch weight_norm)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        k = self.kernel_size
        v = self.param("v", nn.initializers.he_normal(),
                       (k, k, x.shape[-1], self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        norm = jnp.sqrt(jnp.sum(v.astype(head_dtype(self.dtype)) ** 2, axis=(0, 1, 2)) + 1e-12)
        w = (v * (g / norm)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(self.dtype)


class ContextAdjustmentLayer(nn.Module):
    """WDSR-style residual refinement of disp + occlusion head
    (reference context_adjustment_layer.py:10-70)."""

    num_blocks: int = 8
    feature_dim: int = 16
    expansion: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp_raw, occ_raw, img):
        # disp head
        feat = nn.Conv(self.feature_dim, (3, 3), padding="SAME", dtype=self.dtype,
                       name="in_conv")(jnp.concatenate([disp_raw, img], axis=-1))
        for i in range(self.num_blocks):
            y = WNConv(self.feature_dim * self.expansion, 3, dtype=self.dtype,
                       name=f"res{i}_a")(jnp.concatenate([disp_raw, feat], axis=-1))
            y = WNConv(self.feature_dim, 3, dtype=self.dtype,
                       name=f"res{i}_b")(nn.relu(y))
            feat = feat + y
        disp_res = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                           name="out_conv")(feat)
        disp_final = disp_raw + disp_res

        # occ head
        o = jnp.concatenate([occ_raw, img], axis=-1)
        o = WNConv(self.feature_dim, 3, dtype=self.dtype, name="occ0")(o)
        o = nn.relu(WNConv(self.feature_dim, 3, dtype=self.dtype, name="occ1")(o))
        o = WNConv(self.feature_dim, 3, dtype=self.dtype, name="occ2")(o)
        o = nn.relu(WNConv(self.feature_dim, 3, dtype=self.dtype, name="occ3")(o))
        occ_final = nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                                       name="occ4")(o))
        return disp_final, occ_final
