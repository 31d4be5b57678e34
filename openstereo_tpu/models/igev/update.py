"""IGEV multi-scale ConvGRU update machinery
(reference: stereo/modeling/models/igev/update.py:28-148), flax.linen NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize_linear_align_corners


def pool2x(x):
    """avg_pool k3 s2 p1 (reference update.py:101-102)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.avg_pool(x, (3, 3), strides=(2, 2), count_include_pad=True)


def interp_to(x, dest):
    """bilinear align_corners=True resize to dest's H,W (reference update.py:109-111)."""
    return resize_linear_align_corners(x, (dest.shape[1], dest.shape[2]), axes=(1, 2))


class ConvGRU(nn.Module):
    """Gated conv recurrence with optional context biases (reference update.py:28-44)."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, context, *x_list):
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        conv = lambda name: nn.Conv(self.hidden_dim, (3, 3), padding="SAME",  # noqa: E731
                                    dtype=self.dtype, name=name)
        cz, cr, cq = context if context is not None else (0.0, 0.0, 0.0)
        z = nn.sigmoid(conv("convz")(hx) + cz)
        r = nn.sigmoid(conv("convr")(hx) + cr)
        q = nn.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)) + cq)
        return (1 - z) * h + z * q


class SplitPointwise(nn.Module):
    """1×1 conv applied blockwise over a CONCAT-free list of 5D lookup
    outputs [B,H,W,C_i,T_i] — Σ_i einsum(bhwct,ctf) with static kernel row
    slices.

    Numerically the same contraction as concat→reshape→1×1 conv (summation
    regrouped only), but the per-iteration geo concat and its layout copy
    disappear from the GRU loop: XLA contracts each lookup output in
    whatever layout the lookup einsum produced (StereoBase profile:
    0.43 ms/iter of pure relayout copies on a 3.26 ms/iter loop body).
    Param tree matches nn.Conv (`kernel` [1,1,Cin,F], `bias` [F]) so
    checkpoints/conversion are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, blocks):
        cin = sum(b.shape[-2] * b.shape[-1] for b in blocks)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k2 = kernel[0, 0].astype(self.dtype)
        out = None
        off = 0
        for b in blocks:
            c, t = b.shape[-2], b.shape[-1]
            # concat order was C-major/T-minor per block (reshape(c·t))
            w = k2[off:off + c * t].reshape(c, t, self.features)
            off += c * t
            term = jnp.einsum("bhwct,ctf->bhwf", b.astype(self.dtype), w)
            out = term if out is None else out + term
        return out + bias.astype(self.dtype)


class BasicMotionEncoder(nn.Module):
    """Geo features + current disp → motion features (reference update.py:77-96).

    `geo` is either the flat concatenated feature map (legacy) or a list
    of 5D per-level lookup blocks — then convc1 runs blockwise through
    `SplitPointwise` with an identical parameter tree."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, geo):
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding="SAME",  # noqa: E731
                                          dtype=self.dtype, name=name)
        if isinstance(geo, (list, tuple)):
            cor = nn.relu(SplitPointwise(64, dtype=self.dtype,
                                         name="convc1")(geo))
        else:
            cor = nn.relu(conv(64, 1, "convc1")(geo))
        cor = nn.relu(conv(64, 3, "convc2")(cor))
        d = nn.relu(conv(64, 7, "convd1")(disp))
        d = nn.relu(conv(64, 3, "convd2")(d))
        out = nn.relu(conv(127, 3, "conv")(jnp.concatenate([cor, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)  # 128


class DispHead(nn.Module):
    """Two-conv regression head (reference update.py:17-25)."""

    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))
        return nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x)


class BasicMultiUpdateBlock(nn.Module):
    """3-scale GRU cascade with slow-fast scheduling support
    (reference update.py:114-148). hidden_dims ordered [1/16, 1/8, 1/4]
    to mirror the reference's indexing (net[0]=1/4 uses hidden_dims[2]).
    """

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, geo=None, disp=None,
                 iter04=True, iter08=True, iter16=True, update=True):
        net = list(net)
        if iter16:
            net[2] = ConvGRU(self.hidden_dims[0], dtype=self.dtype, name="gru16")(
                net[2], inp[2], pool2x(net[1]))
        if iter08:
            extra = [pool2x(net[0])]
            if self.n_gru_layers > 2:
                extra.append(interp_to(net[2], net[1]))
            net[1] = ConvGRU(self.hidden_dims[1], dtype=self.dtype, name="gru08")(
                net[1], inp[1], *extra)
        if iter04:
            motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(disp, geo)
            extra = [motion]
            if self.n_gru_layers > 1:
                extra.append(interp_to(net[1], net[0]))
            net[0] = ConvGRU(self.hidden_dims[2], dtype=self.dtype, name="gru04")(
                net[0], inp[0], *extra)
        if not update:
            return net
        delta_disp = DispHead(256, dtype=self.dtype, name="disp_head")(net[0])
        mask_feat_4 = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                                      name="mask_feat_4")(net[0]))
        return net, mask_feat_4, delta_disp
