"""Combined geometry-encoding-volume lookup (TPU-native).

Re-design of the reference Combined_Geo_Encoding_Volume
(reference: stereo/modeling/models/igev/geometry.py:8-66): the per-iteration
sampling of (a) the aggregated geometry volume along D and (b) the all-pairs
correlation along W, at 2r+1 taps around the current disparity, over a
2-level pyramid.

The reference reshapes to [B·H·W, C, 1, L] and calls grid_sample; here the
lookup axis is the trailing (lane) axis and sampling is two
`take_along_axis` gathers + lerp — a pure vectorised 1D linear interp with
zero padding, which is exactly grid_sample(align_corners=True, zeros) given
pixel coordinates. Gathers are the memory-bound core of the GRU loop.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def lookup_1d(vol: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linear-interp lookup along the last axis, gather-free.

    vol: [B,H,W,C,L]; pos: [B,H,W,T] (pixel coords in [0,L-1], zeros outside)
    → [B,H,W,C·T].

    Formulated as a per-pixel [C,L]×[L,T] contraction against a hat-function
    weight matrix relu(1-|pos-l|) — exactly linear interpolation with zero
    padding, but it runs on the MXU. The obvious two-tap `take_along_axis`
    version lowers to XLA gathers that degrade ~200× inside `lax.scan` on TPU
    (the IGEV GRU loop), while this form stays fast inside the loop.
    """
    b, h, w, c, l = vol.shape
    t = pos.shape[-1]
    idx = jnp.arange(l, dtype=pos.dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., :, None] - idx))  # [B,H,W,T,L]
    out = jnp.einsum("bhwcl,bhwtl->bhwct", vol, hat.astype(vol.dtype),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, h, w, c * t)


def avg_pool_last(x: jnp.ndarray) -> jnp.ndarray:
    """2× average pool along the last axis (pyramid construction)."""
    l = x.shape[-1] // 2
    return x[..., : 2 * l].reshape(*x.shape[:-1], l, 2).mean(-1)


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] × [B,H,W2,C] → [B,H,W,W2] (reference geometry.py:59-66).

    One einsum per row: a [W,C]·[C,W2] MXU contraction batched over (B,H).
    """
    return jnp.einsum("bhwc,bhvc->bhwv", fmap1, fmap2)


class CombinedGeoEncodingVolume:
    """Pre-pools the pyramids once; __call__ samples per GRU iteration."""

    def __init__(self, match_left: jnp.ndarray, match_right: jnp.ndarray,
                 geo_volume: jnp.ndarray, num_levels: int = 2, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        # geo_volume [B,D,H,W,C] → lookup layout [B,H,W,C,D]
        geo = jnp.transpose(geo_volume, (0, 2, 3, 4, 1))
        corr = all_pairs_correlation(match_left, match_right)[:, :, :, None, :]  # [B,H,W,1,W2]
        self.geo_pyramid: List[jnp.ndarray] = [geo]
        self.corr_pyramid: List[jnp.ndarray] = [corr]
        for _ in range(num_levels - 1):
            self.geo_pyramid.append(avg_pool_last(self.geo_pyramid[-1]))
            self.corr_pyramid.append(avg_pool_last(self.corr_pyramid[-1]))

    def __call__(self, disp: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """disp, coords: [B,H,W] → geo features [B,H,W,num_levels·(C+1)·(2r+1)]."""
        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)  # [2r+1]
        out = []
        for i in range(self.num_levels):
            scale = 2.0 ** i
            pos_geo = disp[..., None] / scale + dx          # [B,H,W,2r+1]
            out.append(lookup_1d(self.geo_pyramid[i], pos_geo))
            pos_corr = (coords - disp)[..., None] / scale + dx
            out.append(lookup_1d(self.corr_pyramid[i], pos_corr))
        return jnp.concatenate(out, axis=-1)
