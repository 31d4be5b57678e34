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

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


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


class MultiLookup:
    """All pyramid levels sampled in ONE masked hat-matrix contraction.

    `lookup_1d` issues one [C,L_i]x[L_i,T] einsum per level; with L_i of
    24-48 the MXU contraction dim sits far under the 128 lanes and each
    call pays its own kernel + layout copy. Concatenating the levels along
    L (with per-level position offsets) turns N lookups into one
    [C,SUM L_i]x[SUM L_i, N*T] einsum. A static [N*T, SUM L_i] block mask
    zeroes cross-level bleed at segment boundaries, which keeps the exact
    zero-padded-lookup semantics per level (measured on-chip at StereoBase
    shapes: 3.49 ms/iter f32-HIGHEST 4-einsum -> 1.52 ms/iter merged bf16,
    2.3x; see docs/BENCHMARKS.md round-5 notes).

    All volumes must share the channel count C; positions are pixel coords
    in each level's own [0, L_i-1] frame, zeros outside (grid_sample
    align_corners=True zero-padding semantics, like lookup_1d).
    """

    def __init__(self, vols: Sequence[jnp.ndarray]):
        self.sizes = [int(v.shape[-1]) for v in vols]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)[:-1]])
        self.cat = jnp.concatenate(list(vols), axis=-1)

    def __call__(self, pos_list: Sequence[jnp.ndarray],
                 flat: bool = True) -> List[jnp.ndarray]:
        """pos_list[i]: [B,H,W,T] per level → list of [B,H,W,C·T], or 5D
        [B,H,W,C,T] blocks when flat=False (for SplitPointwise consumers
        that contract without the reshape/relayout)."""
        cat = self.cat
        b, h, w, c, ltot = cat.shape
        t = pos_list[0].shape[-1]
        n = len(pos_list)
        pos = jnp.concatenate(
            [p + float(off) for p, off in zip(pos_list, self.offsets)], -1)
        idx = jnp.arange(ltot, dtype=pos.dtype)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., :, None] - idx))
        # static [n·T, Ltot] segment mask: tap-block i only reads segment i
        seg_of_l = np.repeat(np.arange(n), self.sizes)
        seg_of_t = np.repeat(np.arange(n), t)
        mask = (seg_of_t[:, None] == seg_of_l[None, :]).astype(cat.dtype)
        out = jnp.einsum("bhwcl,bhwtl->bhwct", cat, hat.astype(cat.dtype) * mask,
                         precision=jax.lax.Precision.HIGHEST)
        out = out.reshape(b, h, w, c, n, t)
        if flat:
            return [out[..., i, :].reshape(b, h, w, c * t) for i in range(n)]
        return [out[..., i, :] for i in range(n)]


def _ml_flatten(ml):
    return (ml.cat,), tuple(ml.sizes)


def _ml_unflatten(sizes, children):
    obj = object.__new__(MultiLookup)
    obj.sizes = list(sizes)
    obj.offsets = np.concatenate([[0], np.cumsum(obj.sizes)[:-1]])
    obj.cat = children[0]
    return obj


# registered as a pytree so the lookup rides nn.scan broadcast consts
# directly (sizes are static aux data; only the concatenated volume is a
# traced leaf)
jax.tree_util.register_pytree_node(MultiLookup, _ml_flatten, _ml_unflatten)


def lookup_dtype(dtype):
    """Storage/compute dtype for the GRU-loop lookup pyramids.

    bf16 models keep bf16 (the features feed bf16 convs anyway, and the
    f32-stored pyramid + HIGHEST einsum measured 1.8x slower on-chip);
    f32/f64 models keep head_dtype's at-least-f32 for parity."""
    if dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.promote_types(jnp.float32, dtype)


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
    """Pre-pools the pyramids once; __call__ samples per GRU iteration.

    Both pyramids' levels are sampled through `MultiLookup` — one merged
    masked-hat einsum for all geo levels and one for all corr levels per
    iteration (2 contractions instead of 2·num_levels), the round-5 fix
    for the scan-GRU roofline laggards. Output feature ordering is
    unchanged: [geo_0, corr_0, geo_1, corr_1, ...] per level.
    """

    def __init__(self, match_left: jnp.ndarray, match_right: jnp.ndarray,
                 geo_volume: jnp.ndarray, num_levels: int = 2, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        # geo_volume [B,D,H,W,C] → lookup layout [B,H,W,C,D]
        geo = jnp.transpose(geo_volume, (0, 2, 3, 4, 1))
        corr = all_pairs_correlation(match_left, match_right)[:, :, :, None, :]  # [B,H,W,1,W2]
        geo_pyramid: List[jnp.ndarray] = [geo]
        corr_pyramid: List[jnp.ndarray] = [corr]
        for _ in range(num_levels - 1):
            geo_pyramid.append(avg_pool_last(geo_pyramid[-1]))
            corr_pyramid.append(avg_pool_last(corr_pyramid[-1]))
        self.geo_lookup = MultiLookup(geo_pyramid)
        self.corr_lookup = MultiLookup(corr_pyramid)

    def __call__(self, disp: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """disp, coords: [B,H,W] → geo features [B,H,W,num_levels·(C+1)·(2r+1)]."""
        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)  # [2r+1]
        scales = [2.0 ** i for i in range(self.num_levels)]
        geo_feats = self.geo_lookup(
            [disp[..., None] / s + dx for s in scales])
        corr_feats = self.corr_lookup(
            [(coords - disp)[..., None] / s + dx for s in scales])
        out = []
        for g, c in zip(geo_feats, corr_feats):
            out.extend([g, c])
        return jnp.concatenate(out, axis=-1)
