"""Pallas TPU kernel: single-pass correlation volume.

The correlation volume (reference: stereo/modeling/cost_volume/cost_volume.py:32-41)
is the canonical stereo hot op — SURVEY.md §7 designates it a Pallas target.
This kernel computes, for each W-tile, all D disparity planes from one VMEM
residency of the left tile and the two right tiles that cover its shifted
window:

    out[w, d] = (1/C) · Σ_c  L[w, c] · R[w - d, c]

- grid (B·H, W/TW); blocks keep C in the lane dimension;
- the shifted right rows come from static sublane slices of the
  concatenated [2·TW, C] right window — no gathers;
- the first W-tile masks the out-of-frame half of its window to zero
  (the reference's zero-initialised volume semantics).

Note on expectations: XLA already compiles the jnp reference
(ops/cost_volume.py) to ~60% of single-pass HBM roofline at production
shapes, so this kernel is at parity rather than a large win; it exists as
the hand-tuned fallback for shapes/fusion contexts where XLA regresses, and
is validated against the jnp path in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl



def _corr_kernel(l_ref, r_prev_ref, r_cur_ref, o_ref, *, max_disp: int,
                 tile_w: int, channels: int, num_groups: int = 1):
    first_tile = pl.program_id(1) == 0
    l = l_ref[0]                                   # [TW, C]
    r_prev = jnp.where(first_tile, 0.0, r_prev_ref[0])
    rcat = jnp.concatenate([r_prev, r_cur_ref[0]], axis=0)  # [2TW, C]

    cg = channels // num_groups
    inv = 1.0 / cg
    planes = []
    for d in range(max_disp):                      # static unroll, static slices
        r_shift = rcat[tile_w - d : 2 * tile_w - d]
        prod = l * r_shift                         # [TW, C]
        if num_groups == 1:
            planes.append(jnp.sum(prod, axis=1, keepdims=True) * inv)  # [TW,1]
        else:
            g = prod.reshape(tile_w, num_groups, cg)
            planes.append(jnp.sum(g, axis=2) * inv)                    # [TW,G]
    o_ref[0] = jnp.concatenate(planes, axis=1)     # [TW, D·G]


@functools.partial(jax.jit, static_argnames=("max_disp", "tile_w", "num_groups",
                                             "interpret"))
def correlation_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                              max_disp: int, tile_w: int = 128,
                              num_groups: int = 1,
                              interpret: bool = False) -> jnp.ndarray:
    """[B,H,W,C] ×2 → [B,H,W,D] (num_groups=1) or [B,D,H,W,G]."""
    b, h, w, c = left.shape
    assert max_disp <= tile_w, (max_disp, tile_w)
    assert c % num_groups == 0, (c, num_groups)
    w_pad = (-w) % tile_w
    if w_pad:
        pad = [(0, 0), (0, 0), (0, w_pad), (0, 0)]
        left = jnp.pad(left, pad)
        right = jnp.pad(right, pad)
    wp = w + w_pad

    l2 = left.reshape(b * h, wp, c)
    r2 = right.reshape(b * h, wp, c)
    n_wt = wp // tile_w

    grid = (b * h, n_wt)
    kernel = functools.partial(_corr_kernel, max_disp=max_disp, tile_w=tile_w,
                               channels=c, num_groups=num_groups)
    out_c = max_disp * num_groups
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_w, c), lambda i, j: (i, j, 0)),
            # previous W tile of the right view (clamped at the left edge;
            # the kernel masks it to zero on the first tile)
            pl.BlockSpec((1, tile_w, c),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 0)),
            pl.BlockSpec((1, tile_w, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_w, out_c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, wp, out_c), left.dtype),
        interpret=interpret,
    )(l2, r2, r2)
    out = out.reshape(b, h, wp, out_c)[:, :, :w]
    if num_groups == 1:
        return out  # [B, H, W, D]
    # [B, H, W, D·G] (d-major) → [B, D, H, W, G] (NDHWC volume layout)
    out = out.reshape(b, h, w, max_disp, num_groups)
    return jnp.transpose(out, (0, 3, 1, 2, 4))


def build_gwc_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                            max_disp: int, num_groups: int,
                            tile_w: int = 128,
                            interpret: bool = False) -> jnp.ndarray:
    """Group-wise correlation volume [B,H,W,C] ×2 → [B,D,H,W,G]; same
    contract as ops.build_gwc_volume (reference cost_volume.py:69-78)."""
    return correlation_volume_pallas(left, right, max_disp, tile_w=tile_w,
                                     num_groups=num_groups, interpret=interpret)
