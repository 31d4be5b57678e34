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
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(l_ref, r_prev_ref, r_cur_ref, o_ref, *, max_disp: int,
                 tile_w: int, channels: int):
    first_tile = pl.program_id(1) == 0
    l = l_ref[0]                                   # [TW, C]
    r_prev = jnp.where(first_tile, 0.0, r_prev_ref[0])
    rcat = jnp.concatenate([r_prev, r_cur_ref[0]], axis=0)  # [2TW, C]

    inv_c = 1.0 / channels
    cols = []
    for d in range(max_disp):                      # static unroll, static slices
        r_shift = rcat[tile_w - d : 2 * tile_w - d]
        cols.append(jnp.sum(l * r_shift, axis=1) * inv_c)  # [TW]
    o_ref[0] = jnp.stack(cols, axis=1)             # [TW, D]


@functools.partial(jax.jit, static_argnames=("max_disp", "tile_w", "interpret"))
def correlation_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                              max_disp: int, tile_w: int = 128,
                              interpret: bool = False) -> jnp.ndarray:
    """[B,H,W,C] ×2 → [B,H,W,D]; same contract as ops.correlation_volume."""
    b, h, w, c = left.shape
    assert max_disp <= tile_w, (max_disp, tile_w)
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
                               channels=c)
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
        out_specs=pl.BlockSpec((1, tile_w, max_disp), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, wp, max_disp), left.dtype),
        interpret=interpret,
    )(l2, r2, r2)
    return out.reshape(b, h, wp, max_disp)[:, :, :w]
