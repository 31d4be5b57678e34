"""Bilinear sampling (gather) ops.

TPU-native equivalents of `F.grid_sample`-based helpers:
- `bilinear_sampler` (reference: stereo/modeling/disp_refinement/gru_blocks.py:152-167,
  also models/igev/geometry.py) — sample features at fractional pixel
  coordinates, zeros outside the frame.
- `disp_warp` (reference: stereo/modeling/disp_refinement/disp_refinement.py:113-136)
  — warp the right view to the left using a disparity map.

Implemented as four clipped gathers + lerp. Gathers are the memory-bound core
of the iterative (IGEV/RAFT-style) lookup loop; layout keeps C in the lane
dimension so each gather moves full 128-lane vectors.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,C], integer yi/xi [B,...] → [B,...,C] (indices must be in-range)."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = (yi * w + xi).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(*yi.shape, c)


def _pack_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] → [B,H,W,4C]: channels of (y,x),(y,x+1),(y+1,x),(y+1,x+1).

    Zero padding past the bottom/right edge, so a packed row at (y0,x0)
    carries the full 2×2 bilinear patch with out-of-frame taps already 0.
    """
    x01 = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    x10 = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    x11 = jnp.pad(x[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([x, x01, x10, x11], axis=-1)


def _sample_packed(packed: jnp.ndarray, h: int, w: int,
                   py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via ONE gather of pre-packed 2×2 patch rows.

    packed: [B,H,W,4C] from `_pack_2x2`; py/px: [B,Q] pixel coords.
    → [B,Q,C], grid_sample(align_corners=True, zeros) semantics.

    The naive 4-gather form issues K·dg·4 narrow gathers per deform conv
    (AANet profile: 62.7 of 97.5 ms in `take_along_axis` rows of C/dg
    channels). Packing widens each gathered row 4× (full 128-lane rows at
    AANet's C) and lets ALL taps of a deformable group share one gather.
    """
    b = packed.shape[0]
    c4 = packed.shape[-1]
    c = c4 // 4
    y0f, x0f = jnp.floor(py), jnp.floor(px)
    wy, wx = py - y0f, px - x0f
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    flat = packed.reshape(b, h * w, c4)
    rows = jnp.take_along_axis(flat, (y0 * w + x0)[..., None], axis=1)
    rows = rows.reshape(b, -1, 4, c)
    # Patch-slot weights with in-frame validity. The patch base is CLAMPED
    # to [0,h-1]x[0,w-1]; the only case where a VALID tap's slot moves is
    # base == -1 (sample in [-1,0)): the valid tap (index 0 of the frame)
    # then sits at patch slot 0, so its weight (wy/wx) goes there. All
    # other out-of-frame taps get weight 0 (grid_sample zeros semantics);
    # the bottom/right packing rows are zero-padded as well.
    a0 = jnp.where(y0f == -1, wy,
                   jnp.where((y0f >= 0) & (y0f <= h - 1), 1 - wy, 0.0))
    a1 = jnp.where((y0f >= 0) & (y0f <= h - 2), wy, 0.0)
    b0 = jnp.where(x0f == -1, wx,
                   jnp.where((x0f >= 0) & (x0f <= w - 1), 1 - wx, 0.0))
    b1 = jnp.where((x0f >= 0) & (x0f <= w - 2), wx, 0.0)
    wgt = jnp.stack([a0 * b0, a0 * b1, a1 * b0, a1 * b1],
                    axis=-1).astype(packed.dtype)
    return jnp.einsum("bqtc,bqt->bqc", rows, wgt)


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` [B,H,W,C] at `coords` [B,...,2] = (x, y) pixel coordinates.

    Matches grid_sample(align_corners=True, padding_mode='zeros') driven with
    unnormalised pixel coords as the reference's `bilinear_sampler` does:
    out-of-frame samples contribute zero.

    Implemented on the packed-patch single-gather path (`_sample_packed`):
    the 4-tap `take_along_axis` form issued 4 narrow-row gathers per call
    and dominated AANet end-to-end (62.7 of 97.5 ms); one gather of
    channel-packed 2x2 patches moves the same bytes in full-width rows.
    """
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    q = x.reshape(b, -1)
    out = _sample_packed(_pack_2x2(img), h, w, y.reshape(b, -1), q)
    return out.reshape(*x.shape, c)


def bilinear_sampler_mxu(img: jnp.ndarray, coords: jnp.ndarray,
                         chunk: int = 4096) -> jnp.ndarray:
    """`bilinear_sampler` re-expressed as two MXU contractions.

    Bilinear weights are rank-1 separable — w(y,x) = wy(y)·wx(x), and each
    tap's in-frame validity factors the same way — so sampling [B,Q] points
    from [B,H,W,C] is a row-mix hat-matrix [B,Q,H] against V=[B,H,W·C]
    followed by a per-query column mix [B,Q,W]. On TPU this replaces the
    dynamic gathers (whose row width C may sit far below the 128-lane
    register) with dense matmuls — the same trick as the IGEV hat-matrix
    lookups (docs/BENCHMARKS.md). Chunked over Q to bound the [B,chunk,W·C]
    intermediate. Semantics identical to `bilinear_sampler`
    (align_corners=True pixel coords, zero outside the frame).

    Worth it when Q·H FLOPs beat pathological gather latency — profitable
    for MSDA's 8-wide heads (ops/msda.py), not for wide-C IGEV lookups.
    """
    from jax import lax, nn as jnn

    b, h, w, c = img.shape
    q = coords.shape[1]
    # small-Q callers shouldn't pay a full default chunk of padding: round q
    # up to the 128-row MXU tile instead and cap the chunk there
    chunk = min(chunk, -(-q // 128) * 128)
    n_chunks = -(-q // chunk)
    qp = n_chunks * chunk
    # pad queries with far out-of-frame coords → all-zero hat rows
    coords_p = jnp.pad(coords.astype(jnp.float32),
                       ((0, 0), (0, qp - q), (0, 0)), constant_values=-9.0)

    def hat(u, n):
        """[B,chunk] fractional coords → [B,chunk,n] two-tap hat matrix."""
        u0f = jnp.floor(u)
        fu = u - u0f
        u0 = u0f.astype(jnp.int32)
        w0 = jnp.where((u0 >= 0) & (u0 < n), 1.0 - fu, 0.0)
        w1 = jnp.where((u0 + 1 >= 0) & (u0 + 1 < n), fu, 0.0)
        m = (jnn.one_hot(jnp.clip(u0, 0, n - 1), n, dtype=img.dtype)
             * w0[..., None].astype(img.dtype))
        return m + (jnn.one_hot(jnp.clip(u0 + 1, 0, n - 1), n, dtype=img.dtype)
                    * w1[..., None].astype(img.dtype))

    v_flat = img.reshape(b, h, w * c)
    xs = jnp.moveaxis(coords_p[..., 0].reshape(b, n_chunks, chunk), 1, 0)
    ys = jnp.moveaxis(coords_p[..., 1].reshape(b, n_chunks, chunk), 1, 0)

    def per_chunk(xy):
        xq, yq = xy
        rows = hat(yq, h)                                    # [B,chunk,H]
        cols = hat(xq, w)                                    # [B,chunk,W]
        t = jnp.einsum("bqh,bhE->bqE", rows, v_flat,
                       preferred_element_type=img.dtype)
        t = t.reshape(b, chunk, w, c)
        return jnp.einsum("bqw,bqwc->bqc", cols, t)

    if n_chunks == 1:
        out = per_chunk((xs[0], ys[0]))[None]
    else:
        out = lax.map(per_chunk, (xs, ys))                   # [n,B,chunk,C]
    return jnp.moveaxis(out, 0, 1).reshape(b, qp, c)[:, :q]


def sample_along_w(y: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linear-interp sample of `y` [B,H,W,C] at x-positions `pos` [B,D,H,W].

    Returns [B,D,H,W,C]; zero outside the frame (grid_sample align_corners=True
    + zeros semantics restricted to the W axis — the warped-cost-volume core of
    CasNet/CFNet, reference casnet/cas_psm.py:282-318).
    """
    b, h, w, c = y.shape
    x0 = jnp.floor(pos)
    frac = (pos - x0).astype(y.dtype)
    x0 = x0.astype(jnp.int32)
    y_b = y[:, None]  # [B,1,H,W,C]
    out = None
    for tap in (0, 1):
        xi = x0 + tap
        valid = (xi >= 0) & (xi < w)
        wgt = jnp.where(tap == 0, 1.0 - frac, frac) * valid.astype(y.dtype)
        idx = jnp.clip(xi, 0, w - 1)[..., None]  # [B,D,H,W,1]
        g = jnp.take_along_axis(y_b, idx, axis=3)
        contrib = g * wgt[..., None]
        out = contrib if out is None else out + contrib
    return out


def disp_warp(right: jnp.ndarray, disp: jnp.ndarray, padding: str = "zeros",
              torch_unaligned: bool = False):
    """Warp right view to the left camera: sample right at (x - disp, y).

    right: [B,H,W,C]; disp: [B,H,W] (positive disparities).
    padding: 'zeros' (out-of-frame → 0, FADNet convention) or 'border'
    (clamp to the frame edge — MonSter's warp, reference
    monster/warp.py:53-80 grid_sample padding_mode='border').
    torch_unaligned: reproduce the reference warp's coordinate quirk —
    it normalises the grid with 2x/(W-1)-1 but samples through
    grid_sample's default align_corners=False, so the effective source is
    (x-d)·W/(W-1) - 0.5 and y·H/(H-1) - 0.5 (a sub-pixel shear growing
    toward the right/bottom edges). Required for numerical parity with
    MonSter (warp.py:5-15) and AANet-style warps; off = clean pixel
    coordinates.
    Returns (warped [B,H,W,C], valid_mask [B,H,W,1]).
    """
    b, h, w, _ = right.shape
    xs = jnp.arange(w, dtype=disp.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=disp.dtype)[None, :, None]
    x_src = jnp.broadcast_to(xs, (b, h, w)) - disp
    y_src = jnp.broadcast_to(ys + jnp.zeros_like(disp), (b, h, w))
    if torch_unaligned:
        x_src = x_src * (w / max(w - 1, 1)) - 0.5
        y_src = y_src * (h / max(h - 1, 1)) - 0.5
    valid = ((x_src >= 0) & (x_src <= w - 1)).astype(right.dtype)[..., None]
    if padding == "border":
        x_src = jnp.clip(x_src, 0.0, w - 1)
        y_src = jnp.clip(y_src, 0.0, h - 1)
    coords = jnp.stack([x_src, y_src], axis=-1)
    warped = bilinear_sampler(right, coords)
    if padding == "zeros":
        warped = warped * valid
    return warped, valid
