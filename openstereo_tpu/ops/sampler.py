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


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` [B,H,W,C] at `coords` [B,...,2] = (x, y) pixel coordinates.

    Matches grid_sample(align_corners=True, padding_mode='zeros') driven with
    unnormalised pixel coords as the reference's `bilinear_sampler` does:
    out-of-frame samples contribute zero.
    """
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0f, y - y0f
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)

    out = jnp.zeros((*x.shape, c), dtype=img.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = jnp.where(dx, wx, 1.0 - wx) * jnp.where(dy, wy, 1.0 - wy)
            wgt = jnp.where(valid, wgt, 0.0).astype(img.dtype)
            tap = _gather_hw(img, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
            out = out + tap * wgt[..., None]
    return out


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
