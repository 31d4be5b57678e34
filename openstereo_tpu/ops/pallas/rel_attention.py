"""Fused relative-position epipolar attention (STTR) as a Pallas TPU kernel.

The STTR attention (reference: stereo/modeling/models/sttr/utilities/
attention.py:99-108) is attn = q·kᵀ + q·k_rᵀ + k·q_rᵀ where k_r/q_r are
projections of the relative sine encoding: k_r[i, j] = ke[W-1-i+j] with
ke = k_proj(sine_table[2W-1]). Under XLA the Toeplitz terms force either
(w,v)-batched einsums against a materialised [W, W, C] matrix (~600 MB of
layout transposes per layer) or a relative-shift realignment that XLA
lowers as an unaligned relayout (7–13 ms per call on its own).

This kernel fuses the whole thing per epipolar line: the three MXU
contractions, the relative shift (a single hardware shear — `pltpu.roll`
with per-row stride — entirely in VMEM), the optional causal mask, the
head-summed raw-attention output, softmax, and the p·v contraction.
Measured at 544×960 (W'=320, 182 lines, 8 heads, bf16): 6.0 ms per
attention call vs ~12.3 ms effective under XLA; whole-model STTR
231 ms → 169 ms in the same session (see docs/BENCHMARKS.md).

Training runs through `rel_attention_trainable` — the same fused forward
with an analytic custom VJP (below); the einsum formulation remains the
reference/other-backend path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _skew_vmem(x: jnp.ndarray, w: int, rpad: int) -> jnp.ndarray:
    """[W, Rpad] → [W, W], out[i, j] = x[i, w-1-i+j].

    One hardware shear: right-rotate row i by (rpad - (w-1) + i) mod rpad
    (`stride=1` along the row axis). No wrap contamination: source indices
    w-1-i+j ∈ [0, 2w-2] ⊂ [0, rpad).
    """
    x = pltpu.roll(x, shift=rpad - (w - 1), axis=1, stride=1, stride_axis=0)
    return x[:, :w]


def _rel_attn_kernel(q_ref, k_ref, v_ref, ke_ref, qe_ref, out_ref, raw_ref,
                     *, w: int, nheads: int, rpad: int, masked: bool):
    hd = q_ref.shape[-1] // nheads
    q = q_ref[0]            # [W, E] (pre-scaled)
    k = k_ref[0]
    v = v_ref[0]
    ke_t = ke_ref[:]        # [Rpad, E]
    qe_t = qe_ref[:]        # [Rpad, E] (pre-scaled, row-reversed)

    if masked:
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        neg = jnp.float32(-1e30)

    raw = jnp.zeros((w, w), jnp.float32) if raw_ref is not None else None
    for h in range(nheads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        attn = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
        qr = jnp.dot(qh, ke_t[:, sl].T, preferred_element_type=jnp.float32)
        attn += _skew_vmem(qr, w, rpad)
        kr = jnp.dot(kh, qe_t[:, sl].T, preferred_element_type=jnp.float32)
        attn += _skew_vmem(kr, w, rpad).T
        if masked:
            attn = jnp.where(j_idx > i_idx, neg, attn)
        if raw is not None:
            raw += attn
        m = jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp(attn - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[0, :, sl] = jnp.dot(
            p.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    if raw is not None:
        raw_ref[0] = raw


def rel_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  ke: jnp.ndarray, qe: jnp.ndarray, nheads: int,
                  masked: bool = False, need_raw: bool = True,
                  interpret: bool = False):
    """Fused relative attention over epipolar lines.

    q, k, v: [B, W, E] (q and qe already scaled by hd^-0.5);
    ke, qe: [2W-1, E] projected sine tables.
    Returns (out [B, W, E] in v.dtype, raw_attn [B, W, W] f32 — the
    head-summed pre-softmax attention incl. mask, as the reference —
    or None when need_raw=False, which skips that HBM write entirely).
    """
    b, w, e = q.shape
    rpad = _round_up(2 * w - 1, 128)
    ke_p = jnp.zeros((rpad, e), ke.dtype).at[: ke.shape[0]].set(ke)
    # the k·q_rᵀ term realigns with the NEGATED relative distance
    # (q_r[i,j] = qe[w-1-i+j] and the skew runs over the k index j), so the
    # kernel contracts k against the row-reversed table:
    #   skew(k·qe_revᵀ)ᵀ[i,j] = k[j]·qe_rev[w-1-j+i] = k[j]·qe[w-1-i+j]
    qe_p = jnp.zeros((rpad, e), qe.dtype).at[: qe.shape[0]].set(qe[::-1])

    in_specs = [
        pl.BlockSpec((1, w, e), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, w, e), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, w, e), lambda i: (i, 0, 0)),
        pl.BlockSpec((rpad, e), lambda i: (0, 0)),
        pl.BlockSpec((rpad, e), lambda i: (0, 0)),
    ]
    if need_raw:
        kernel = functools.partial(_rel_attn_kernel, w=w, nheads=nheads,
                                   rpad=rpad, masked=masked)
        out, raw = pl.pallas_call(
            kernel,
            grid=(b,),
            interpret=interpret,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, w, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, w, w), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, w, e), v.dtype),
                jax.ShapeDtypeStruct((b, w, w), jnp.float32),
            ],
        )(q, k, v, ke_p, qe_p)
        return out, raw

    def kernel_noraw(q_ref, k_ref, v_ref, ke_ref, qe_ref, out_ref):
        _rel_attn_kernel(q_ref, k_ref, v_ref, ke_ref, qe_ref, out_ref, None,
                         w=w, nheads=nheads, rpad=rpad, masked=masked)

    out = pl.pallas_call(
        kernel_noraw,
        grid=(b,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, w, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, w, e), v.dtype),
    )(q, k, v, ke_p, qe_p)
    return out, None


# ---------------------------------------------------------------------------
# Trainable wrapper: fused Pallas forward + analytic jnp backward
# ---------------------------------------------------------------------------
#
# The backward recomputes attention per head (nothing is stashed beyond the
# five inputs — remat-friendly) and realigns the Toeplitz cotangents with
# gathers instead of materialising the [W, W, E] relative matrix:
#   forward adds S(q·keᵀ) and S(k·qe_revᵀ)ᵀ where S(X)[i,j] = X[i, w-1-i+j];
#   the cotangent of S is the inverse shear, dX[i,r] = dA[i, r-(w-1)+i].
# Per head that is four [W,W]x[W,hd] MXU matmuls plus two [W,2W-1] gathers —
# the same arithmetic the einsum path's backward does, but fed by the fused
# forward. Gradient parity vs the einsum path is asserted in
# tests/test_rel_attention.py.

def _unskew(da: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, W, W] cotangent of the shear → [B, W, 2W-1]: dX[i, r] =
    da[i, r-(w-1)+i] (zero where the source column is out of range)."""
    r = jnp.arange(2 * w - 1)[None, :]
    i = jnp.arange(w)[:, None]
    j = r - (w - 1) + i
    valid = (j >= 0) & (j < w)
    jc = jnp.clip(j, 0, w - 1)
    g = jnp.take_along_axis(
        da, jnp.broadcast_to(jc[None], (da.shape[0], w, 2 * w - 1)), axis=-1)
    return g * valid[None].astype(da.dtype)


def _rel_attn_fwd(q, k, v, ke, qe, nheads, masked, need_raw, interpret):
    out, raw = rel_attention(q, k, v, ke, qe, nheads, masked=masked,
                             need_raw=need_raw, interpret=interpret)
    return (out, raw), (q, k, v, ke, qe)


def _rel_attn_bwd(nheads, masked, need_raw, interpret, res, cts):
    q, k, v, ke, qe = res
    d_out, d_raw = cts
    b, w, e = q.shape
    hd = e // nheads
    f32 = jnp.float32

    i_idx = jnp.arange(w)[:, None]
    j_idx = jnp.arange(w)[None, :]
    mask_cond = (j_idx > i_idx) if masked else None
    idx = (w - 1 - i_idx + j_idx)            # [W, W] into the 2W-1 tables

    dq = jnp.zeros((b, w, e), f32)
    dk = jnp.zeros((b, w, e), f32)
    dv = jnp.zeros((b, w, e), f32)
    dke = jnp.zeros((2 * w - 1, e), f32)
    dqe = jnp.zeros((2 * w - 1, e), f32)

    for h in range(nheads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[..., sl].astype(f32)
        kh = k[..., sl].astype(f32)
        vh = v[..., sl].astype(f32)
        keh = ke[: 2 * w - 1, sl].astype(f32)
        qeh = qe[: 2 * w - 1, sl].astype(f32)
        doh = d_out[..., sl].astype(f32)

        # recompute this head's attention
        attn = jnp.einsum("bwc,bvc->bwv", qh, kh)
        attn += jnp.einsum("bwc,wvc->bwv", qh, keh[idx])
        attn += jnp.einsum("bvc,wvc->bwv", kh, qeh[idx])
        if masked:
            attn = jnp.where(mask_cond[None], -1e30, attn)
        p = jax.nn.softmax(attn, axis=-1)

        dv = dv.at[..., sl].add(jnp.einsum("bwv,bwc->bvc", p, doh))
        dp = jnp.einsum("bwc,bvc->bwv", doh, vh)
        da = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if d_raw is not None and need_raw:
            dr = d_raw.astype(f32)
            if masked:
                dr = jnp.where(mask_cond[None], 0.0, dr)
            da = da + dr

        dq = dq.at[..., sl].add(jnp.einsum("bwv,bvc->bwc", da, kh))
        dk = dk.at[..., sl].add(jnp.einsum("bwv,bwc->bvc", da, qh))
        # Toeplitz terms
        dXq = _unskew(da, w)                              # [B, W, 2W-1]
        dq = dq.at[..., sl].add(jnp.einsum("bwr,rc->bwc", dXq, keh))
        dke = dke.at[:, sl].add(jnp.einsum("bwr,bwc->rc", dXq, qh))
        dXk = _unskew(jnp.swapaxes(da, 1, 2), w)          # cotangent of Sᵀ
        dk = dk.at[..., sl].add(jnp.einsum("bwr,rc->bwc", dXk, qeh[::-1]))
        dqe = dqe.at[:, sl].add(jnp.einsum("bwr,bwc->rc", dXk, kh)[::-1])

    pad = ke.shape[0] - (2 * w - 1)
    if pad > 0:
        dke = jnp.concatenate([dke, jnp.zeros((pad, e), f32)], 0)
        dqe = jnp.concatenate([dqe, jnp.zeros((pad, e), f32)], 0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dke.astype(ke.dtype), dqe.astype(qe.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def rel_attention_trainable(q, k, v, ke, qe, nheads, masked=False,
                            need_raw=True, interpret=False):
    """`rel_attention` with an analytic VJP — safe under jax.grad/remat.
    Same contract; ke/qe may be unpadded [2W-1, E] tables."""
    return rel_attention(q, k, v, ke, qe, nheads, masked=masked,
                         need_raw=need_raw, interpret=interpret)


rel_attention_trainable.defvjp(_rel_attn_fwd, _rel_attn_bwd)


def rel_attention_reference(q, k, v, ke, qe, nheads, masked=False):
    """jnp reference (same contract) for testing: materialises the
    [W, W, E] relative matrix like the XLA model path."""
    b, w, e = q.shape
    hd = e // nheads
    i = jnp.arange(w)[:, None]
    j = jnp.arange(w)[None, :]
    idx = (w - 1 - i + j).reshape(-1)
    k_r = ke[idx].reshape(w, w, nheads, hd)
    q_r = qe[idx].reshape(w, w, nheads, hd)
    qh = q.reshape(b, w, nheads, hd)
    kh = k.reshape(b, w, nheads, hd)
    vh = v.reshape(b, w, nheads, hd)
    attn = jnp.einsum("bwhc,bvhc->bhwv", qh, kh).astype(jnp.float32)
    attn += jnp.einsum("bwhc,wvhc->bhwv", qh, k_r)
    attn += jnp.einsum("bvhc,wvhc->bhwv", kh, q_r)
    if masked:
        attn = jnp.where((j > i)[None, None], -1e30, attn)
    raw = jnp.sum(attn, axis=1)
    p = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhwv,bvhc->bwhc", p, vh).reshape(b, w, e)
    return out, raw
