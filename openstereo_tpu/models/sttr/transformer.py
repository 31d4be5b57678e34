"""STTR epipolar transformer: alternating self/cross attention with relative
sine positional encoding (reference: stereo/modeling/models/sttr/utilities/
{transformer.py,attention.py,pos_encoder.py}).

TPU-native design notes:
- sequences live as [B', W, C] with B' = N·H (every epipolar line is a batch
  element) — attention over W is a batched MXU einsum;
- relative position attention uses the einsum decomposition of the reference
  (attention.py:99-108): attn = q·kᵀ + q·k_rᵀ + k·q_rᵀ, where q_r/k_r are
  projections of the [W, W, C] relative-encoding matrix (gathered once from
  the 2W-1 sine table);
- layers are wrapped in `nn.remat` mirroring the reference's gradient
  checkpointing (transformer.py:60-79).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import head_dtype


def sine_pos_encoding(w: int, channels: int, scale: float = 1.0) -> jnp.ndarray:
    """Relative 1D sine table [2W-1, C] (reference pos_encoder.py:29-60).

    Distances run from (w-1)·scale down to (1-w)·scale; sin/cos interleaved.
    """
    # build in f64 (numpy default) and cast at the end: the table is
    # computed once at trace time, and f32 rounding of the large position
    # arguments would cost ~1e-5 absolute error in the sines
    x_embed = np.linspace((w - 1) * scale, -(w - 1) * scale, 2 * w - 1)
    dim_t = np.arange(channels, dtype=np.float64)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / channels)
    pos = x_embed[:, None] / dim_t[None, :]
    out = np.empty_like(pos)
    out[:, 0::2] = np.sin(pos[:, 0::2])
    out[:, 1::2] = np.cos(pos[:, 1::2])
    # jnp.asarray keeps f64 only under enable_x64 (the parity oracles);
    # in normal f32 mode it downcasts to f32 — callers .astype(dtype) anyway
    return jnp.asarray(out)


def rel_pos_matrix(pos_table: jnp.ndarray, w: int) -> jnp.ndarray:
    """Gather the [W, W, C] relative-position matrix: entry (i, j) encodes
    distance i-j (reference transformer.py:100-104 index arithmetic)."""
    i = np.arange(w)[:, None]
    j = np.arange(w)[None, :]
    idx = (w - 1 - i) + j  # row w-1..0 + col 0..w-1
    return pos_table[idx.reshape(-1)].reshape(w, w, -1)


class MultiheadAttentionRelative(nn.Module):
    """Multi-head attention with relative-position terms
    (reference attention.py:10-139). Inputs [B, W, C].

    Two equivalent compute paths:
    - use_pallas=True (TPU): the fused Pallas kernel
      (ops/pallas/rel_attention.py) — MXU contractions + hardware-shear
      relative alignment + softmax + p·v in one pass over each epipolar
      line. Differentiable via the analytic custom VJP
      (rel_attention_trainable), so it serves training too.
    - otherwise: the reference einsum decomposition against the gathered
      [W, W, C] relative matrix (differentiable, any backend).
    """

    embed_dim: int
    num_heads: int
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, pos_table=None, attn_mask=None,
                 masked_last: bool = False, need_raw: bool = True):
        e, nh = self.embed_dim, self.num_heads
        hd = e // nh
        q_proj = nn.Dense(e, dtype=self.dtype, name="q_proj")
        k_proj = nn.Dense(e, dtype=self.dtype, name="k_proj")
        v_proj = nn.Dense(e, dtype=self.dtype, name="v_proj")
        q = q_proj(query)
        k = k_proj(key)
        v = v_proj(value)

        b, w, _ = q.shape
        wk = k.shape[1]
        scaling = hd ** -0.5

        # w % 16: the fused kernel's in-VMEM shear assumes sublane-aligned
        # rows for bf16 operands; W' = 312 (1248-wide crops) faulted the TPU
        # worker, W' ∈ {160, 240, 320} are validated. Odd widths fall back
        # to the einsum path below (identical math, gradient-parity tested).
        if self.use_pallas and pos_table is not None and w == wk and w % 16 == 0:
            # The Pallas kernel only implements the masked_last causal mask
            # (an explicit attn_mask would be silently ignored), and masks
            # with a finite -1e30 instead of -inf — so masked raw_attn
            # entries are large-negative-finite rather than -inf. Fine for
            # the optimal_transport consumer; assert so future callers with
            # a custom mask fall through loudly instead of silently.
            assert attn_mask is None, (
                "Pallas rel_attention does not support an explicit "
                "attn_mask; pass use_pallas=False or use masked_last")
            from ...ops.pallas.rel_attention import rel_attention_trainable

            ke = k_proj(pos_table)
            qe = q_proj(pos_table) * scaling
            out, raw_attn = rel_attention_trainable(q * scaling, k, v, ke,
                                                    qe, nh, masked_last,
                                                    need_raw)
            out = nn.Dense(e, dtype=self.dtype, name="out_proj")(out)
            return out, raw_attn

        q = (q * scaling).reshape(b, w, nh, hd)
        k = k.reshape(b, wk, nh, hd)
        v = v.reshape(b, wk, nh, hd)

        attn = jnp.einsum("bwhc,bvhc->bhwv", q, k)
        if pos_table is not None:
            pos_matrix = rel_pos_matrix(pos_table, w)
            # q_r/k_r share the q/k projections applied to the pos matrix
            # (reference attention.py:66-78)
            q_r = (q_proj(pos_matrix) * scaling).reshape(w, wk, nh, hd)
            k_r = k_proj(pos_matrix).reshape(w, wk, nh, hd)
            attn = attn + jnp.einsum("bwhc,wvhc->bhwv", q, k_r)
            attn = attn + jnp.einsum("bvhc,wvhc->bhwv", k, q_r)

        if masked_last:
            attn_mask = jnp.triu(jnp.full((w, w), -jnp.inf, jnp.float32), k=1)
        if attn_mask is not None:
            attn = attn + attn_mask[None, None]

        raw_attn = jnp.sum(attn, axis=1)  # [B,W,Wk] summed over heads
        p = nn.softmax(attn.astype(head_dtype(self.dtype)), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwv,bvhc->bwhc", p, v).reshape(b, w, e)
        out = nn.Dense(e, dtype=self.dtype, name="out_proj")(out)
        return out, raw_attn


class SelfAttnLayer(nn.Module):
    hidden_dim: int
    nhead: int
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, pos_table):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(feat)
        y, _ = MultiheadAttentionRelative(self.hidden_dim, self.nhead,
                                          use_pallas=self.use_pallas,
                                          dtype=self.dtype, name="self_attn")(
            y, y, y, pos_table=pos_table, need_raw=False)
        return feat + y


class CrossAttnLayer(nn.Module):
    """Right attends left, then left attends (updated) right
    (reference transformer.py:152-216)."""

    hidden_dim: int
    nhead: int
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_left, feat_right, pos_table, pos_table_flipped,
                 last_layer: bool):
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        attn = MultiheadAttentionRelative(self.hidden_dim, self.nhead,
                                          use_pallas=self.use_pallas,
                                          dtype=self.dtype, name="cross_attn")
        left2 = norm1(feat_left)
        right2 = norm1(feat_right)

        upd_right, _ = attn(right2, left2, left2,
                            pos_table=pos_table_flipped, need_raw=False)
        feat_right = feat_right + upd_right

        right2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(feat_right)
        upd_left, raw_attn = attn(left2, right2, right2, pos_table=pos_table,
                                  masked_last=last_layer,
                                  need_raw=last_layer)
        feat_left = feat_left + upd_left
        return feat_left, feat_right, raw_attn


class Transformer(nn.Module):
    """Alternating self/cross stack → attention volume [N,H,W,W]
    (reference transformer.py:17-113)."""

    hidden_dim: int = 128
    nhead: int = 8
    num_attn_layers: int = 6
    remat: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_left, feat_right, pos_scale: float = 1.0):
        """feat_left/right: [N, H, W, C] (already downsampled) → [N,H,W,W]."""
        n, h, w, c = feat_left.shape
        fl = feat_left.reshape(n * h, w, c)
        fr = feat_right.reshape(n * h, w, c)

        pos_table = sine_pos_encoding(w, c, pos_scale).astype(self.dtype)
        pos_table_flipped = pos_table[::-1]

        SelfL = nn.remat(SelfAttnLayer) if self.remat else SelfAttnLayer
        CrossL = nn.remat(CrossAttnLayer, static_argnums=(5,)) if self.remat \
            else CrossAttnLayer

        raw_attn = None
        for i in range(self.num_attn_layers):
            # self-attention runs on left and right concatenated along batch
            feat = jnp.concatenate([fl, fr], axis=0)
            feat = SelfL(self.hidden_dim, self.nhead, use_pallas=self.use_pallas,
                         dtype=self.dtype, name=f"self_{i}")(feat, pos_table)
            fl, fr = feat[: n * h], feat[n * h :]
            fl, fr, raw_attn = CrossL(self.hidden_dim, self.nhead,
                                      use_pallas=self.use_pallas, dtype=self.dtype,
                                      name=f"cross_{i}")(
                fl, fr, pos_table, pos_table_flipped,
                i == self.num_attn_layers - 1)

        return raw_attn.reshape(n, h, w, w)
