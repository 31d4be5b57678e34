"""Neural MRF message-passing layers (NMP) — flax, NHWC token grids.

TPU-native re-design of reference stereo/modeling/models/nmrf/NMP.py:
- fourier coordinate embedding (NMP.py:35-51),
- BasicAttention — per-pixel attention across the N disparity candidates
  (NMP.py:70-139),
- SwinNMP — shifted-window attention over (pixel, candidate) tokens with a
  q/k/v relative-position-encoding table (NMP.py:142-398),
- CSWinNMP — cross-shaped-window (stripe) attention used by the proposal
  propagation stage (NMP.py:401-600),
- Propagation / Inference / Refinement stacks (NMP.py:603-900).

Design notes:
- token tensors are kept [B, H, W, N, C] (N = disparity candidates per
  pixel); the reference's `(b h w) n c` flattening is never materialised;
- all attention masks and relative-position index maps are numpy computed
  at trace time (static shapes) — the device only sees the fused adds;
- the q/k/v positional terms of SwinNMP exploit that the rpe table is
  candidate-independent: the `(i·N) x (j·N)` expanded einsums of the
  reference (NMP.py:266-282) are contracted at pixel granularity and
  broadcast over candidates — an N^2-fold FLOP saving (N=4: 16x) on the
  positional terms;
- sampling of right-view features at candidate disparities is the shared
  gather op (ops/sampler.bilinear_sampler), not grid_sample.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.sampler import bilinear_sampler
from .swin import drop_path

Dtype = Any

_gelu = partial(nn.gelu, approximate=False)


def fourier_coord_embed(coord: jnp.ndarray, n_freqs: int = 15,
                        normalizer: float = 3.14 / 64) -> jnp.ndarray:
    """[...] scalar coordinates → [..., 2·n_freqs+1] =
    [sin(c·2^i), cos(c·2^i), c] with c = coord·normalizer
    (reference NMP.py:35-51, logscale; the reference uses the literal 3.14,
    not pi — kept for checkpoint parity)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=coord.dtype)
    c = coord[..., None] * normalizer               # [..., 1]
    f = c * freqs                                   # [..., F]
    return jnp.concatenate([jnp.sin(f), jnp.cos(f), c], axis=-1)


class MLPHead(nn.Module):
    """relu MLP head (reference NMP.py:54-66)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class Mlp(nn.Module):
    """timm-style fc-gelu-fc."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class BasicAttention(nn.Module):
    """Message passing along self edges: attention across the N candidates
    of each pixel (reference NMP.py:70-139, normalize_before path)."""

    dim: int
    num_heads: int = 4
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, label_rep, abs_encoding, *, train: bool = False):
        """label_rep [..., N, C]; abs_encoding [..., N, C']."""
        h = self.num_heads
        hd = self.dim // h
        shortcut = label_rep
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(label_rep)
        qk_in = jnp.concatenate([x, abs_encoding], axis=-1)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(qk_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(qk_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)
        shp = q.shape[:-1]
        q = q.reshape(*shp, h, hd)
        k = k.reshape(*shp, h, hd)
        v = v.reshape(*shp, h, hd)
        attn = jnp.einsum("...ihd,...jhd->...hij", q, k) * (hd ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("...hij,...jhd->...ihd", attn, v)
        out = out.reshape(*shp, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return shortcut + drop_path(out, self.drop_path_rate, not train, self)


def _win_parts(x: jnp.ndarray, ws: int):
    """[B, H, W, N, C] -> [B·nW, ws·ws, N, C] (H, W divisible by ws)."""
    b, h, w, n, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6)
    return x.reshape(-1, ws * ws, n, c)


def _win_merge(x: jnp.ndarray, ws: int, b: int, h: int, w: int):
    n, c = x.shape[-2:]
    x = x.reshape(b, h // ws, w // ws, ws, ws, n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6)
    return x.reshape(b, h, w, n, c)


def _swin_region_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """[nW, ws·ws, ws·ws] region mask (0 / -inf) for shifted windows
    (reference NMP.py:210-239 / 801-826). Trace-time numpy."""
    img = np.zeros((hp, wp), np.int64)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -np.inf, 0.0).astype(np.float32)


def _same_pixel_mask(n_tokens_pix: int, n_cand: int) -> np.ndarray:
    """[P·N, P·N] mask forbidding messages between sibling candidates of the
    same pixel (diagonal allowed; reference NMP.py:195-208)."""
    pix = np.repeat(np.arange(n_tokens_pix), n_cand)
    m = np.where(pix[:, None] == pix[None, :], -np.inf, 0.0)
    np.fill_diagonal(m, 0.0)
    return m.astype(np.float32)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class NMPWindowAttention(nn.Module):
    """Positional-sensitive window attention over (pixel, candidate) tokens
    (reference NMP.py:142-293). The learned table supplies q/k/v embeds."""

    dim: int
    window_size: int
    shift_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qkv, region_mask, cand_mask):
        """qkv [B, H, W, N, 3C]; region_mask: [nW, P, P] np or None;
        cand_mask: bool — apply the same-pixel candidate suppression."""
        b, hp, wp, n, _ = qkv.shape
        ws = self.window_size
        h = self.num_heads
        hd = self.dim // h
        p = ws * ws

        if self.shift_size > 0:
            qkv = jnp.roll(qkv, (-self.shift_size, -self.shift_size),
                           axis=(1, 2))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _win_parts(q, ws).reshape(-1, p, n, h, hd)
        k = _win_parts(k, ws).reshape(-1, p, n, h, hd)
        v = _win_parts(v, ws).reshape(-1, p, n, h, hd)

        table = self.param("relative_position_enc_table",
                           nn.initializers.zeros,
                           ((2 * ws - 1) ** 2, 3 * self.dim))
        idx = _rel_pos_index(ws)
        rpe = table[idx.reshape(-1)].reshape(p, p, h, 3 * hd)
        q_e, k_e, v_e = jnp.split(rpe.astype(self.dtype), 3, axis=-1)

        scale = hd ** -0.5
        q = q * scale
        # content term over full (pixel, cand) token pairs
        attn = jnp.einsum("binhd,bjmhd->bhinjm", q, k)
        # positional terms are candidate-independent on one side:
        # qr[(i ci), (j cj)] = Σ_d q[i ci] k_embed[i j]  (broadcast over cj)
        qr = jnp.einsum("binhd,ijhd->bhinj", q, k_e)
        kr = jnp.einsum("bjmhd,ijhd->bhijm", k, q_e * scale)
        attn = attn + qr[..., None] + kr[:, :, :, None]
        attn = attn.reshape(-1, h, p * n, p * n)

        if region_mask is not None:
            nw = region_mask.shape[0]
            rm = np.repeat(np.repeat(region_mask, n, axis=1), n, axis=2)
            attn = attn.reshape(b, nw, h, p * n, p * n)
            attn = attn + jnp.asarray(rm, self.dtype)[None, :, None]
            attn = attn.reshape(-1, h, p * n, p * n)
        if cand_mask:
            attn = attn + jnp.asarray(_same_pixel_mask(p, n), self.dtype)

        attn = nn.softmax(attn, axis=-1)
        attn = attn.reshape(-1, h, p, n, p, n)
        out = jnp.einsum("bhinjm,bjmhd->binhd", attn, v)
        # v positional term: Σ_(j cj) attn · v_embed[i j] — contract cands
        out = out + jnp.einsum("bhinj,ijhd->binhd",
                               attn.sum(axis=-1), v_e)
        out = out.reshape(-1, p, n, self.dim)
        x = _win_merge(out, ws, b, hp, wp)
        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        return x


class SwinNMP(nn.Module):
    """Swin message-passing block (reference NMP.py:295-398,
    normalize_before path)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    cand_mask: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, label_rep, abs_encoding, region_mask, *,
                 train: bool = False):
        """label_rep / abs_encoding: [B, Hp, Wp, N, C/C'] (already padded to
        window multiples)."""
        shortcut = label_rep
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(label_rep)
        x = jnp.concatenate([x, abs_encoding], axis=-1)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        msg = NMPWindowAttention(self.dim, self.window_size, self.shift_size,
                                 self.num_heads, dtype=self.dtype,
                                 name="attn")(qkv, region_mask, self.cand_mask)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        x = shortcut + drop_path(msg, self.drop_path_rate, not train, self)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y)
        return x + drop_path(y, self.drop_path_rate, not train, self)


class CSWinAttention(nn.Module):
    """Stripe (cross-shaped window) attention with depthwise-conv positional
    encoding (reference NMP.py:401-505). idx 0: vertical stripes (H x split);
    idx 1: horizontal."""

    dim: int
    idx: int
    split_size: int = 1
    num_heads: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value):
        """query/key/value: [B, H, W, N, C] → [B, H, W, N, C]."""
        b, ht, wd, n, c = query.shape
        if self.idx == 0:
            h_sp, w_sp = ht, self.split_size
        else:
            h_sp, w_sp = self.split_size, wd
        pad_h = (h_sp - ht % h_sp) % h_sp
        pad_w = (w_sp - wd % w_sp) % w_sp
        top, left = pad_h // 2, pad_w // 2
        if pad_h or pad_w:
            padw = ((0, 0), (top, pad_h - top), (left, pad_w - left),
                    (0, 0), (0, 0))
            query = jnp.pad(query, padw)
            key = jnp.pad(key, padw)
            value = jnp.pad(value, padw)
        hp, wp = ht + pad_h, wd + pad_w
        ni, nj = hp // h_sp, wp // w_sp
        h = self.num_heads
        hd = c // h
        p = h_sp * w_sp

        def to_windows(x):  # [B,Hp,Wp,N,C] -> [B·nW, P, N, h, hd]
            x = x.reshape(b, ni, h_sp, nj, w_sp, n, c)
            x = x.transpose(0, 1, 3, 2, 4, 5, 6)
            return x.reshape(-1, p, n, h, hd)

        q = to_windows(query)
        k = to_windows(key)

        # positional encoding: depthwise conv per (stripe, candidate), summed
        # over candidates, minus the centre-tap leak from sibling candidates
        # (reference NMP.py:433-449)
        vw = value.reshape(b, ni, h_sp, nj, w_sp, n, c)
        vw = vw.transpose(0, 1, 3, 5, 2, 4, 6).reshape(-1, h_sp, w_sp, c)
        dw = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                     feature_group_count=c, use_bias=False,
                     dtype=self.dtype, name="get_v")
        conv_v = dw(vw).reshape(-1, n, h_sp, w_sp, c)
        rpe = conv_v.sum(axis=1, keepdims=True)             # Σ_n conv(v_n)
        w_center = dw.variables["params"]["kernel"][1, 1, 0, :]
        v_spat = vw.reshape(-1, n, h_sp, w_sp, c)
        v_sum = v_spat.sum(axis=1, keepdims=True)
        # tmp[j] = -w_center · Σ_{k≠j} v_k
        rpe = rpe - w_center * (v_sum - v_spat)
        rpe = rpe.reshape(-1, n, p, h, hd).transpose(0, 2, 1, 3, 4)

        v = v_spat.reshape(-1, n, p, h, hd).transpose(0, 2, 1, 3, 4)

        attn = jnp.einsum("binhd,bjmhd->bhinjm", q * (hd ** -0.5), k)
        attn = attn.reshape(-1, h, p * n, p * n)
        attn = attn + jnp.asarray(_same_pixel_mask(p, n), self.dtype)
        attn = nn.softmax(attn, axis=-1)
        attn = attn.reshape(-1, h, p, n, p, n)
        out = jnp.einsum("bhinjm,bjmhd->binhd", attn, v) + rpe
        out = out.reshape(-1, p, n, c)

        x = out.reshape(b, ni, nj, h_sp, w_sp, n, c)
        x = x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(b, hp, wp, n, c)
        if pad_h or pad_w:
            x = x[:, top:top + ht, left:left + wd]
        return x


class CSWinNMP(nn.Module):
    """Cross-shaped-window message passing (reference NMP.py:508-600,
    normalize_before path). q/k see (token ‖ visual context); v is the
    token alone."""

    dim: int
    num_heads: int = 4
    split_size: int = 1
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, context, *, train: bool = False):
        """tgt [B, H, W, N, C]; context [B, H, W, N, C'']."""
        shortcut = tgt
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        qk_in = jnp.concatenate([x, context], axis=-1)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(qk_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(qk_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(x)

        half = self.dim // 2
        x1 = CSWinAttention(half, idx=0, split_size=self.split_size,
                            num_heads=self.num_heads // 2, dtype=self.dtype,
                            name="attns_0")(
            q[..., :half], k[..., :half], v[..., :half])
        x2 = CSWinAttention(half, idx=1, split_size=self.split_size,
                            num_heads=self.num_heads // 2, dtype=self.dtype,
                            name="attns_1")(
            q[..., half:], k[..., half:], v[..., half:])
        msg = jnp.concatenate([x1, x2], axis=-1)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(msg)
        x = shortcut + drop_path(msg, self.drop_path_rate, not train, self)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                name="mlp")(y)
        return x + drop_path(y, self.drop_path_rate, not train, self)


def sample_at_disparities(fmap: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Sample `fmap` [B,H,W,C] at x-shifted positions (x - disp, y) for each
    of N candidate disparities. disp [B,H,W,N] → [B,H,W,N,C]. Zeros outside
    (reference NMP.py:682-707, radius=0)."""
    b, h, w, c = fmap.shape
    n = disp.shape[-1]
    xs = jnp.arange(w, dtype=disp.dtype).reshape(1, 1, w, 1)
    ys = jnp.broadcast_to(
        jnp.arange(h, dtype=disp.dtype).reshape(1, h, 1, 1), (b, h, w, n))
    coords = jnp.stack([xs - disp, ys], axis=-1)  # [B,H,W,N,2]
    return bilinear_sampler(fmap, coords)


def groupwise_corr_nd(f1: jnp.ndarray, warped: jnp.ndarray,
                      groups: int) -> jnp.ndarray:
    """f1 [B,H,W,C]; warped [B,H,W,N,C] → [B,H,W,N,G] mean-per-group
    correlation (reference NMP.py:709-720)."""
    b, h, w, c = f1.shape
    n = warped.shape[3]
    d = c // groups
    a = f1.reshape(b, h, w, 1, groups, d)
    bb = warped.reshape(b, h, w, n, groups, d)
    return (a * bb).mean(axis=-1)


class Inference(nn.Module):
    """Neural MRF inference stack over N candidate labels at 1/8
    (reference NMP.py:670-798)."""

    cost_group: int = 32
    dim: int = 128
    num_layers: int = 5
    num_heads: int = 4
    window_size: int = 6
    mlp_ratio: float = 4.0
    normalizer: float = 3.14 / 64
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def _embed(self, labels, fmap1, fmap2, fmap1_gw, fmap2_gw):
        warped_gw = sample_at_disparities(fmap2_gw, labels)
        corr = groupwise_corr_nd(fmap1_gw, warped_gw, self.cost_group)
        warped = sample_at_disparities(fmap2, labels)
        n = labels.shape[-1]
        f1 = jnp.broadcast_to(fmap1[:, :, :, None],
                              (*fmap1.shape[:3], n, fmap1.shape[-1]))
        feat = jnp.concatenate([f1, warped, corr], axis=-1)
        return Mlp(self.dim, self.dim, dtype=self.dtype, name="ffn")(feat)

    @nn.compact
    def __call__(self, labels, fmap1, fmap2, fmap1_gw, fmap2_gw, *,
                 train: bool = False, intermediates: bool = False):
        """labels [B,H,W,N] candidate disparities (1/8 units).
        Returns list of [B,H,W,N,C] (len num_layers if intermediates else 1)."""
        b, ht, wd, n = labels.shape
        x = self._embed(labels, fmap1, fmap2, fmap1_gw, fmap2_gw)
        abs_enc = fourier_coord_embed(labels, normalizer=self.normalizer)

        ws = self.window_size
        pad_h = (ws - ht % ws) % ws
        pad_w = (ws - wd % ws) % ws
        top, left = pad_h // 2, pad_w // 2
        if pad_h or pad_w:
            padw = ((0, 0), (top, pad_h - top), (left, pad_w - left),
                    (0, 0), (0, 0))
            x = jnp.pad(x, padw)
            abs_enc = jnp.pad(abs_enc, padw)
        hp, wp = ht + pad_h, wd + pad_w

        shift = ws // 2
        region_mask = _swin_region_mask(hp, wp, ws, shift)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        outs = []
        for i in range(self.num_layers):
            x = BasicAttention(self.dim, self.num_heads,
                               drop_path_rate=self.drop_path_rate,
                               dtype=self.dtype,
                               name=f"layers_{i}_self_nmp")(
                x, abs_enc, train=train)
            x = SwinNMP(self.dim, self.num_heads, ws,
                        shift_size=0 if i % 2 == 0 else shift,
                        mlp_ratio=self.mlp_ratio,
                        drop_path_rate=self.drop_path_rate,
                        cand_mask=True, dtype=self.dtype,
                        name=f"layers_{i}_nmp")(
                x, abs_enc,
                None if i % 2 == 0 else region_mask, train=train)
            if intermediates or i == self.num_layers - 1:
                y = norm(x)
                outs.append(y[:, top:top + ht, left:left + wd])
        return outs


class Refinement(nn.Module):
    """Refinement stack at 1/4, single candidate (reference NMP.py:801-900)."""

    cost_group: int = 32
    dim: int = 128
    num_layers: int = 5
    num_heads: int = 4
    window_size: int = 4
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, disp, fmap1, fmap2, fmap1_gw, fmap2_gw, *,
                 train: bool = False, intermediates: bool = False):
        """disp [B,H,W] (1/4 units). Returns list of [B,H,W,C]."""
        b, ht, wd = disp.shape
        labels = disp[..., None]                        # N = 1
        warped_gw = sample_at_disparities(fmap2_gw, labels)
        corr = groupwise_corr_nd(fmap1_gw, warped_gw, self.cost_group)
        warped = sample_at_disparities(fmap2, labels)[:, :, :, 0]
        feat = jnp.concatenate(
            [fmap1, warped, corr[:, :, :, 0]], axis=-1)[:, :, :, None]
        x = Mlp(self.dim, self.dim, dtype=self.dtype, name="ffn")(feat)
        abs_enc = fourier_coord_embed(labels, normalizer=3.14 / 128)

        ws = self.window_size
        pad_h = (ws - ht % ws) % ws
        pad_w = (ws - wd % ws) % ws
        top, left = pad_h // 2, pad_w // 2
        if pad_h or pad_w:
            padw = ((0, 0), (top, pad_h - top), (left, pad_w - left),
                    (0, 0), (0, 0))
            x = jnp.pad(x, padw)
            abs_enc = jnp.pad(abs_enc, padw)
        hp, wp = ht + pad_h, wd + pad_w

        shift = ws // 2
        region_mask = _swin_region_mask(hp, wp, ws, shift)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        outs = []
        for i in range(self.num_layers):
            x = SwinNMP(self.dim, self.num_heads, ws,
                        shift_size=0 if i % 2 == 0 else shift,
                        mlp_ratio=self.mlp_ratio,
                        drop_path_rate=self.drop_path_rate,
                        cand_mask=False, dtype=self.dtype,
                        name=f"layers_{i}_nmp")(
                x, abs_enc,
                None if i % 2 == 0 else region_mask, train=train)
            if intermediates or i == self.num_layers - 1:
                y = norm(x)
                outs.append(y[:, top:top + ht, left:left + wd, 0])
        return outs


class Propagation(nn.Module):
    """Label-seed propagation over the cost volume (reference NMP.py:603-667)."""

    embed_dim: int = 128
    cost_group: int = 4
    num_layers: int = 5
    num_heads: int = 4
    split_size: int = 1
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cost_volume, label_seeds, context, *,
                 train: bool = False):
        """cost_volume [B,H,W,G,D]; label_seeds [B,H,W,N] int;
        context [B,H,W,C'']. Returns [B,H,W,N,C]."""
        b, ht, wd, g, nd = cost_volume.shape
        n = label_seeds.shape[-1]
        # sample G x 9 cost taps around each seed (reference NMP.py:618-634)
        offs = jnp.arange(-4, 5)
        idx = jnp.clip(label_seeds[..., None] + offs, 0, nd - 1)  # [B,H,W,N,9]
        cv = cost_volume.reshape(b, ht, wd, 1, g, nd)
        idx = jnp.broadcast_to(idx[:, :, :, :, None, :], (b, ht, wd, n, g, 9))
        cost = jnp.take_along_axis(cv, idx, axis=-1)
        cost = cost.reshape(b, ht, wd, n, g * 9)
        feat = nn.Dense(self.embed_dim, dtype=self.dtype,
                        name="cost_encoder_fc1")(cost)
        feat = _gelu(feat)
        feat = nn.Dense(self.embed_dim, dtype=self.dtype,
                        name="cost_encoder_fc2")(feat)
        seeds_f = label_seeds.astype(self.dtype)
        disp_enc = fourier_coord_embed(seeds_f)
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                     name="proj")(jnp.concatenate([feat, disp_enc], axis=-1))

        ctx = jnp.broadcast_to(context[:, :, :, None],
                               (b, ht, wd, n, context.shape[-1]))
        for i in range(self.num_layers):
            x = CSWinNMP(self.embed_dim, self.num_heads, self.split_size,
                         self.mlp_ratio, drop_path_rate=self.drop_path_rate,
                         dtype=self.dtype, name=f"layers_{i}_nmp")(
                x, ctx, train=train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
