"""Superpixel-guided disparity downsample — TPU-native (sort + scan).

Re-design of NMRF's custom CUDA op `MSDA.downsample_forward`
(reference: stereo/modeling/models/nmrf/ops/src/cuda/downsample_cuda.cu:85-150,
called via utils/frame_utils.py:272-286): for every 8x8 block of the
ground-truth disparity map, extract up to 4 disparity *modes* to supervise
the proposal network —

1. group the block's valid (disp > 0) pixels by superpixel label,
2. take the per-group upper median (k-th smallest, k = n//2, 0-based),
3. visit groups by decreasing pixel count; each visit opens a mode and
   absorbs every remaining group whose median lies within `nms_thresh`
   (pixels of absorbed groups join the mode's pixel set),
4. a mode's output value is the upper median of its merged pixel set;
   missing modes are 0.

The CUDA kernel runs a per-thread quickselect over local arrays — a shape
that does not map to TPU vector units. Here the whole computation is
re-derived as data-parallel sorts and prefix scans over the fixed 64-pixel
block axis: one lexsort by (label, value) makes every group a contiguous
ascending run, so group medians become a single gather at
start + count//2; group extents come from forward/backward prefix
max/min scans; the NMS loop is a static 4-iteration argmax/merge over
per-block group tables. No gradients flow (mode targets), matching the
reference autograd.Function whose backward returns None.

Tie-breaking among equal-sized groups is deterministic here (lowest group
index, i.e. smallest label first); the CUDA quickselect's tie order is
unspecified. Merged-mode membership is insensitive to this except when two
equal-sized groups lie within nms_thresh of a third, where either order
yields a valid mode set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf
_BIG_LABEL = np.int32(2 ** 30)


def superpixel_downsample(disp: jnp.ndarray, label: jnp.ndarray,
                          nms_thresh: float = 0.5,
                          stride: int = 8,
                          num_modes: int = 4) -> jnp.ndarray:
    """disp [B,H,W] float, label [B,H,W] int superpixel ids.

    Returns [B, ceil(H/stride), ceil(W/stride), num_modes] mode disparities
    (reference frame_utils.downsample_disp semantics, incl. zero/-1 padding
    of partial blocks).
    """
    b, h, w = disp.shape
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    if ph or pw:
        disp = jnp.pad(disp, ((0, 0), (0, ph), (0, pw)))
        label = jnp.pad(label, ((0, 0), (0, ph), (0, pw)),
                        constant_values=-1)
    hb, wb = (h + ph) // stride, (w + pw) // stride
    k = stride * stride
    v = disp.reshape(b, hb, stride, wb, stride).transpose(0, 1, 3, 2, 4)
    v = v.reshape(b * hb * wb, k).astype(jnp.float32)
    lab = label.reshape(b, hb, stride, wb, stride).transpose(0, 1, 3, 2, 4)
    lab = lab.reshape(b * hb * wb, k).astype(jnp.int32)

    out = _block_modes(v, lab, float(nms_thresh), num_modes)
    return out.reshape(b, hb, wb, num_modes)


def _block_modes(v: jnp.ndarray, lab: jnp.ndarray, nms_thresh: float,
                 num_modes: int) -> jnp.ndarray:
    """v, lab: [N, K] per-block values/labels → [N, num_modes] medians."""
    n, k = v.shape
    pos = jnp.arange(k)
    valid = v > 0
    lab_adj = jnp.where(valid, lab, _BIG_LABEL)

    # sort each block by (label, value): groups contiguous, ascending values
    order = jnp.lexsort((v, lab_adj), axis=-1)
    sv = jnp.take_along_axis(v, order, axis=-1)
    sl = jnp.take_along_axis(lab_adj, order, axis=-1)
    svalid = jnp.take_along_axis(valid, order, axis=-1)  # invalid sort last

    is_start = svalid & jnp.concatenate(
        [jnp.ones((n, 1), bool), sl[:, 1:] != sl[:, :-1]], axis=1)
    seg_id = jnp.cumsum(is_start, axis=1) - 1            # [N,K], ≥0 on valid
    # segment start position: prefix max of (is_start ? pos : -1)
    start = jax.lax.cummax(jnp.where(is_start, pos[None], -1), axis=1)
    # next segment start: exclusive suffix min of (is_start ? pos : +inf)
    u = jnp.where(is_start, pos[None].astype(jnp.float32), _INF)
    nxt = jnp.concatenate(
        [jax.lax.cummin(u, axis=1, reverse=True)[:, 1:],
         jnp.full((n, 1), _INF)], axis=1)
    nvalid = jnp.sum(svalid, axis=1, keepdims=True)
    end = jnp.minimum(nxt, nvalid.astype(jnp.float32)).astype(jnp.int32) - 1
    cnt = jnp.where(svalid, end - start + 1, 0)
    med = jnp.take_along_axis(sv, jnp.clip(start + cnt // 2, 0, k - 1),
                              axis=-1)

    # per-block segment tables (≤K segments), scatter from start positions
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    sid = jnp.where(is_start, seg_id, k)  # overflow slot k for non-starts
    seg_cnt = jnp.zeros((n, k + 1), jnp.int32).at[rows, sid].max(cnt)
    seg_med = jnp.zeros((n, k + 1), jnp.float32).at[rows, sid].max(
        jnp.where(is_start, med, -_INF))
    seg_cnt, seg_med = seg_cnt[:, :k], seg_med[:, :k]

    alive = seg_cnt > 0
    out = []
    for _ in range(num_modes):
        score = jnp.where(alive, seg_cnt, -1)
        pick = jnp.argmax(score, axis=1)                 # first max: lowest id
        any_alive = jnp.take_along_axis(score, pick[:, None], axis=1)[:, 0] > 0
        med_pick = jnp.take_along_axis(seg_med, pick[:, None], axis=1)
        merged = alive & (jnp.abs(seg_med - med_pick) < nms_thresh)
        merged = merged & any_alive[:, None]
        alive = alive & ~merged
        # upper median over the union of merged groups' pixels
        member = svalid & jnp.take_along_axis(
            merged, jnp.clip(seg_id, 0, k - 1), axis=1)
        mv = jnp.sort(jnp.where(member, sv, _INF), axis=1)
        mcnt = jnp.sum(member, axis=1)
        mmed = jnp.take_along_axis(mv, (mcnt // 2)[:, None], axis=1)[:, 0]
        out.append(jnp.where(any_alive & (mcnt > 0), mmed, 0.0))
    return jnp.stack(out, axis=1)


def superpixel_downsample_np(disp: np.ndarray, label: np.ndarray,
                             nms_thresh: float = 0.5, stride: int = 8,
                             num_modes: int = 4) -> np.ndarray:
    """Plain-python reference, transcribed from the CUDA kernel
    (downsample_cuda.cu:85-150) with the same deterministic tie-break as
    the jnp implementation. Test oracle only."""
    b, h, w = disp.shape
    ph = (stride - h % stride) % stride
    pw = (stride - w % stride) % stride
    disp = np.pad(disp, ((0, 0), (0, ph), (0, pw)))
    label = np.pad(label, ((0, 0), (0, ph), (0, pw)), constant_values=-1)
    hb, wb = (h + ph) // stride, (w + pw) // stride
    out = np.zeros((b, hb, wb, num_modes), np.float32)
    for bi in range(b):
        for i in range(hb):
            for j in range(wb):
                blk_v = disp[bi, i * stride:(i + 1) * stride,
                             j * stride:(j + 1) * stride].ravel()
                blk_l = label[bi, i * stride:(i + 1) * stride,
                              j * stride:(j + 1) * stride].ravel()
                ok = blk_v > 0
                vv, ll = blk_v[ok], blk_l[ok]
                groups = {}
                for lv in np.unique(ll):
                    groups[lv] = np.sort(vv[ll == lv])
                # order: count desc, then label asc (deterministic ties)
                order = sorted(groups, key=lambda g: (-len(groups[g]), g))
                taken = set()
                m = 0
                for g in order:
                    if m >= num_modes:
                        break
                    if g in taken:
                        continue
                    pool = list(groups[g])
                    gm = groups[g][len(groups[g]) // 2]
                    taken.add(g)
                    for g2 in order:
                        if g2 in taken:
                            continue
                        m2 = groups[g2][len(groups[g2]) // 2]
                        if abs(m2 - gm) < nms_thresh:
                            taken.add(g2)
                            pool.extend(groups[g2])
                    pool = np.sort(np.asarray(pool))
                    out[bi, i, j, m] = pool[len(pool) // 2]
                    m += 1
    return out
