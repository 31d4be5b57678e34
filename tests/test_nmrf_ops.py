"""Golden tests for the NMRF custom-op re-designs.

The reference implements these as CUDA extensions
(stereo/modeling/models/nmrf/ops/); oracles here are the public semantics:
torch.grid_sample for deformable attention (the reference's own python
fallback ms_deform_attn_core_pytorch is grid_sample-based,
ops/functions/ms_deform_attn_func.py:49-71) and a direct transcription of
the downsample CUDA kernel for the superpixel op.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openstereo_tpu.ops.msda import ms_deform_attn
from openstereo_tpu.ops.superpixel import (superpixel_downsample,
                                           superpixel_downsample_np)


def _torch_msda(values, locs, weights):
    """Oracle: per-level grid_sample(align_corners=False, zeros) + weighted
    sum, mirroring ms_deform_attn_core_pytorch semantics."""
    import torch
    import torch.nn.functional as F

    b, lq, m, nl, p, _ = locs.shape
    out = np.zeros((b, lq, m, values[0].shape[-1]), np.float64)
    for l, val in enumerate(values):
        _, h, w, _, d = val.shape
        v = torch.tensor(val, dtype=torch.float64)
        v = v.permute(0, 3, 4, 1, 2).reshape(b * m, d, h, w)
        grid = torch.tensor(2 * locs[:, :, :, l] - 1, dtype=torch.float64)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * m, lq, p, 2)
        samp = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                             align_corners=False)  # [B*M, D, Lq, P]
        samp = samp.reshape(b, m, d, lq, p).numpy()
        wgt = weights[:, :, :, l]  # [B, Lq, M, P]
        out += np.einsum("bmdqp,bqmp->bqmd", samp, wgt)
    return out.reshape(b, lq, m * values[0].shape[-1])


def test_ms_deform_attn_matches_grid_sample():
    rng = np.random.RandomState(0)
    b, m, d, p = 2, 3, 4, 4
    shapes = [(9, 13), (5, 7)]
    lq = 11
    values = [rng.randn(b, h, w, m, d) for h, w in shapes]
    locs = rng.rand(b, lq, m, len(shapes), p, 2) * 1.4 - 0.2  # incl. oob
    weights = rng.rand(b, lq, m, len(shapes), p)
    weights /= weights.sum(axis=(-2, -1), keepdims=True)

    got = ms_deform_attn([jnp.asarray(v) for v in values],
                         jnp.asarray(locs), jnp.asarray(weights))
    exp = _torch_msda(values, locs, weights)
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5, rtol=0)


def test_ms_deform_attn_differentiable():
    rng = np.random.RandomState(1)
    values = [jnp.asarray(rng.randn(1, 6, 8, 2, 4))]
    locs = jnp.asarray(rng.rand(1, 5, 2, 1, 3, 2))
    weights = jnp.asarray(rng.rand(1, 5, 2, 1, 3))

    def f(v, l, w):
        return ms_deform_attn([v], l, w).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(values[0], locs, weights)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(grads[0]).sum()) > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_superpixel_downsample_matches_reference(seed):
    rng = np.random.RandomState(seed)
    b, h, w = 2, 16, 24
    disp = (rng.rand(b, h, w) * 60).astype(np.float32)
    disp[rng.rand(b, h, w) < 0.3] = 0.0  # invalid pixels
    # blobby superpixel labels: coarse random grid + jitter
    base = rng.randint(0, 6, size=(b, h // 4 + 1, w // 4 + 1))
    label = np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)[:, :h, :w]
    label = label.astype(np.int32)

    got = np.asarray(superpixel_downsample(jnp.asarray(disp),
                                           jnp.asarray(label)))
    exp = superpixel_downsample_np(disp, label)
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_superpixel_downsample_partial_blocks_and_empty():
    rng = np.random.RandomState(3)
    disp = (rng.rand(1, 10, 13) * 30).astype(np.float32)
    disp[0, :, :6] = 0.0  # a fully invalid region
    label = rng.randint(0, 4, size=(1, 10, 13)).astype(np.int32)
    got = np.asarray(superpixel_downsample(jnp.asarray(disp),
                                           jnp.asarray(label)))
    exp = superpixel_downsample_np(disp, label)
    assert got.shape == (1, 2, 2, 4)
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_bilinear_sampler_mxu_matches_gather():
    """The separable hat-matrix MXU form of bilinear sampling must be
    bit-compatible (f32 tolerance) with the 4-tap gather form, including
    out-of-frame zeroing and Q not divisible by the chunk size."""
    from openstereo_tpu.ops.sampler import bilinear_sampler, bilinear_sampler_mxu

    rng = np.random.RandomState(7)
    b, h, w, c = 3, 13, 21, 5
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    q = 137  # not a multiple of any chunk
    # coords spanning in-frame, boundary, and far out-of-frame
    coords = rng.uniform(-4, max(h, w) + 4, size=(b, q, 2)).astype(np.float32)
    coords[:, :5] = [[0.0, 0.0]] * 5  # exact corners
    coords[:, 5] = [w - 1, h - 1]
    coords = jnp.asarray(coords)

    ref = np.asarray(bilinear_sampler(img, coords))
    for chunk in (32, 64, 4096):
        got = np.asarray(bilinear_sampler_mxu(img, coords, chunk=chunk))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ms_deform_attn_gather_and_mxu_paths_agree(monkeypatch):
    """Both OPENSTEREO_MSDA paths through ms_deform_attn must agree."""
    import os

    rng = np.random.RandomState(11)
    b, m, d, p = 2, 3, 4, 4
    values = [jnp.asarray(rng.randn(b, hh, ww, m, d).astype(np.float32))
              for hh, ww in ((12, 18), (6, 9))]
    lq = 10
    locs = jnp.asarray(rng.uniform(-0.1, 1.1,
                                   size=(b, lq, m, 2, p, 2)).astype(np.float32))
    wgt = rng.rand(b, lq, m, 2, p).astype(np.float32)
    wgt /= wgt.sum(axis=(-1, -2), keepdims=True)
    wgt = jnp.asarray(wgt)

    monkeypatch.setenv("OPENSTEREO_MSDA", "gather")
    ref = np.asarray(ms_deform_attn(values, locs, wgt))
    monkeypatch.setenv("OPENSTEREO_MSDA", "mxu")
    got = np.asarray(ms_deform_attn(values, locs, wgt))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
