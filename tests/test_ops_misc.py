"""disparity_regression / context_upsample / bilinear_sampler vs torch golden refs."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from openstereo_tpu.ops import (
    disparity_regression,
    context_upsample,
    bilinear_sampler,
    disp_warp,
)


def test_disparity_regression():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 6, 8).astype(np.float32)  # [B,H,W,D]
    prob = np.asarray(jnp.asarray(logits))
    prob = np.exp(prob) / np.exp(prob).sum(-1, keepdims=True)
    got = np.asarray(disparity_regression(jnp.asarray(prob), 8))
    exp = (prob * np.arange(8, dtype=np.float32)).sum(-1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_context_upsample_matches_torch():
    rng = np.random.RandomState(2)
    b, h, w, s = 2, 5, 7, 4
    disp = rng.rand(b, h, w).astype(np.float32)
    weights = rng.rand(b, 9, s * h, s * w).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)

    # torch golden (reference: disp_refinement.py:194-204)
    td = torch.from_numpy(disp)[:, None]
    unfold = F.unfold(td, kernel_size=3, padding=1).reshape(b, 9, h, w)
    unfold = F.interpolate(unfold, (h * s, w * s), mode="nearest")
    exp = (unfold * torch.from_numpy(weights)).sum(1).numpy()

    got = np.asarray(
        context_upsample(
            jnp.asarray(disp), jnp.asarray(weights.transpose(0, 2, 3, 1)), s
        )
    )
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_bilinear_sampler_matches_grid_sample():
    rng = np.random.RandomState(3)
    b, h, w, c = 2, 6, 9, 4
    img = rng.randn(b, h, w, c).astype(np.float32)
    # random coords, some out of frame
    coords = np.stack(
        [rng.uniform(-2, w + 1, (b, 5, 7)), rng.uniform(-2, h + 1, (b, 5, 7))], -1
    ).astype(np.float32)

    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    grid = torch.from_numpy(coords).clone()
    grid[..., 0] = 2 * grid[..., 0] / (w - 1) - 1
    grid[..., 1] = 2 * grid[..., 1] / (h - 1) - 1
    exp = (
        F.grid_sample(timg, grid, align_corners=True, padding_mode="zeros")
        .permute(0, 2, 3, 1)
        .numpy()
    )

    got = np.asarray(bilinear_sampler(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_disp_warp_zero_disp_identity():
    rng = np.random.RandomState(4)
    img = rng.randn(1, 4, 6, 3).astype(np.float32)
    warped, valid = disp_warp(jnp.asarray(img), jnp.zeros((1, 4, 6), np.float32))
    np.testing.assert_allclose(np.asarray(warped), img, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(valid), 1.0)
