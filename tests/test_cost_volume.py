"""Cost-volume builders vs naive per-pixel numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from openstereo_tpu.ops import (
    correlation_volume,
    build_gwc_volume,
    build_concat_volume,
    build_diff_volume,
    build_sub_volume,
)

B, H, W, C, D = 2, 5, 12, 8, 6


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(0)
    left = rng.randn(B, H, W, C).astype(np.float32)
    right = rng.randn(B, H, W, C).astype(np.float32)
    return left, right


def naive_corr(left, right, max_disp):
    out = np.zeros((B, H, W, max_disp), np.float32)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                for d in range(max_disp):
                    if w - d >= 0:
                        out[b, h, w, d] = np.mean(left[b, h, w] * right[b, h, w - d])
    return out


def test_correlation_volume(feats):
    left, right = feats
    got = np.asarray(correlation_volume(jnp.asarray(left), jnp.asarray(right), D))
    np.testing.assert_allclose(got, naive_corr(left, right, D), rtol=1e-5, atol=1e-5)


def test_gwc_volume(feats):
    left, right = feats
    groups = 4
    got = np.asarray(build_gwc_volume(jnp.asarray(left), jnp.asarray(right), D, groups))
    assert got.shape == (B, D, H, W, groups)
    cpg = C // groups
    lg = left.reshape(B, H, W, groups, cpg)
    rg = right.reshape(B, H, W, groups, cpg)
    exp = np.zeros((B, D, H, W, groups), np.float32)
    for d in range(D):
        prod = (lg[:, :, d:] * rg[:, :, : W - d if d else W]).mean(-1)
        exp[:, d, :, d:] = prod
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_concat_volume(feats):
    left, right = feats
    got = np.asarray(build_concat_volume(jnp.asarray(left), jnp.asarray(right), D))
    assert got.shape == (B, D, H, W, 2 * C)
    # d=0 plane is plain concat
    np.testing.assert_allclose(got[:, 0, :, :, :C], left)
    np.testing.assert_allclose(got[:, 0, :, :, C:], right)
    # shifted plane: out-of-frame zeroed, in-frame left + shifted right
    d = 3
    np.testing.assert_allclose(got[:, d, :, :d, :], 0.0)
    np.testing.assert_allclose(got[:, d, :, d:, :C], left[:, :, d:])
    np.testing.assert_allclose(got[:, d, :, d:, C:], right[:, :, :-d])


def test_diff_volume(feats):
    left, right = feats
    got = np.asarray(build_diff_volume(jnp.asarray(left), jnp.asarray(right), D))
    assert got.shape == (B, D, H, W, C)
    np.testing.assert_allclose(got[:, 0], left - right, rtol=1e-6)
    d = 2
    np.testing.assert_allclose(got[:, d, :, d:], left[:, :, d:] - right[:, :, :-d], rtol=1e-6)
    np.testing.assert_allclose(got[:, d, :, :d], 0.0)


def test_sub_volume(feats):
    left, right = feats
    got = np.asarray(build_sub_volume(jnp.asarray(left), jnp.asarray(right), D))
    assert got.shape == (B, H, W, D)
    d = 2
    # out-of-frame: L1 of left features alone (reference cost_volume.py:110-111)
    np.testing.assert_allclose(
        got[:, :, :d, d], np.abs(left[:, :, :d]).sum(-1), rtol=1e-5
    )
    np.testing.assert_allclose(
        got[:, :, d:, d], np.abs(left[:, :, d:] - right[:, :, :-d]).sum(-1), rtol=1e-5
    )
