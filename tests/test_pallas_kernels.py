"""Pallas kernels vs jnp reference implementations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from openstereo_tpu.ops import build_gwc_volume, correlation_volume
from openstereo_tpu.ops.pallas import build_gwc_volume_pallas, correlation_volume_pallas


def test_pallas_corr_volume_matches_jnp():
    key = jax.random.key(0)
    b, h, w, c, d = 2, 5, 300, 24, 16
    l = jax.random.normal(key, (b, h, w, c))
    r = jax.random.normal(jax.random.key(1), (b, h, w, c))
    ref = np.asarray(correlation_volume(l, r, d))
    got = np.asarray(correlation_volume_pallas(l, r, d, tile_w=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_gwc_volume_matches_jnp():
    key = jax.random.key(4)
    b, h, w, c, d, g = 1, 4, 260, 16, 12, 4
    l = jax.random.normal(key, (b, h, w, c))
    r = jax.random.normal(jax.random.key(5), (b, h, w, c))
    ref = np.asarray(build_gwc_volume(l, r, d, g))
    got = np.asarray(build_gwc_volume_pallas(l, r, d, g, tile_w=128, interpret=True))
    assert got.shape == ref.shape == (b, d, h, w, g)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_fused_mbconv_matches_reference():
    from openstereo_tpu.ops.pallas.fused_mbconv import fused_mbconv, mbconv_reference

    rng = np.random.RandomState(0)
    b, h, w, cin, ch = 2, 20, 140, 24, 96
    args = [jnp.asarray(a, jnp.float32) for a in [
        rng.randn(b, h, w, cin), rng.randn(cin, ch) * 0.1,
        rng.randn(ch) * 0.5, rng.randn(9, ch) * 0.1, rng.randn(ch) * 0.1,
        rng.randn(ch, cin) * 0.1, rng.randn(cin) * 0.1]]
    ref = np.asarray(mbconv_reference(*args))
    got = np.asarray(fused_mbconv(*args, tile_h=8, tile_w=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # non-residual path
    args2 = args[:5] + [jnp.asarray(rng.randn(ch, 48) * 0.1, jnp.float32),
                        jnp.asarray(rng.randn(48) * 0.1, jnp.float32)]
    ref = np.asarray(mbconv_reference(*args2, residual=False))
    got = np.asarray(fused_mbconv(*args2, tile_h=8, tile_w=128,
                                  residual=False, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fold_bn():
    from openstereo_tpu.ops.pallas.fused_mbconv import fold_bn

    rng = np.random.RandomState(1)
    k = rng.randn(3, 3, 8, 16)
    scale, bias = rng.rand(16) + 0.5, rng.randn(16)
    mean, var = rng.randn(16), rng.rand(16) + 0.1
    kf, bf = fold_bn(k, scale, bias, mean, var)
    x = rng.randn(50, 16)
    # conv output y → BN(y) must equal folded conv output with bias
    y = x  # treat x as pre-BN conv outputs directly for the affine algebra
    bn = (y - mean) / np.sqrt(var + 1e-5) * scale + bias
    folded = y * (scale / np.sqrt(var + 1e-5)) + bf
    np.testing.assert_allclose(bn, folded, rtol=1e-5)


def test_pallas_corr_volume_ragged_width():
    """W not a multiple of the tile: padded internally, cropped on return."""
    key = jax.random.key(2)
    b, h, w, c, d = 1, 3, 130, 8, 8
    l = jax.random.normal(key, (b, h, w, c))
    r = jax.random.normal(jax.random.key(3), (b, h, w, c))
    ref = np.asarray(correlation_volume(l, r, d))
    got = np.asarray(correlation_volume_pallas(l, r, d, tile_w=128, interpret=True))
    assert got.shape == (b, h, w, d)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
