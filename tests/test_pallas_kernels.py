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
