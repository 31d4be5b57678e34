"""Fused relative-attention Pallas kernel (ops/pallas/rel_attention.py) vs
the jnp reference formulation (the model's differentiable path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openstereo_tpu.ops.pallas.rel_attention import (
    rel_attention,
    rel_attention_reference,
)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("shape", [(2, 64, 32, 4), (1, 40, 16, 2)])
def test_kernel_matches_reference(shape, masked):
    b, w, e, nh = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, w, e) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(b, w, e) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(b, w, e) * 0.2, jnp.float32)
    ke = jnp.asarray(rng.randn(2 * w - 1, e) * 0.2, jnp.float32)
    qe = jnp.asarray(rng.randn(2 * w - 1, e) * 0.2, jnp.float32)

    out, raw = rel_attention(q, k, v, ke, qe, nheads=nh, masked=masked,
                             interpret=True)
    out_r, raw_r = rel_attention_reference(q, k, v, ke, qe, nheads=nh,
                                           masked=masked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    fin = np.abs(np.asarray(raw_r)) < 1e20
    np.testing.assert_allclose(np.asarray(raw)[fin], np.asarray(raw_r)[fin],
                               rtol=1e-4, atol=1e-4)


def test_no_raw_variant():
    rng = np.random.RandomState(1)
    b, w, e, nh = 1, 24, 16, 2
    args = [jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)
            for s in [(b, w, e), (b, w, e), (b, w, e),
                      (2 * w - 1, e), (2 * w - 1, e)]]
    out1, raw = rel_attention(*args, nheads=nh, interpret=True)
    out2, none = rel_attention(*args, nheads=nh, need_raw=False,
                               interpret=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_transformer_paths_agree():
    """Model-level: use_pallas (interpret) vs einsum path, same params."""
    from openstereo_tpu.models.sttr import transformer as T

    rng = np.random.RandomState(2)
    n, hp, wp, c = 1, 3, 24, 32
    fl = jnp.asarray(rng.randn(n, hp, wp, c) * 0.5, jnp.float32)
    fr = jnp.asarray(rng.randn(n, hp, wp, c) * 0.5, jnp.float32)

    # route the pallas path through the interpreter on CPU
    orig = T.MultiheadAttentionRelative.__call__
    import openstereo_tpu.ops.pallas.rel_attention as R
    real = R.rel_attention
    R.rel_attention = lambda *a, **k: real(*a, **{**k, "interpret": True})
    try:
        outs = {}
        for up in (True, False):
            tr = T.Transformer(c, 4, 2, use_pallas=up)
            v = tr.init(jax.random.key(0), fl, fr, pos_scale=2.0)
            outs[up] = np.asarray(tr.apply(v, fl, fr, pos_scale=2.0))
    finally:
        R.rel_attention = real
        T.MultiheadAttentionRelative.__call__ = orig
    fin = np.abs(outs[False]) < 1e20
    np.testing.assert_allclose(outs[True][fin], outs[False][fin],
                               rtol=1e-4, atol=1e-4)
