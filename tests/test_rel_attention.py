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


def test_trainable_grad_matches_einsum_path():
    """Gradient parity of the custom-VJP fused attention vs the reference
    einsum decomposition (f32, interpret mode), including the head-summed
    raw-attention cotangent and the causal mask."""
    import jax
    import jax.numpy as jnp

    from openstereo_tpu.ops.pallas.rel_attention import (
        rel_attention_reference, rel_attention_trainable)

    rng = np.random.RandomState(0)
    b, w, nh, hd = 2, 16, 4, 8
    e = nh * hd
    args = [jnp.asarray(rng.randn(b, w, e), jnp.float32) for _ in range(3)]
    tables = [jnp.asarray(rng.randn(2 * w - 1, e), jnp.float32)
              for _ in range(2)]

    for masked in (False, True):
        def loss_ref(q, k, v, ke, qe):
            out, raw = rel_attention_reference(q, k, v, ke, qe, nh,
                                               masked=masked)
            r = jnp.where(jnp.isfinite(raw), raw, 0.0)
            return jnp.sum(out * 0.7) + jnp.sum(jnp.tanh(r) * 0.3)

        def loss_pal(q, k, v, ke, qe):
            out, raw = rel_attention_trainable(q, k, v, ke, qe, nh, masked,
                                               True, True)
            r = jnp.where(raw > -1e29, raw, 0.0)  # kernel masks with -1e30
            return jnp.sum(out * 0.7) + jnp.sum(jnp.tanh(r) * 0.3)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args, *tables)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args, *tables)
        for a, b_ in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=1e-4)
