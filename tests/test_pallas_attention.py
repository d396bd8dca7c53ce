"""Fused attention kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boosted_detr_tpu.ops.pallas_attention import (attention_reference,
                                                   fused_attention)


@pytest.mark.parametrize("bh,tq,tk,d", [(4, 64, 64, 32), (2, 130, 200, 32),
                                        (1, 324, 324, 64)])
def test_fused_attention_matches_reference(rng, bh, tq, tk, d):
    q = jnp.asarray(rng.normal(size=(bh, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bh, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bh, tk, d)).astype(np.float32))
    out = np.asarray(fused_attention(q, k, v, interpret=True))
    ref = np.asarray(attention_reference(q, k, v))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=2e-4), np.abs(out - ref).max()


def test_fused_attention_bf16(rng):
    q = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 96, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 96, 32)), jnp.bfloat16)
    out = np.asarray(fused_attention(q, k, v, interpret=True),
                     dtype=np.float32)
    ref = np.asarray(attention_reference(q, k, v), dtype=np.float32)
    assert np.allclose(out, ref, atol=3e-2)


def test_mha_pallas_flag_matches_xla(rng):
    """MultiheadAttention(use_pallas=True) must agree with the XLA path given
    the same parameters."""
    from boosted_detr_tpu.models.layers import MultiheadAttention

    q = jnp.asarray(rng.normal(size=(2, 12, 16)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 20, 16)).astype(np.float32))
    xla = MultiheadAttention(num_heads=2, use_pallas=False)
    params = xla.init(jax.random.PRNGKey(0), q, kv, kv)
    out_xla = xla.apply(params, q, kv, kv)
    # the pallas path hits the kernel; on CPU tests we run it in interpret
    # mode by monkeypatching the kernel entry
    import boosted_detr_tpu.models.layers as L
    import boosted_detr_tpu.ops.pallas_attention as PA
    orig = PA.fused_attention
    try:
        PA.fused_attention = lambda *a, **k: orig(*a, interpret=True)
        pal = MultiheadAttention(num_heads=2, use_pallas=True)
        out_pal = pal.apply(params, q, kv, kv)
    finally:
        PA.fused_attention = orig
    assert np.allclose(np.asarray(out_xla), np.asarray(out_pal), atol=1e-4)


def test_fused_attention_gradients_match_reference(rng):
    q = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 48, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 48, 32)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-3), \
            np.abs(np.asarray(a) - np.asarray(b)).max()


@pytest.mark.parametrize("tq,tk,d", [(300, 520, 64),  # straddles both blocks
                                     (256, 512, 128),  # exact block multiples
                                     (17, 1000, 32)])  # tiny q, padded d
def test_flash_backward_kernels_padded_shapes(rng, tq, tk, d):
    """The Pallas backward (dq + dk/dv kernels rebuilding p from lse) must
    mask padded query rows and kv columns exactly at non-block-multiple
    shapes."""
    q = jnp.asarray(rng.normal(size=(2, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, tk, d)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(2, tq, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) * co)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * co)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fused, g_ref):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 2e-3, (name, err)


def test_flash_backward_bf16(rng):
    """bf16 inputs: gradients come back in bf16 and close to the f32 path."""
    q = jnp.asarray(rng.normal(size=(2, 40, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 70, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 70, 64)).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) ** 2)

    g32 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g16 = jax.grad(loss, argnums=(0, 1, 2))(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16))
    for a, b in zip(g16, g32):
        assert a.dtype == jnp.bfloat16
        assert np.allclose(np.asarray(a, np.float32), np.asarray(b),
                           atol=0.15, rtol=0.1)
