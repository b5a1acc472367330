"""Pallas fused-attention kernel vs plain-XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssl4polyp_tpu.ops.attention import fused_attention, reference_attention


def test_fused_attention_matches_reference():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # Deliberately non-aligned N (like ViT's 197) and small head dim.
    B, H, N, hd = 2, 3, 197, 64
    q = jax.random.normal(kq, (B, H, N, hd), dtype=jnp.float32)
    k = jax.random.normal(kk, (B, H, N, hd), dtype=jnp.float32)
    v = jax.random.normal(kv, (B, H, N, hd), dtype=jnp.float32)
    expected = reference_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_fused_attention_row_independence():
    """Padding keys must not leak: compare against a sliced smaller problem."""
    key = jax.random.PRNGKey(1)
    B, H, N, hd = 1, 1, 130, 8
    q = jax.random.normal(key, (B, H, N, hd))
    k = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, hd))
    v = jax.random.normal(jax.random.PRNGKey(3), (B, H, N, hd))
    full = fused_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_attention_gradients_match():
    """Custom VJP must agree with autodiff through the XLA reference."""
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, N, hd = 1, 2, 37, 16
    q = jax.random.normal(kq, (B, H, N, hd))
    k = jax.random.normal(kk, (B, H, N, hd))
    v = jax.random.normal(kv, (B, H, N, hd))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(fused_attention(q, k, v, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(reference_attention(q, k, v)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
