"""Numerics of the fused-backward LayerNorm against pure-JAX autodiff."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4polyp_tpu.models.layers import layernorm
from ssl4polyp_tpu.ops.layernorm import layernorm2d_supported, layernorm_fused_bwd


def test_layernorm2d_supported_guard():
    # The 2-D kernels require a sublane-multiple row count (the flattened
    # stream guarantees it); layers.layernorm falls back to XLA otherwise.
    assert layernorm2d_supported(2048, 256)
    assert not layernorm2d_supported(788, 512)  # 4·197 — unpadded flatten


@pytest.mark.parametrize("shape,dtype", [
    ((4, 197, 512), jnp.float32),
    ((8, 50, 768), jnp.bfloat16),
    # Flattened (B·N, D) residual-stream variants (the 2-D kernels).
    ((512, 256), jnp.float32),
    ((1600, 768), jnp.bfloat16),
])
def test_fused_layernorm_matches_autodiff(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype=dtype)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal(shape[-1]), jnp.float32)
    dy = jnp.asarray(rng.standard_normal(shape), dtype=dtype)

    fused = functools.partial(layernorm_fused_bwd, eps=1e-6, interpret=True)

    y_ref, vjp_ref = jax.vjp(lambda *a: layernorm(*a), x, scale, bias)
    y_fused, vjp_fused = jax.vjp(fused, x, scale, bias)

    # bf16 outputs may differ by 1 ulp from reduction-order differences
    # between the in-kernel stats and XLA's lowering.
    y_tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_ref, np.float32),
        atol=y_tol, rtol=y_tol,
    )
    dx_r, ds_r, db_r = vjp_ref(dy)
    dx_f, ds_f, db_f = vjp_fused(dy)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(dx_f, np.float32), np.asarray(dx_r, np.float32),
        atol=tol, rtol=tol,
    )
    np.testing.assert_allclose(np.asarray(ds_f), np.asarray(ds_r), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("shape", [(16, 8, 256), (2048, 256)])
def test_fused_layernorm_grid_accumulation(shape):
    # More than one grid program (2048 rows → 4 programs in the 2-D case):
    # dscale/dbias must accumulate across programs, matching a
    # single-program reference.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    dy = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    fused = functools.partial(layernorm_fused_bwd, eps=1e-6, interpret=True)
    _, vjp_fused = jax.vjp(fused, x, scale, bias)
    _, vjp_ref = jax.vjp(lambda *a: layernorm(*a), x, scale, bias)
    for got, want in zip(vjp_fused(dy), vjp_ref(dy)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)
