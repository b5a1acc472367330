"""Pallas LayerNorm + linear-projection kernel for the flattened stream.

The pre-norm block's first half is ``layernorm(x) @ W_qkv + b`` — XLA
materialises the normalised stream to HBM between its LN fusion and the
projection GEMM (it cannot fuse a row-reduction producer into a dot
operand).  This kernel keeps the normalised rows in VMEM: each (bm, K) row
tile holds complete feature rows, so the LN statistics are tile-local, and
the projection weights stay resident across the 1-D row grid.

Only the forward is custom; the VJP recomputes the statistics in XLA (the
same recompute XLA's own LN lowering performs) and hands the dots to the
MXU.  Reference semantics: ``nn.LayerNorm`` + ``nn.Linear`` — the timm
Block's ``norm1``/``attn.qkv`` pair (``models_mae.py:87-93``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_linear", "ln_linear_supported"]


def _ln_linear_kernel(x_ref, s_ref, t_ref, w_ref, b_ref, out_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    m = xc * jax.lax.rsqrt(var + eps)
    m = m * s_ref[:].astype(jnp.float32) + t_ref[:].astype(jnp.float32)
    out = jax.lax.dot_general(
        m.astype(x_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _block_rows(m: int, k: int, n: int, itemsize: int = 2) -> int:
    """Row-tile size dividing ``m`` under a ~13 MB double-buffered set."""
    for bm in (512, 256, 128, 64, 8):
        if m % bm:
            continue
        blocks = 2 * (bm * k + 2 * k + k * n + n + bm * n) * itemsize
        temps = bm * (k + n) * 4
        if blocks + temps <= 13 * 1024 * 1024:
            return bm
    return 0


def ln_linear_supported(m: int, k: int, n: int) -> bool:
    return _block_rows(m, k, n) > 0


def _forward(x, s, t, w, b, eps, interpret=False, block=None):
    m, k = x.shape
    n = w.shape[1]
    bm = block if block is not None else _block_rows(m, k, n)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_ln_linear_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n + 8 * m * k,
            bytes_accessed=(m * k + k * n + m * n) * x.dtype.itemsize,
            transcendentals=m,
        ),
        interpret=interpret,
    )(x, s.reshape(1, k), t.reshape(1, k), w, b.reshape(1, n))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_linear(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w: jax.Array,
    b: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
    block: "int | None" = None,
) -> jax.Array:
    """``layernorm(x) @ w + b`` for 2-D ``x``; the normalised stream stays
    in VMEM.  ``ln_scale``/``ln_bias`` are (K,) fp32."""
    return _forward(x, ln_scale, ln_bias, w, b, eps, interpret, block)


def _fwd(x, s, t, w, b, eps, interpret=False, block=None):
    out = _forward(x, s, t, w, b, eps, interpret, block)
    return out, (x, s, t, w)


def _bwd(eps, interpret, block, residuals, dy):
    x, s, t, w = residuals
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    m = (xhat * s.astype(jnp.float32) + t.astype(jnp.float32)).astype(x.dtype)

    dw = jax.lax.dot_general(
        m, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
    dm = jnp.dot(dy, w.T.astype(dy.dtype), preferred_element_type=dy.dtype)

    dm32 = dm.astype(jnp.float32)
    dscale = jnp.sum(dm32 * xhat, axis=0).astype(s.dtype)
    dbias = jnp.sum(dm32, axis=0).astype(t.dtype)
    dxhat = dm32 * s.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias, dw, db


ln_linear.defvjp(_fwd, _bwd)
