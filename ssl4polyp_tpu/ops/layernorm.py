"""LayerNorm as fused Pallas kernels (forward and backward).

Profiling the MAE decoder step showed XLA's LayerNorm lowering paying for
HBM round-trips in both directions: the forward's fp32 mean/var as
``convert_reduce`` fusions (~0.18 ms/layer, 8x over bandwidth) and the
backward's scale/bias gradients as scattered ``(f32[D], f32[D])`` reduction
fusions (~1.9 ms/step).  The custom VJP here runs one Pallas kernel per
direction; the backward

* recomputes mean/rstd in fp32 on the VPU (cheaper than saving them),
* produces ``dx`` in the activation dtype, and
* accumulates ``dscale``/``dbias`` in fp32 VMEM across the sequential grid
  (constant output index map → the accumulator never leaves VMEM).

Matches the semantics of :func:`ssl4polyp_tpu.models.layers.layernorm`
(reference ``timm`` LayerNorm, ``models_mae.py:85``): fp32 statistics, affine
params consumed in fp32, output cast to the activation dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["layernorm_fused_bwd"]


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)        # (G, N, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_impl(x, scale, bias, eps, interpret):
    # XLA lowers the fp32 lane reductions of this forward into separate
    # convert+reduce fusions that round-trip fp32 intermediates through HBM
    # (~0.18 ms per layer on the MAE decoder, 8x over bandwidth); in-kernel
    # the stats never leave VMEM.
    B, N, D = x.shape
    rows = _rows_per_program(B, N, D, x.dtype.itemsize)
    const = lambda i: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * N * D,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N,
        ),
        interpret=interpret,
    )(x, scale.reshape(1, 1, D), bias.reshape(1, 1, D))


def _bwd_kernel(x_ref, dy_ref, scale_ref, dx_ref, dscale_ref, dbias_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)        # (G, N, D)
    dy = dy_ref[:].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)  # (1, 1, D)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    part_scale = jnp.sum(dy * xhat, axis=(0, 1), keepdims=True)  # (1, 1, D)
    part_bias = jnp.sum(dy, axis=(0, 1), keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += part_scale
    dbias_ref[:] += part_bias


def _rows_per_program(B: int, N: int, D: int, itemsize: int) -> int:
    for g in (16, 8, 4, 2, 1):
        if B % g:
            continue
        io = 2 * 3 * g * N * D * itemsize       # x, dy, dx double-buffered
        f32_temps = 4 * g * N * D * 4           # x32/dy32/xhat/dxhat live set
        if io + f32_temps < 12 * 1024 * 1024:
            return g
    return 1


# ---------------------------------------------------------------------------
# 2-D variants: the flattened (B·N, D) residual stream (layers.run_blocks
# auto-flatten).  Rank-2 arrays have no layout freedom, so the round-2
# objection to fused LN at large batch — {2,1,0} pins vs the batch-major
# stream — does not exist here.
# ---------------------------------------------------------------------------

def _fwd2_kernel(x_ref, scale_ref, bias_ref, y_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)        # (R, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd2_kernel(x_ref, dy_ref, scale_ref, dx_ref, dscale_ref, dbias_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)        # (R, D)
    dy = dy_ref[:].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)  # (1, D)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _rows2_per_program(M: int, D: int, itemsize: int) -> int:
    for r in (1024, 512, 256, 128, 64, 8):
        if M % r:
            continue
        io = 2 * 3 * r * D * itemsize
        f32_temps = 4 * r * D * 4
        if io + f32_temps < 12 * 1024 * 1024:
            return r
    return 0


def _fwd2_impl(x, scale, bias, eps, interpret):
    M, D = x.shape
    rows = _rows2_per_program(M, D, x.dtype.itemsize)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_fwd2_kernel, eps=eps),
        grid=(M // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * D,
            bytes_accessed=2 * M * D * x.dtype.itemsize,
            transcendentals=M,
        ),
        interpret=interpret,
    )(x, scale.reshape(1, D), bias.reshape(1, D))


def _bwd2_impl(x, dy, scale, eps, interpret):
    M, D = x.shape
    rows = _rows2_per_program(M, D, x.dtype.itemsize)
    const = lambda i: (0, 0)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd2_kernel, eps=eps),
        grid=(M // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * M * D,
            bytes_accessed=3 * M * D * x.dtype.itemsize,
            transcendentals=M,
        ),
        interpret=interpret,
    )(x, dy, scale.reshape(1, D))
    return dx, dscale.reshape(D), dbias.reshape(D)


def layernorm2d_supported(M: int, D: int, itemsize: int = 2) -> bool:
    return _rows2_per_program(M, D, itemsize) > 0


def _bwd_impl(x, dy, scale, eps, interpret):
    B, N, D = x.shape
    rows = _rows_per_program(B, N, D, x.dtype.itemsize)
    const = lambda i: (0, 0, 0)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((1, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * B * N * D,
            bytes_accessed=3 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N,
        ),
        interpret=interpret,
    )(x, dy, scale.reshape(1, 1, D))
    return dx, dscale.reshape(D), dbias.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layernorm_fused_bwd(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis of a (B, N, D) or flattened (M, D)
    activation.

    Both directions are single fused Pallas kernels; ``scale``/``bias`` are
    (D,) fp32 params.
    """
    if x.ndim == 2:
        return _fwd2_impl(x, scale, bias, eps, interpret)
    return _fwd_impl(x, scale, bias, eps, interpret)


def _fwd(x, scale, bias, eps, interpret):
    if x.ndim == 2:
        return _fwd2_impl(x, scale, bias, eps, interpret), (x, scale)
    return _fwd_impl(x, scale, bias, eps, interpret), (x, scale)


def _bwd(eps, interpret, residuals, dy):
    x, scale = residuals
    impl = _bwd2_impl if x.ndim == 2 else _bwd_impl
    dx, dscale, dbias = impl(x, dy, scale, eps, interpret)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


layernorm_fused_bwd.defvjp(_fwd, _bwd)


def layernorm_fused_view(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Fused LayerNorm on the batch-major stream's layout-matching view.

    At B ≥ 256 XLA lays (B, N, D) activations out batch-major ({2,0,1});
    the plain fused kernel pins {2,1,0} and XLA inserts relayout copies
    around every call (the −4% round-2 result that made fused LN
    auto-off at large batch).  LayerNorm is row-order-agnostic, so here
    the kernel runs on ``x.swapaxes(0,1).reshape(B, N, D)`` — a pure
    BITCAST of the {2,0,1} tensor (rows regrouped, same flat order) whose
    default layout equals the stream's physical layout — and the result
    is bitcast back.  No relayouts, same math (per-row stats; the
    dscale/dbias accumulators span all rows either way).
    """
    B, N, D = x.shape
    x_v = x.swapaxes(0, 1).reshape(B, N, D)
    y_v = layernorm_fused_bwd(x_v, scale, bias, eps, interpret)
    return y_v.reshape(N, B, D).swapaxes(0, 1)
