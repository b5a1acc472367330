"""Pallas fc1+GELU kernel for the transformer MLP's first linear.

Motivation (PERF_NOTES.md round 3): XLA fuses the fc1 GEMM with its exact
(erf) GELU epilogue into one "EmitAllBatchInSublanes" convolution fusion
whose own cost model prices it at ~3x the bare-dot ideal — the erf
polynomial serialises on the VPU behind every MXU window.  This kernel
computes the same contract — both the pre-activation ``h`` (the backward
residual XLA also materialises) and ``gelu(h)`` — as a blocked GEMM whose
erf epilogue the Mosaic VLIW scheduler can overlap with the next block's
MXU work.

Only the forward is custom: the VJP recomputes nothing and hands the saved
``h`` to the standard XLA backward dots (reference semantics:
``timm.Mlp``/``nn.GELU`` exact erf — ``models_mae.py:87-93``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fc1_gelu", "fc1_supported",
    "mlp_fused", "mlp_fused_supported",
    "mlp_ln_fused",
]

_SQRT_HALF = 1.0 / math.sqrt(2.0)

# Degree-12 Chebyshev series for erf(√t)/√t in t = u² on [0, 12.1124...]
# (u = h/√2, |h| ≤ 4.921875), with the tail handled by clipping
# s = u·P(min(t, T_HI)) into [-1, 1]: past the fit domain s grows linearly
# through ±1 exactly where erf has saturated.  Evaluated by the Clenshaw
# recurrence IN THE CHEBYSHEV BASIS — the equivalent monomial Horner form
# loses 100× to fp32 cancellation near the domain edge (measured 2.6e-4
# erf error at h≈4.9 vs 8.8e-7 for Clenshaw).  Max |gelu error| over ALL h
# is 2.2e-6 in fp32 — below the fp32 parity-test bar (1e-5) and three
# orders under bf16 resolution.  Unlike Abramowitz–Stegun 7.1.26 this form
# needs no exp, reciprocal, abs or sign — ~26 FMAs and a clamp on the VPU.
_GELU_T_HI = 12.112426757812498
_GELU_CHEB = (
    0.5325114418771747, -0.3489674870925125, 0.1479064719167942,
    -0.0617988491137132, 0.024232588386997114, -0.008784606555555297,
    0.0029320127710061785, -0.0009012691671282702, 0.0002557850796751256,
    -6.717091146860724e-05, 1.641477783598476e-05, -3.660084442918706e-06,
    7.829529540258299e-07,
)


def _erf_over_u(t):
    """P(t) ≈ erf(√t)/√t for t clamped into the fit domain (fp32 Clenshaw)."""
    t = jnp.minimum(t, _GELU_T_HI)
    xp = jnp.float32(2.0 / _GELU_T_HI) * t + jnp.float32(-1.0)
    x2 = 2.0 * xp
    b1 = jnp.zeros_like(xp)
    b2 = jnp.zeros_like(xp)
    for c in _GELU_CHEB[:0:-1]:
        b1, b2 = x2 * b1 - b2 + jnp.float32(c), b1
    return xp * b1 - b2 + jnp.float32(_GELU_CHEB[0])


def _erf_sqrt_half(h):
    """clip-tailed erf(h/√2) via the polynomial (fp32 in, fp32 out)."""
    u = h * _SQRT_HALF
    return jnp.clip(u * _erf_over_u(u * u), -1.0, 1.0)


def _fc1_kernel(x_ref, w_ref, b_ref, h_ref, y_ref):
    h = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)
    y = 0.5 * h * (1.0 + _erf_sqrt_half(h))
    y_ref[:] = y.astype(y_ref.dtype)


def _block_sizes(m: int, k: int, nf: int, itemsize: int = 2) -> tuple[int, int]:
    """Pick (bm, bn) dividing (m, nf) under a ~14 MB double-buffered set.

    bm=512/bn=2048 measured best at the decoder's (51200, 512, 2048)
    (2.381 vs 2.451 for bn=1024 in the chained harness); preference order
    reflects that sweep.
    """
    for bm in (512, 256, 128, 64, 8):
        if m % bm:
            continue
        for bn in (2048, 1024, 512, 256, 128):
            if nf % bn:
                continue
            vmem = 2 * (bm * k + k * bn + 2 * bm * bn + bn) * itemsize
            if vmem <= 14 * 1024 * 1024:
                return bm, bn
    return 0, 0


def fc1_supported(m: int, k: int, nf: int) -> bool:
    """Whether the kernel's grid tiles these dimensions."""
    return _block_sizes(m, k, nf) != (0, 0)


def _forward(x, w, b, interpret=False):
    m, k = x.shape
    nf = w.shape[1]
    bm, bn = _block_sizes(m, k, nf)
    return pl.pallas_call(
        _fc1_kernel,
        grid=(m // bm, nf // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, nf), x.dtype),
            jax.ShapeDtypeStruct((m, nf), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * nf,
            bytes_accessed=(m * k + k * nf + 2 * m * nf) * x.dtype.itemsize,
            transcendentals=m * nf,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, nf))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fc1_gelu(x: jax.Array, w: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    """``gelu(x @ w + b)`` (exact erf GELU) for 2-D ``x``.

    Usable when the row and feature counts tile the TPU grid
    (``_block_sizes`` finds divisors); callers fall back to the XLA path
    otherwise.  Gradients match ``jax.nn.gelu(approximate=False)``.
    """
    _, y = _forward(x, w, b, interpret)
    return y


def _fwd(x, w, b, interpret=False):
    h, y = _forward(x, w, b, interpret)
    return y, (x, w, h)


def _bwd(interpret, residuals, dy):
    x, w, h = residuals
    h32 = h.astype(jnp.float32)
    # d/dh gelu(h) = Phi(h) + h phi(h).  Phi uses the same clip-tailed
    # Clenshaw erf as the forward kernel (XLA's erf is a ~20-op rational
    # with a divide); phi keeps the true exp.  Max |dgelu error| 4.4e-7.
    phi = jnp.exp(-0.5 * h32 * h32) * (1.0 / math.sqrt(2.0 * math.pi))
    dgelu = 0.5 * (1.0 + _erf_sqrt_half(h32)) + h32 * phi
    dh = (dy.astype(jnp.float32) * dgelu).astype(dy.dtype)
    dx = jnp.dot(dh, w.T.astype(dh.dtype), preferred_element_type=dh.dtype)
    dw = jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    db = jnp.sum(dh.astype(jnp.float32), axis=0).astype(dh.dtype)
    return dx, dw, db


fc1_gelu.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fully-fused MLP: fc1 + GELU + fc2 in one kernel.
#
# The fc1 kernel above still materialises gelu(h) to HBM and fc2 reads it
# back; at the MAE decoder's flattened shapes (M=51200, NF=2048, bf16) that
# is ~420 MB/block of forward HBM traffic for an intermediate that never
# needed to exist.  This kernel keeps gelu(h) in VMEM and contracts it with
# W2 on the spot, emitting only the (M, K) output and the pre-activation
# ``h`` (the backward residual).  fc2's contraction is tiled over NF with an
# fp32 VMEM scratch accumulator across the sequential minor grid dimension.
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, h_ref, out_ref, acc_ref):
    j = pl.program_id(1)
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)
    g = 0.5 * h * (1.0 + _erf_sqrt_half(h))
    part = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        out_ref[:] = (
            acc_ref[:] + b2_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)


def _mlp_block_sizes(m: int, k: int, nf: int, itemsize: int = 2) -> tuple[int, int]:
    """Pick (bm, bn) dividing (m, nf) under a ~13 MB double-buffered set.

    Budget counts double-buffered blocks (x, w1, b1, w2, h, out), the fp32
    accumulator scratch and the live fp32 h/gelu temporaries.
    """
    for bm in (512, 256, 128, 64, 8):
        if m % bm:
            continue
        for bn in (2048, 1536, 1024, 512, 256, 128):
            if nf % bn:
                continue
            blocks = 2 * (bm * k + k * bn + bn + bn * k + bm * bn + bm * k) * itemsize
            scratch = bm * k * 4
            temps = 2 * bm * bn * 4
            if blocks + scratch + temps <= 13 * 1024 * 1024:
                return bm, bn
    return 0, 0


def mlp_fused_supported(m: int, k: int, nf: int) -> bool:
    """Whether the fused-MLP kernel's grid tiles these dimensions."""
    return _mlp_block_sizes(m, k, nf) != (0, 0)


def _mlp_forward(x, w1, b1, w2, b2, interpret=False, block=None):
    m, k = x.shape
    nf = w1.shape[1]
    bm, bn = block if block is not None else _mlp_block_sizes(m, k, nf)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(m // bm, nf // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, nf), x.dtype),
            jax.ShapeDtypeStruct((m, k), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * nf,
            bytes_accessed=(2 * m * k + 2 * k * nf + m * nf) * x.dtype.itemsize,
            transcendentals=m * nf,
        ),
        interpret=interpret,
    )(x, w1, b1.reshape(1, nf), w2, b2.reshape(1, k))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def mlp_fused(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    interpret: bool = False,
    block: "tuple[int, int] | None" = None,
) -> jax.Array:
    """``gelu(x @ w1 + b1) @ w2 + b2`` (exact erf GELU) for 2-D ``x``.

    One Pallas kernel; gelu(h) never touches HBM.  The VJP hands the saved
    pre-activation ``h`` to standard XLA backward dots, recomputing gelu(h)
    elementwise (it fuses into the dW2 dot operand).  Reference semantics:
    ``timm.Mlp`` — ``models_mae.py:87-93``.
    """
    _, out = _mlp_forward(x, w1, b1, w2, b2, interpret, block)
    return out


def _mlp_fwd(x, w1, b1, w2, b2, interpret=False, block=None):
    h, out = _mlp_forward(x, w1, b1, w2, b2, interpret, block)
    return out, (x, w1, w2, h)


def _mlp_bwd(interpret, block, residuals, dy):
    x, w1, w2, h = residuals
    h32 = h.astype(jnp.float32)
    erf = _erf_sqrt_half(h32)
    g = (0.5 * h32 * (1.0 + erf)).astype(dy.dtype)
    dw2 = jax.lax.dot_general(
        g, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
    dg = jnp.dot(dy, w2.T.astype(dy.dtype), preferred_element_type=dy.dtype)
    phi = jnp.exp(-0.5 * h32 * h32) * (1.0 / math.sqrt(2.0 * math.pi))
    dgelu = 0.5 * (1.0 + erf) + h32 * phi
    dh = (dg.astype(jnp.float32) * dgelu).astype(dy.dtype)
    dx = jnp.dot(dh, w1.T.astype(dh.dtype), preferred_element_type=dh.dtype)
    dw1 = jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0).astype(dh.dtype)
    return dx, dw1, db1, dw2, db2


mlp_fused.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# LN + MLP in one kernel: the pre-norm block's second half
# (``x + mlp(layernorm(x))``'s inner chain) without materialising the
# normalised stream.  Each (bm, K) row tile holds complete feature rows, so
# the LN statistics are local to the tile; the backward recomputes them in
# XLA (the same recompute XLA's own LN lowering performs).
# ---------------------------------------------------------------------------


def _mlp_ln_kernel(
    x_ref, s_ref, t_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    h_ref, out_ref, acc_ref, *, eps,
):
    j = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    m = xc * jax.lax.rsqrt(var + eps)
    m = m * s_ref[:].astype(jnp.float32) + t_ref[:].astype(jnp.float32)
    h = jax.lax.dot_general(
        m.astype(x_ref.dtype), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)
    g = 0.5 * h * (1.0 + _erf_sqrt_half(h))
    part = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        # Residual folded in: x is already resident in VMEM, so the block's
        # ``x + mlp(ln(x))`` add costs nothing extra here, while a separate
        # XLA add would re-read both operands from HBM.
        out_ref[:] = (
            x + acc_ref[:] + b2_ref[:].astype(jnp.float32)
        ).astype(out_ref.dtype)


def _mlp_ln_forward(x, s, t, w1, b1, w2, b2, eps, interpret=False, block=None):
    m, k = x.shape
    nf = w1.shape[1]
    bm, bn = block if block is not None else _mlp_block_sizes(m, k, nf)
    row = lambda i, j: (i, 0)
    return pl.pallas_call(
        functools.partial(_mlp_ln_kernel, eps=eps),
        grid=(m // bm, nf // bn),
        in_specs=[
            pl.BlockSpec((bm, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, nf), x.dtype),
            jax.ShapeDtypeStruct((m, k), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * nf + 8 * m * k,
            bytes_accessed=(2 * m * k + 2 * k * nf + m * nf) * x.dtype.itemsize,
            transcendentals=m * nf + m,
        ),
        interpret=interpret,
    )(x, s.reshape(1, k), t.reshape(1, k), w1, b1.reshape(1, nf),
      w2, b2.reshape(1, k))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_ln_fused(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
    block: "tuple[int, int] | None" = None,
) -> jax.Array:
    """``x + gelu(layernorm(x) @ w1 + b1) @ w2 + b2`` in one kernel
    (2-D ``x``) — the full pre-norm MLP half-block INCLUDING its residual.

    The normalised stream never touches HBM in the forward; the backward
    recomputes the LN statistics and ``gelu(h)`` in XLA from the saved
    ``x``/``h``.  ``ln_scale``/``ln_bias`` are (K,) fp32.  Shape support is
    :func:`mlp_fused_supported`.
    """
    _, out = _mlp_ln_forward(x, ln_scale, ln_bias, w1, b1, w2, b2,
                             eps, interpret, block)
    return out


def _mlp_ln_fwd(x, s, t, w1, b1, w2, b2, eps, interpret=False, block=None):
    h, out = _mlp_ln_forward(x, s, t, w1, b1, w2, b2, eps, interpret, block)
    return out, (x, s, t, w1, w2, h)


def _mlp_ln_bwd(eps, interpret, block, residuals, dy):
    x, s, t, w1, w2, h = residuals
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    m = (xhat * s.astype(jnp.float32) + t.astype(jnp.float32)).astype(x.dtype)

    h32 = h.astype(jnp.float32)
    erf = _erf_sqrt_half(h32)
    g = (0.5 * h32 * (1.0 + erf)).astype(dy.dtype)
    dw2 = jax.lax.dot_general(
        g, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
    dg = jnp.dot(dy, w2.T.astype(dy.dtype), preferred_element_type=dy.dtype)
    phi = jnp.exp(-0.5 * h32 * h32) * (1.0 / math.sqrt(2.0 * math.pi))
    dgelu = 0.5 * (1.0 + erf) + h32 * phi
    dh = (dg.astype(jnp.float32) * dgelu).astype(dy.dtype)
    dm = jnp.dot(dh, w1.T.astype(dh.dtype), preferred_element_type=dh.dtype)
    dw1 = jax.lax.dot_general(
        m, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0).astype(dh.dtype)

    dm32 = dm.astype(jnp.float32)
    dscale = jnp.sum(dm32 * xhat, axis=0).astype(s.dtype)
    dbias = jnp.sum(dm32, axis=0).astype(t.dtype)
    dxhat = dm32 * s.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    # + dy: the identity path of the folded residual.
    dx = (rstd * (dxhat - m1 - xhat * m2) + dy.astype(jnp.float32)).astype(x.dtype)
    return dx, dscale, dbias, dw1, db1, dw2, db2


mlp_ln_fused.defvjp(_mlp_ln_fwd, _mlp_ln_bwd)
