"""Fused attention over the raw fused-QKV projection output.

Profiling the ViT-B MAE step (PERF_NOTES.md) shows XLA spending more time
on attention *layout* than attention *math*: splitting (B, N, 3D) into
per-head (B, H, N, hd) tensors materialises several HBM-round-trip copies
per block, and the (N, N) score tensors travel to HBM between the matmul
and softmax.

This kernel takes the QKV projection output as-is — one (1, N_pad, 3D)
VMEM block per batch row — performs the head split, batched per-head
matmuls, masked softmax and the value contraction entirely in VMEM, and
emits the (1, N_pad, D) attention output ready for the output projection.
A custom VJP recomputes the weights in VMEM for the backward (cheap at ViT
sequence lengths) and produces the (B, N, 3D) QKV gradient directly.

Layout notes: head split uses an in-VMEM reshape + transpose to (H, N, hd)
(vector shuffles, no HBM traffic); per-head score matmuls run as one
``dot_general`` batched over H.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_qkv_attention"]


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def _head_weights(q_h, k_h, n_valid: int, scale: float, f32: bool):
    """Masked softmax weights for one head over G batch rows.

    q_h/k_h: (G, N_pad, hd) → weights (G, N_pad, N_pad) f32.
    """
    scores = jax.lax.dot_general(
        q_h, k_h,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    n_pad = scores.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=2)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    if not f32:
        scores = scores.astype(q_h.dtype).astype(jnp.float32)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    return weights / jnp.sum(weights, axis=-1, keepdims=True)


def _fwd_kernel(qkv_ref, out_ref, *, n_valid, num_heads, head_dim, scale, f32):
    # Static per-head lane slices (mosaic handles lane-offset slicing; the
    # lane→sublane reshape a head-major transpose would need is unsupported).
    # Each program covers G batch rows so the per-head matmuls run as
    # G-batched dot_generals that keep the MXU fed.
    D = num_heads * head_dim
    qkv_rows = qkv_ref[:]  # (G, N_pad, 3D)
    for h in range(num_heads):
        lo = h * head_dim
        q_h = qkv_rows[:, :, lo:lo + head_dim]
        k_h = qkv_rows[:, :, D + lo:D + lo + head_dim]
        v_h = qkv_rows[:, :, 2 * D + lo:2 * D + lo + head_dim]
        weights = _head_weights(q_h, k_h, n_valid, scale, f32)
        out_h = jax.lax.dot_general(
            weights.astype(v_h.dtype), v_h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :, lo:lo + head_dim] = out_h.astype(out_ref.dtype)


def _bwd_kernel(qkv_ref, dout_ref, dqkv_ref, *, n_valid, num_heads, head_dim, scale, f32):
    D = num_heads * head_dim
    qkv_rows = qkv_ref[:]
    for h in range(num_heads):
        lo = h * head_dim
        q_h = qkv_rows[:, :, lo:lo + head_dim]
        k_h = qkv_rows[:, :, D + lo:D + lo + head_dim]
        v_h = qkv_rows[:, :, 2 * D + lo:2 * D + lo + head_dim]
        dout_h = dout_ref[:, :, lo:lo + head_dim].astype(jnp.float32)

        weights = _head_weights(q_h, k_h, n_valid, scale, f32)  # (G, N, N) f32
        v32 = v_h.astype(jnp.float32)
        q32 = q_h.astype(jnp.float32)
        k32 = k_h.astype(jnp.float32)

        dv = jax.lax.dot_general(  # Wᵀ dO
            weights, dout_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dw = jax.lax.dot_general(  # dO Vᵀ
            dout_h, v32,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        tmp = jnp.sum(dw * weights, axis=-1, keepdims=True)
        ds = weights * (dw - tmp) * scale
        dq = jax.lax.dot_general(
            ds, k32,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(  # dSᵀ Q
            ds, q32,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, lo:lo + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, D + lo:D + lo + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * D + lo:2 * D + lo + head_dim] = dv.astype(dqkv_ref.dtype)


def _specs(rows, n_pad, width, count):
    return [
        pl.BlockSpec((rows, n_pad, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _rows_per_program(B: int, n_pad: int, threeD: int, itemsize: int) -> int:
    """Pick G so each program's VMEM working set stays well under budget."""
    for g in (32, 16, 8, 4, 2, 1):
        if B % g:
            continue
        qkv_bytes = g * n_pad * threeD * itemsize
        score_bytes = g * n_pad * n_pad * 4
        if qkv_bytes + 3 * score_bytes < 10 * 1024 * 1024:
            return g
    return 1


def _forward_impl(qkv, num_heads, interpret, softmax_f32):
    B, N, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_pad = max(_round_up(N, 8), 8)
    padded = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    rows = _rows_per_program(B, n_pad, threeD, qkv.dtype.itemsize)
    kernel = functools.partial(
        _fwd_kernel, n_valid=N, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=_specs(rows, n_pad, threeD, 1),
        out_specs=_specs(rows, n_pad, D, 1)[0],
        out_shape=jax.ShapeDtypeStruct((B, n_pad, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * n_pad * n_pad * head_dim,
            bytes_accessed=2 * B * n_pad * (threeD + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(padded)
    return out[:, :N, :]


def _backward_impl(qkv, grad_out, num_heads, interpret, softmax_f32):
    B, N, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_pad = max(_round_up(N, 8), 8)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, n_pad - N), (0, 0)))
    dout_p = jnp.pad(grad_out, ((0, 0), (0, n_pad - N), (0, 0)))
    rows = _rows_per_program(B, n_pad, threeD, qkv.dtype.itemsize)
    kernel = functools.partial(
        _bwd_kernel, n_valid=N, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    dqkv = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=_specs(rows, n_pad, threeD, 1) + _specs(rows, n_pad, D, 1),
        out_specs=_specs(rows, n_pad, threeD, 1)[0],
        out_shape=jax.ShapeDtypeStruct((B, n_pad, threeD), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * n_pad * n_pad * head_dim,
            bytes_accessed=3 * B * n_pad * (threeD + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qkv_p, dout_p)
    return dqkv[:, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention(
    qkv: jax.Array,
    num_heads: int,
    interpret: bool = False,
    softmax_f32: bool = True,
) -> jax.Array:
    """Attention directly over the fused QKV projection.

    Args:
        qkv: (B, N, 3·D) — the raw output of the QKV linear layer, laid out
            ``[q_heads | k_heads | v_heads]`` along the feature axis with
            heads contiguous inside each third (the standard fused-QKV
            reshape order).
        num_heads: number of attention heads (D % num_heads == 0).

    Returns:
        (B, N, D) attention output (pre output-projection).
    """
    return _forward_impl(qkv, num_heads, interpret, softmax_f32)


def _fwd(qkv, num_heads, interpret, softmax_f32):
    return _forward_impl(qkv, num_heads, interpret, softmax_f32), (qkv,)


def _bwd(num_heads, interpret, softmax_f32, residuals, grad_out):
    (qkv,) = residuals
    return (_backward_impl(qkv, grad_out, num_heads, interpret, softmax_f32),)


fused_qkv_attention.defvjp(_fwd, _bwd)
