"""Fused multi-head attention kernel for short ViT sequences.

ViT-B/16 at 224² has a 197-token sequence (196 patches + cls) and 64-dim
heads — tiny by flash-attention standards.  The whole (N, N) score matrix for
one head fits comfortably in VMEM, so the right TPU kernel is a *single-pass*
fusion: QKᵀ → bias-free masked softmax → ·V without ever materialising the
scores in HBM.  Online/blockwise softmax (flash attention) would only add
bookkeeping at this sequence length.

Shapes are padded to MXU-friendly multiples of 128 on the sequence axis; the
padding columns are masked to -inf before the softmax, and padded query rows
are sliced away on return.

Numerics: inputs may be bf16; scores and softmax accumulate in fp32; the
output is cast back to the input dtype.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention"]


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def _softmax_weights(q, k, n_valid: int, scale: float):
    """fp32 masked softmax weights for one (batch·head) slice."""
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    n_pad = scores.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    return weights / jnp.sum(weights, axis=-1, keepdims=True)


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    """One (batch·head) slice: q,k,v are (1, N_pad, hd) blocks in VMEM."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    weights = _softmax_weights(q, k, n_valid, scale)
    out = jnp.dot(
        weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _attention_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, n_valid: int, scale: float,
):
    """Fused backward for one slice: recomputes the softmax weights in VMEM.

    With W = softmax(QKᵀ·s):  dV = Wᵀ·dO;  dW = dO·Vᵀ;
    dS = W ∘ (dW − rowsum(dW ∘ W))·s;  dQ = dS·K;  dK = dSᵀ·Q.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    weights = _softmax_weights(q, k, n_valid, scale)  # (N, N) fp32

    dv = jax.lax.dot_general(
        weights, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # Wᵀ dO
    dw = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    tmp = jnp.sum(dw * weights, axis=-1, keepdims=True)
    ds = weights * (dw - tmp) * scale
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # dSᵀ Q
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_flatten(x, n_pad, hd_pad):
    B, H, N, hd = x.shape
    padded = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, hd_pad - hd)))
    return padded.reshape(B * H, n_pad, hd_pad)


def _block_specs(n_pad, hd_pad, count):
    return [
        pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _forward_impl(q, k, v, interpret):
    B, H, N, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    n_pad = max(_round_up(N, 128), 128)
    hd_pad = max(_round_up(hd, 128), 128)
    qf = _pad_flatten(q, n_pad, hd_pad)
    kf = _pad_flatten(k, n_pad, hd_pad)
    vf = _pad_flatten(v, n_pad, hd_pad)
    kernel = functools.partial(_attention_kernel, n_valid=N, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=_block_specs(n_pad, hd_pad, 3),
        out_specs=_block_specs(n_pad, hd_pad, 1)[0],
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, hd_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (B * H) * (2 * n_pad * n_pad * hd_pad),
            bytes_accessed=4 * (B * H) * n_pad * hd_pad * q.dtype.itemsize,
            transcendentals=(B * H) * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, n_pad, hd_pad)[:, :, :N, :hd]


def _backward_impl(q, k, v, grad_out, interpret):
    B, H, N, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    n_pad = max(_round_up(N, 128), 128)
    hd_pad = max(_round_up(hd, 128), 128)
    operands = [_pad_flatten(t, n_pad, hd_pad) for t in (q, k, v, grad_out)]
    kernel = functools.partial(_attention_bwd_kernel, n_valid=N, scale=scale)
    shape = jax.ShapeDtypeStruct((B * H, n_pad, hd_pad), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=_block_specs(n_pad, hd_pad, 4),
        out_specs=_block_specs(n_pad, hd_pad, 3),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=5 * (B * H) * (2 * n_pad * n_pad * hd_pad),
            bytes_accessed=7 * (B * H) * n_pad * hd_pad * q.dtype.itemsize,
            transcendentals=(B * H) * n_pad * n_pad,
        ),
        interpret=interpret,
    )(*operands)

    def unpad(t):
        return t.reshape(B, H, n_pad, hd_pad)[:, :, :N, :hd]

    return unpad(dq), unpad(dk), unpad(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """Fused scaled-dot-product attention with a fused custom backward.

    Args:
        q, k, v: (B, H, N, head_dim) arrays, any float dtype.
        interpret: run the Pallas interpreter (for CPU tests).

    Returns:
        (B, H, N, head_dim) attention output in the input dtype.

    The backward pass recomputes the softmax weights in VMEM (cheap at ViT
    sequence lengths) instead of saving the (N, N) weight matrices — the
    flash-attention memory story without the online-softmax machinery.
    """
    return _forward_impl(q, k, v, interpret)


def _fused_attention_fwd(q, k, v, interpret):
    return _forward_impl(q, k, v, interpret), (q, k, v)


def _fused_attention_bwd(interpret, residuals, grad_out):
    q, k, v = residuals
    return _backward_impl(q, k, v, grad_out, interpret)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain-XLA attention used for correctness checks and as CPU fallback."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=q.dtype)
