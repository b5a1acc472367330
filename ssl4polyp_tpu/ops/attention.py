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


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    """One (batch·head) slice: q,k,v are (1, N_pad, hd) blocks in VMEM."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (N_pad, N_pad)

    n_pad = scores.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    out = jnp.dot(
        weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """Fused scaled-dot-product attention.

    Args:
        q, k, v: (B, H, N, head_dim) arrays, any float dtype.
        interpret: run the Pallas interpreter (for CPU tests).

    Returns:
        (B, H, N, head_dim) attention output in the input dtype.
    """
    B, H, N, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    n_pad = max(_round_up(N, 128), 128)
    hd_pad = max(_round_up(hd, 128), 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, hd_pad - hd)))

    qf = pad(q).reshape(B * H, n_pad, hd_pad)
    kf = pad(k).reshape(B * H, n_pad, hd_pad)
    vf = pad(v).reshape(B * H, n_pad, hd_pad)

    kernel = functools.partial(_attention_kernel, n_valid=N, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, hd_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, hd_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (B * H) * (2 * n_pad * n_pad * hd_pad),
            bytes_accessed=4 * (B * H) * n_pad * hd_pad * q.dtype.itemsize,
            transcendentals=(B * H) * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(B, H, n_pad, hd_pad)[:, :, :N, :hd]


def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain-XLA attention used for correctness checks and as CPU fallback."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=q.dtype)
