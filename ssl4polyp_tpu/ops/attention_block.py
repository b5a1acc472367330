"""Fully-fused QKV-projection + attention Pallas kernel.

``fused_qkvproj_attention(x, w, b) = attention(x @ w + b)`` with the QKV
tensor living only in VMEM:

* forward: per G-row program, ``qkv = x·W + b`` on the MXU, then the
  head-batched (QKᵀ → masked softmax → ·V) stage of
  :mod:`ssl4polyp_tpu.ops.qkv_attention` — the (B, N, 3D) QKV tensor is
  never materialised in HBM, and the custom call's {2,1,0} operand is the
  narrow (B, N, D) activation instead of the 3×-wide projection (XLA's
  batch-major stream layout forced a physical relayout in front of the
  kernel: 18 ms/step decoder + 4.4 encoder at batch 256, round-3 trace).
* backward: recomputes ``qkv`` from the saved ``x`` (one extra MXU dot —
  cheaper than round-tripping 155 MB through HBM), runs the attention
  backward in VMEM, then folds the projection backward in-kernel:
  ``dx = dqkv·Wᵀ`` per program, ``dW``/``db`` accumulated in fp32 across
  the sequential grid (constant-index output blocks, the
  ``ops/layernorm.py`` accumulator pattern).

Reference workload: MAE ViT-B/16 (``models_mae.py`` attention blocks);
algorithmically identical to ``layers.attention``'s einsum path.

**Measured NEGATIVE on v5e at the ViT-B operating point** (batch 256:
1451 img/s vs 1676 for the bare-dot + ``fused_qkv_bias_attention`` path):
splitting the monolithic (B·N, D)×(D, 3D) projection into per-program
dots costs more MXU efficiency than the avoided QKV relayout + HBM
round-trips win back.  Kept as an available, parity-tested implementation
— the trade flips for shapes where the relayout dominates (longer
sequences, narrower widths) or on platforms without XLA's batch-major
layout preference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl4polyp_tpu.ops.qkv_attention import _batched_weights, _split_heads

__all__ = ["fused_qkvproj_attention"]


def _project(x_ref, w_ref, b_ref):
    """(G, N, Din) × (Din, 3D) + (1, 3D) → (G, N, 3D) in VMEM."""
    g, n, d_in = x_ref.shape
    x2 = x_ref[:].reshape(g * n, d_in)
    qkv2 = jax.lax.dot_general(
        x2, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_ref.dtype) + b_ref[:]
    return qkv2.reshape(g, n, qkv2.shape[-1])


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, n_valid, num_heads, head_dim,
                scale, f32):
    D = num_heads * head_dim
    qkv = _project(x_ref, w_ref, b_ref)
    G, N = qkv.shape[0], qkv.shape[1]
    q = _split_heads(qkv, 0, num_heads, head_dim)
    k = _split_heads(qkv, D, num_heads, head_dim)
    v = _split_heads(qkv, 2 * D, num_heads, head_dim)
    weights = _batched_weights(q, k, n_valid, scale, f32)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype).reshape(num_heads, G, N, head_dim)
    for h in range(num_heads):
        out_ref[:, :, h * head_dim:(h + 1) * head_dim] = out[h]


def _bwd_kernel(x_ref, w_ref, b_ref, dout_ref, dx_ref, dw_ref, db_ref, *,
                n_valid, num_heads, head_dim, scale, f32):
    D = num_heads * head_dim
    cdtype = x_ref.dtype
    qkv = _project(x_ref, w_ref, b_ref)          # recomputed, VMEM-only
    G, N = qkv.shape[0], qkv.shape[1]
    q = _split_heads(qkv, 0, num_heads, head_dim)
    k = _split_heads(qkv, D, num_heads, head_dim)
    v = _split_heads(qkv, 2 * D, num_heads, head_dim)
    dout = _split_heads(dout_ref[:], 0, num_heads, head_dim)

    weights = _batched_weights(q, k, n_valid, scale, f32)
    w_c = weights.astype(cdtype)

    dv = jax.lax.dot_general(
        w_c, dout,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dw_scores = jax.lax.dot_general(
        dout, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    tmp = jnp.sum(dw_scores * weights, axis=-1, keepdims=True)
    ds = (weights * (dw_scores - tmp) * scale).astype(cdtype)
    dq = jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq = dq.reshape(num_heads, G, N, head_dim)
    dk = dk.reshape(num_heads, G, N, head_dim)
    dv = dv.reshape(num_heads, G, N, head_dim)
    parts = []
    for h in range(num_heads):
        parts.append(dq[h].astype(cdtype))
    for h in range(num_heads):
        parts.append(dk[h].astype(cdtype))
    for h in range(num_heads):
        parts.append(dv[h].astype(cdtype))
    dqkv = jnp.concatenate(parts, axis=-1)        # (G, N, 3D), VMEM-only
    dqkv2 = dqkv.reshape(G * N, 3 * D)

    # Projection backward, folded in-kernel.
    x2 = x_ref[:].reshape(G * N, x_ref.shape[2])
    dx2 = jax.lax.dot_general(                    # dqkv · Wᵀ
        dqkv2, w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx2.astype(dx_ref.dtype).reshape(x_ref.shape)

    part_dw = jax.lax.dot_general(                # xᵀ · dqkv
        x2, dqkv2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part_db = jnp.sum(dqkv2.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += part_dw
    db_ref[:] += part_db


def _pick_rows(B: int, n: int, num_heads: int, d_in: int, three_d: int,
               itemsize: int, *, backward: bool) -> int:
    """Largest G whose VMEM working set fits: streamed io double-buffered,
    resident W (+ grad accumulators in bwd), live f32 score copies and the
    VMEM-only qkv/dqkv temporaries."""
    d_out = three_d // 3
    resident = d_in * three_d * itemsize          # W
    if backward:
        resident += d_in * three_d * 4            # dW accumulator (f32)
    for g in (8, 4, 2, 1):
        if B % g:
            continue
        io_width = d_in + d_out + (d_in if backward else 0)
        io = 2 * g * n * io_width * itemsize
        temps = g * n * three_d * itemsize * (2 if backward else 1)  # qkv/dqkv
        scores = int((2.5 if backward else 1.5) * num_heads * g * n * n * 4)
        if resident + io + temps + scores < 10 * 1024 * 1024:
            return g
    return 1


def _fwd_impl(x, w, b, num_heads, interpret, softmax_f32, valid_len):
    B, N, d_in = x.shape
    three_d = w.shape[1]
    D = three_d // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_valid = N if valid_len is None else int(valid_len)
    rows = _pick_rows(B, N, num_heads, d_in, three_d, x.dtype.itemsize,
                      backward=False)
    kernel = functools.partial(
        _fwd_kernel, n_valid=n_valid, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    const2 = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, d_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, three_d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_d), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * d_in * three_d
            + 4 * B * num_heads * N * N * head_dim,
            bytes_accessed=B * N * (d_in + D) * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, three_d))
    return out


def _bwd_impl(x, w, b, grad_out, num_heads, interpret, softmax_f32, valid_len):
    B, N, d_in = x.shape
    three_d = w.shape[1]
    D = three_d // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_valid = N if valid_len is None else int(valid_len)
    rows = _pick_rows(B, N, num_heads, d_in, three_d, x.dtype.itemsize,
                      backward=True)
    kernel = functools.partial(
        _bwd_kernel, n_valid=n_valid, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    const2 = lambda i: (0, 0)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, d_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, three_d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, N, d_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, three_d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, three_d), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d_in), x.dtype),
            jax.ShapeDtypeStruct((d_in, three_d), jnp.float32),
            jax.ShapeDtypeStruct((1, three_d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * d_in * three_d
            + 10 * B * num_heads * N * N * head_dim,
            bytes_accessed=B * N * (2 * d_in + D) * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(x, w, b.reshape(1, three_d), grad_out)
    return dx, dw, db.reshape(three_d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_qkvproj_attention(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    num_heads: int,
    interpret: bool = False,
    softmax_f32: bool = True,
    valid_len=None,
) -> jax.Array:
    """``attention(x @ w + b)`` with QKV resident in VMEM only.

    Args:
        x: (B, N, D_in) activations (post-LN residual-stream slice).
        w: (D_in, 3·D) fused QKV projection weight, compute dtype.
        b: (3·D,) projection bias, compute dtype.
        num_heads: attention head count (D % num_heads == 0).
        valid_len: optional true sequence length; keys at positions
            ≥ valid_len are masked out of the softmax (see
            ``fused_qkv_attention``).

    Returns:
        (B, N, D) attention output (pre output-projection).
    """
    return _fwd_impl(x, w, b, num_heads, interpret, softmax_f32, valid_len)


def _vjp_fwd(x, w, b, num_heads, interpret, softmax_f32, valid_len):
    out = _fwd_impl(x, w, b, num_heads, interpret, softmax_f32, valid_len)
    return out, (x, w, b)


def _vjp_bwd(num_heads, interpret, softmax_f32, valid_len, residuals, grad_out):
    x, w, b = residuals
    dx, dw, db = _bwd_impl(
        x, w, b, grad_out, num_heads, interpret, softmax_f32, valid_len
    )
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


fused_qkvproj_attention.defvjp(_vjp_fwd, _vjp_bwd)
