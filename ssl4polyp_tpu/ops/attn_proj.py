"""Fused attention + output-projection Pallas kernel (A/B candidate).

``fused_attention_proj(qkv, w, b) = attention_core(qkv) @ w + b`` — the last
untried fusion boundary around the attention core after round 4's measured
negatives (QKV-proj fold −13%, every LN/MLP fold −1.4…−5.5%,
PERF_NOTES.md).  The (B, N, D) attention-core output never touches HBM:

* forward: the head-batched (QKᵀ → masked softmax → ·V) stage of
  :mod:`ssl4polyp_tpu.ops.qkv_attention`, then the (G·N, D)×(D, D) output
  projection on the MXU inside the same program.
* backward: recomputes weights *and* the core output in VMEM, folds the
  projection backward in-kernel (``dO = dy·Wᵀ`` per program; ``dW``/``db``
  accumulated in fp32 across the sequential grid — the ``ops/layernorm.py``
  constant-index-block pattern), then runs the standard attention backward
  to emit ``dqkv`` directly.

Reference workload: the ViT/MAE attention blocks (``models_mae.py`` /
timm ``Attention``); algorithmically identical to
``layers.attention``'s kernel path + ``linear(out, p["proj"])``.

Enable via ``BENCH_ATTN_PROJ=1`` (flattened-stream Pallas path only); see
PERF_NOTES.md for the measured verdict.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssl4polyp_tpu.ops.qkv_attention import _batched_weights, _split_heads

__all__ = ["fused_attention_proj", "attn_proj_fold_enabled"]

# Test hook: force interpret mode regardless of the caller's flag, so the
# layers.attention integration (which hardcodes interpret=False for the
# production path) can run on the CPU mesh.  Read at trace time.
_FORCE_INTERPRET = False

# VMEM hard ceiling for the g=1 fallback (per-core VMEM is 16 MB; the
# estimate below already includes pipeline double-buffering).  At the
# production ViT-B shape (D=768, N=200, H=12, bf16) the backward g=1
# working set estimates ~13-15 MB — above the 10 MB *selection* budget but
# inside VMEM (measured compiling + running on v5e, PERF_NOTES round 4).
# Shapes whose g=1 estimate exceeds this raise at trace time instead of
# failing deep inside the Mosaic compiler.
_VMEM_CEILING = 16 * 1024 * 1024


def attn_proj_fold_enabled() -> bool:
    """A/B knob, read at trace time (bench sets it before import/trace)."""
    return os.environ.get("BENCH_ATTN_PROJ", "0") == "1"


def _core_out(qkv, n_valid, num_heads, head_dim, scale, f32):
    """(G, N, 3D) → attention-core output (G·N, D) + the softmax weights."""
    D = num_heads * head_dim
    G, N = qkv.shape[0], qkv.shape[1]
    q = _split_heads(qkv, 0, num_heads, head_dim)
    k = _split_heads(qkv, D, num_heads, head_dim)
    v = _split_heads(qkv, 2 * D, num_heads, head_dim)
    weights = _batched_weights(q, k, n_valid, scale, f32)
    o = jax.lax.dot_general(  # (H·G, N, hd)
        weights.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(qkv.dtype).reshape(num_heads, G, N, head_dim)
    o_cat = jnp.concatenate([o[h] for h in range(num_heads)], axis=-1)
    return o_cat.reshape(G * N, D), (q, k, v, weights)


def _fwd_kernel(qkv_ref, w_ref, b_ref, out_ref, *, n_valid, num_heads,
                head_dim, scale, f32):
    G, N = qkv_ref.shape[0], qkv_ref.shape[1]
    D = num_heads * head_dim
    o2, _ = _core_out(qkv_ref[:], n_valid, num_heads, head_dim, scale, f32)
    y = jax.lax.dot_general(
        o2, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype) + b_ref[:].astype(out_ref.dtype)
    out_ref[:] = y.reshape(G, N, D)


def _bwd_kernel(qkv_ref, w_ref, dy_ref, dqkv_ref, dw_ref, db_ref, *,
                n_valid, num_heads, head_dim, scale, f32):
    D = num_heads * head_dim
    cdtype = qkv_ref.dtype
    G, N = qkv_ref.shape[0], qkv_ref.shape[1]
    o2, (q, k, v, weights) = _core_out(
        qkv_ref[:], n_valid, num_heads, head_dim, scale, f32
    )
    dy2 = dy_ref[:].reshape(G * N, D)

    # Projection backward (in-kernel): dO = dy·Wᵀ, dW += Oᵀ·dy, db += Σdy.
    do2 = jax.lax.dot_general(
        dy2, w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)
    part_dw = jax.lax.dot_general(
        o2, dy2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    part_db = jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += part_dw
    db_ref[:] += part_db

    # Attention-core backward (ops/qkv_attention.py math, scale folded into
    # the small dq/dk outputs).
    dout = _split_heads(do2.reshape(G, N, D), 0, num_heads, head_dim)
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
    ds = (weights * (dw_scores - tmp)).astype(cdtype)
    dq = jax.lax.dot_general(
        ds, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jax.lax.dot_general(
        ds, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq = dq.reshape(num_heads, G, N, head_dim)
    dk = dk.reshape(num_heads, G, N, head_dim)
    dv = dv.reshape(num_heads, G, N, head_dim)
    for h in range(num_heads):
        lo = h * head_dim
        dqkv_ref[:, :, lo:lo + head_dim] = dq[h].astype(cdtype)
        dqkv_ref[:, :, D + lo:D + lo + head_dim] = dk[h].astype(cdtype)
        dqkv_ref[:, :, 2 * D + lo:2 * D + lo + head_dim] = dv[h].astype(cdtype)


def _working_set(g: int, n: int, num_heads: int, D: int, itemsize: int, *,
                 backward: bool) -> int:
    """Estimated VMEM bytes for a g-row program (see qkv_attention
    budgeting): double-buffered streamed io + resident W (+ fp32 grad
    accumulators in bwd) + live fp32 scores + the VMEM-only core-output
    temporaries."""
    resident = D * D * itemsize
    if backward:
        resident += D * D * 4 + D * 4
    io_width = 3 * D + D + (3 * D if backward else 0)
    io = 2 * g * n * io_width * itemsize
    temps = g * n * D * itemsize * (2 if backward else 1)  # O (+ dO)
    scores = int((2.5 if backward else 1.5) * num_heads * g * n * n * 4)
    return resident + io + temps + scores


def _pick_rows(B: int, n: int, num_heads: int, D: int, itemsize: int, *,
               backward: bool, check_ceiling: bool = True) -> int:
    """Largest G whose working set fits the 10 MB selection budget.

    When no G fits (the production ViT-B backward lands here), fall back to
    g=1 but verify the g=1 working set still fits ``_VMEM_CEILING`` so
    future shape growth fails loudly at trace time, not at Mosaic compile
    (pass ``check_ceiling=False`` for interpret mode, which has no VMEM)."""
    for g in (16, 8, 4, 2, 1):
        if B % g:
            continue
        if _working_set(g, n, num_heads, D, itemsize, backward=backward) < 10 * 1024 * 1024:
            return g
    floor = _working_set(1, n, num_heads, D, itemsize, backward=backward)
    if check_ceiling and floor > _VMEM_CEILING:
        raise ValueError(
            f"fused_attention_proj {'backward' if backward else 'forward'}: "
            f"g=1 working set ~{floor / 2**20:.1f} MB exceeds the "
            f"{_VMEM_CEILING / 2**20:.0f} MB VMEM ceiling at "
            f"(N={n}, H={num_heads}, D={D}, itemsize={itemsize}); "
            "this shape cannot compile — use the unfused path."
        )
    return 1


def _fwd_impl(qkv, w, b, num_heads, interpret, softmax_f32, valid_len):
    interpret = interpret or _FORCE_INTERPRET
    B, N, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_valid = N if valid_len is None else int(valid_len)
    rows = _pick_rows(B, N, num_heads, D, qkv.dtype.itemsize,
                      backward=False, check_ceiling=not interpret)
    kernel = functools.partial(
        _fwd_kernel, n_valid=n_valid, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    const2 = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, threeD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * head_dim + 2 * B * N * D * D,
            # read + write factor matching the sibling fused_qkv_attention
            # kernels (2× the streamed operand/output footprint).
            bytes_accessed=2 * B * N * (threeD + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv, w, b.reshape(1, D))
    return out


def _bwd_impl(qkv, w, grad_out, num_heads, interpret, softmax_f32, valid_len):
    interpret = interpret or _FORCE_INTERPRET
    B, N, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // num_heads
    scale = 1.0 / math.sqrt(head_dim)
    n_valid = N if valid_len is None else int(valid_len)
    rows = _pick_rows(B, N, num_heads, D, qkv.dtype.itemsize,
                      backward=True, check_ceiling=not interpret)
    kernel = functools.partial(
        _bwd_kernel, n_valid=n_valid, num_heads=num_heads,
        head_dim=head_dim, scale=scale, f32=softmax_f32,
    )
    const2 = lambda i: (0, 0)
    dqkv, dw, db = pl.pallas_call(
        kernel,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, N, threeD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, N, threeD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, threeD), qkv.dtype),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * N * N * head_dim + 6 * B * N * D * D,
            bytes_accessed=B * N * (2 * threeD + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv, w, grad_out)
    return dqkv, dw, db.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_attention_proj(
    qkv: jax.Array,
    w: jax.Array,
    b: jax.Array,
    num_heads: int,
    interpret: bool = False,
    softmax_f32: bool = True,
    valid_len=None,
) -> jax.Array:
    """``attention_core(qkv) @ w + b`` with the core output VMEM-resident.

    Args:
        qkv: (B, N, 3·D) fused QKV projection output (see
            ``fused_qkv_attention`` for the head layout and masking rules).
        w: (D, D) output-projection weight, compute dtype.
        b: (D,) output-projection bias, compute dtype.
        num_heads: attention head count (D % num_heads == 0).
        valid_len: optional true sequence length; keys at positions
            ≥ valid_len are masked out of the softmax.  Pad-row outputs are
            garbage-but-finite and their upstream grads are zero (callers
            slice them away), so the in-kernel dW/db accumulation receives
            exact zero contributions from pad rows.

    Returns:
        (B, N, D) projected attention output (the full attention sublayer
        result, pre residual-add).
    """
    return _fwd_impl(qkv, w, b, num_heads, interpret, softmax_f32, valid_len)


def _vjp_fwd(qkv, w, b, num_heads, interpret, softmax_f32, valid_len):
    out = _fwd_impl(qkv, w, b, num_heads, interpret, softmax_f32, valid_len)
    # b rides along in the residuals only for its dtype: the bias cotangent
    # must match the bias's own dtype even if it ever differs from w's.
    return out, (qkv, w, b)


def _vjp_bwd(num_heads, interpret, softmax_f32, valid_len, residuals, grad_out):
    qkv, w, b = residuals
    dqkv, dw, db = _bwd_impl(
        qkv, w, grad_out, num_heads, interpret, softmax_f32, valid_len
    )
    return dqkv, dw.astype(w.dtype), db.astype(b.dtype)


fused_attention_proj.defvjp(_vjp_fwd, _vjp_bwd)
