"""Shared functional layers: layernorm, MLP, attention, stacked blocks.

Design notes (TPU-first):

* Parameters are plain dicts of ``jnp.ndarray``; per-block tensors are
  stacked along a leading ``depth`` axis and consumed by ``lax.scan``.
* Compute runs in a configurable dtype (bf16 by default on TPU) while
  parameters and layer-norm statistics stay in fp32 — the standard
  mixed-precision recipe for MXU-bound transformer stacks.
* Attention uses a single fused QKV projection (one big matmul for the MXU)
  and either an XLA einsum path or the Pallas fused-attention kernel from
  :mod:`ssl4polyp_tpu.ops.attention`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialisers (matching the reference init scheme: xavier-uniform linears,
# zero biases, unit layernorm — models_mae.py:85-93)
# ---------------------------------------------------------------------------

def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def trunc_normal(key: jax.Array, shape, std=0.02, dtype=jnp.float32) -> jax.Array:
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_linear(key: jax.Array, d_in: int, d_out: int, stack: Optional[int] = None) -> Params:
    if stack is None:
        kernel = xavier_uniform(key, (d_in, d_out))
        bias = jnp.zeros((d_out,))
    else:
        keys = jax.random.split(key, stack)
        kernel = jnp.stack([xavier_uniform(k, (d_in, d_out)) for k in keys])
        bias = jnp.zeros((stack, d_out))
    return {"kernel": kernel, "bias": bias}


def init_layernorm(dim: int, stack: Optional[int] = None) -> Params:
    shape = (dim,) if stack is None else (stack, dim)
    return {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)}


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def cast_params_for_compute(params: Params, dtype) -> Params:
    """One-pass cast of matrix-shaped fp32 leaves to the compute dtype.

    Casting the full stacked parameter tree once per step replaces the
    per-layer per-use ``astype`` converts XLA otherwise materialises in both
    forward and backward (measured ~7 ms/step of pathological small-fusion
    time on ViT-B).  1-D leaves (biases, norm scales) stay fp32 — layernorm
    reads them in fp32 anyway and their casts are trivial.
    Gradients flow through the cast unchanged in structure: the transpose of
    a convert is a convert, so parameter gradients still arrive in fp32.
    """
    if dtype == jnp.float32:
        return params

    def leaf(path, p):
        if keep_f32_leaf(path, p):
            return p
        return p.astype(dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


_KEEP_F32 = {"ln1", "ln2", "norm", "scale", "bias"}


def keep_f32_leaf(path, p) -> bool:
    """Whether :func:`cast_params_for_compute` leaves this leaf in fp32.

    Layernorm affine params (consumed in fp32) and sub-2-D leaves stay fp32.
    """
    if any(getattr(k, "key", None) in _KEEP_F32 for k in path):
        return True
    return not (
        hasattr(p, "dtype") and p.dtype == jnp.float32 and getattr(p, "ndim", 0) >= 2
    )


def layernorm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
    fused: bool = False,
) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of compute dtype.

    With ``fused`` (and a TPU backend, 3-D activations) the backward pass
    runs as a single Pallas kernel per layer instead of XLA's scattered
    param-grad reduction fusions (see :mod:`ssl4polyp_tpu.ops.layernorm`).
    """
    if fused and x.ndim in (2, 3) and jax.default_backend() != "cpu":
        from ssl4polyp_tpu.ops.layernorm import (
            layernorm2d_supported,
            layernorm_fused_bwd,
        )

        # (Round-3 negative result: ops/layernorm.py::layernorm_fused_view
        # runs the kernel on the batch-major stream's bitcast view hoping
        # to dodge the {2,1,0} layout pin — measured 1543 vs 1676 img/s at
        # batch 256: XLA materialises the swapaxes/reshape chain as copies
        # instead of bitcasting it.  Fused LN stays subject to the
        # batch-aware auto policy in run_blocks; the 2-D kernels on the
        # FLATTENED stream have no layout pin to fight.)
        if x.ndim == 3 or layernorm2d_supported(
            x.shape[0], x.shape[1], x.dtype.itemsize
        ):
            return layernorm_fused_bwd(x, scale, bias, eps)
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    kernel = p["kernel"].astype(x.dtype)
    bias = p["bias"].astype(x.dtype)
    return jnp.dot(x, kernel, preferred_element_type=x.dtype) + bias


def mlp(x: jax.Array, p: Params, kernel: str = "off") -> jax.Array:
    """Transformer MLP: fc1 → GELU → fc2 (timm ``Mlp`` semantics, tanh-free erf GELU).

    ``kernel`` (flattened 2-D stream on TPU only):

    * ``"fc1"`` — the fc1 GEMM + erf epilogue run as one Pallas kernel: XLA's
      fused dot+erf emitter measures ~2x the kernel's time at the MAE decoder
      shapes (PERF_NOTES round 3); fc2 stays an XLA GEMM.
    * ``"full"`` — fc1 + GELU + fc2 in ONE kernel: gelu(h) never leaves VMEM
      (saves ~420 MB/block of HBM traffic at the decoder shapes).
    * ``"off"`` — plain XLA dots (always the path for 3-D streams / CPU).

    Unsupported tilings fall back one level (full → fc1 → off).
    """
    if kernel != "off" and x.ndim == 2:
        from ssl4polyp_tpu.ops.mlp import (
            fc1_gelu,
            fc1_supported,
            mlp_fused,
            mlp_fused_supported,
        )

        w1 = p["fc1"]["kernel"]
        m, k, nf = x.shape[0], w1.shape[-2], w1.shape[-1]
        if kernel == "full" and mlp_fused_supported(m, k, nf):
            return mlp_fused(
                x, w1.astype(x.dtype), p["fc1"]["bias"].astype(x.dtype),
                p["fc2"]["kernel"].astype(x.dtype),
                p["fc2"]["bias"].astype(x.dtype),
            )
        if fc1_supported(m, k, nf):
            h = fc1_gelu(x, w1.astype(x.dtype), p["fc1"]["bias"].astype(x.dtype))
            return linear(h, p["fc2"])
    h = linear(x, p["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    return linear(h, p["fc2"])


def mlp_ln(x: jax.Array, ln: Params, p: Params, eps: float = 1e-6) -> jax.Array:
    """``x + mlp(layernorm(x))`` — the pre-norm MLP half-block with LN AND
    the residual folded into the fused MLP kernel (``mlp_fusion="full_ln"``;
    2-D flattened stream on TPU only).

    Falls back to the separate layernorm + :func:`mlp` + add chain when the
    tiling is unsupported.
    """
    if x.ndim == 2:
        from ssl4polyp_tpu.ops.mlp import mlp_fused_supported, mlp_ln_fused

        w1 = p["fc1"]["kernel"]
        if mlp_fused_supported(x.shape[0], w1.shape[-2], w1.shape[-1]):
            return mlp_ln_fused(
                x, ln["scale"], ln["bias"],
                w1.astype(x.dtype), p["fc1"]["bias"].astype(x.dtype),
                p["fc2"]["kernel"].astype(x.dtype),
                p["fc2"]["bias"].astype(x.dtype), eps,
            )
    return x + mlp(layernorm(x, ln["scale"], ln["bias"], eps), p, kernel="fc1")


def attention(
    x: jax.Array,
    p: Params,
    num_heads: int,
    use_pallas: bool = False,
    softmax_f32: bool = True,
    seq_len: Optional[int] = None,
    valid_len: Optional[int] = None,
    ln: Optional[Params] = None,
    ln_eps: float = 1e-6,
) -> jax.Array:
    """Multi-head self-attention with fused QKV.

    With ``ln`` (flattened Pallas path only) the caller's pre-norm is folded
    into the QKV projection kernel instead of running separately — pass the
    UN-normalised stream as ``x`` in that case.

    ``x``: (B, N, D) — or the flattened (B·N, D) view with ``seq_len=N``
    (used at large batches to keep the residual stream 2-D: XLA then has no
    3-D layout freedom and the kernel's (B, N, 3D) view is a bitcast).
    QKV is one (D, 3D) matmul; scores/softmax run in fp32.  When
    ``use_pallas`` is set and the platform is TPU, the fused Pallas kernel
    handles the (QK^T → softmax → V) stage.
    """
    if seq_len is not None:
        R, D = x.shape
        N = seq_len
        B = R // N
    else:
        B, N, D = x.shape
    head_dim = D // num_heads

    if use_pallas:
        # Single-kernel path: head split + softmax + AV stay in VMEM.
        # Two sub-variants by stream rank (PERF_NOTES.md round 3):
        # * 3-D stream: the QKV projection runs as a BARE dot whose bias is
        #   added inside the kernel (dbias accumulates fp32 across the
        #   grid).  A dot+add FUSION in front of the layout-pinned custom
        #   call would make XLA fuse batch-major and pay a physical
        #   relayout; the bare dot takes the pinned {2,1,0} directly.
        # * 2-D flattened stream (seq_len set): rank-2 arrays have no
        #   layout freedom, so the ordinary fused dot+bias is safe and the
        #   biasless kernel skips the per-slice VMEM bias adds and the
        #   grid-sequential dbias accumulation in the backward.
        # Round-3 negative results for the record: flattening only the two
        # attention linears at N=197 → 1557 (XLA copies the ragged-N
        # reshapes); fused-LN on the bitcast view → 1543; fully-fused
        # projection+attention kernel (`ops/attention_block.py`) → 1451.
        if seq_len is not None:
            from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_attention

            if ln is not None:
                # ln folded into the projection: the normalised stream never
                # touches HBM (ops/ln_linear.py; qkv_ln_fusion A/B knob).
                from ssl4polyp_tpu.ops.ln_linear import (
                    ln_linear,
                    ln_linear_supported,
                )

                if ln_linear_supported(x.shape[0], D, 3 * D):
                    qkv = ln_linear(
                        x, ln["scale"], ln["bias"],
                        p["qkv"]["kernel"].astype(x.dtype),
                        p["qkv"]["bias"].astype(x.dtype), ln_eps,
                    ).reshape(B, N, 3 * D)
                else:
                    x = layernorm(x, ln["scale"], ln["bias"], ln_eps)
                    qkv = linear(x, p["qkv"]).reshape(B, N, 3 * D)
            else:
                qkv = linear(x, p["qkv"]).reshape(B, N, 3 * D)
            from ssl4polyp_tpu.ops.attn_proj import (
                attn_proj_fold_enabled,
                fused_attention_proj,
            )

            if attn_proj_fold_enabled():
                # A/B candidate (BENCH_ATTN_PROJ=1): output projection folded
                # into the attention kernel, core output VMEM-resident.
                return fused_attention_proj(
                    qkv, p["proj"]["kernel"].astype(qkv.dtype),
                    p["proj"]["bias"].astype(qkv.dtype), num_heads, False,
                    softmax_f32, valid_len,
                ).reshape(B * N, D)
            out = fused_qkv_attention(qkv, num_heads, False, softmax_f32, valid_len)
            return linear(out.reshape(B * N, D), p["proj"])

        from ssl4polyp_tpu.ops.qkv_attention import fused_qkv_bias_attention

        qkv = jnp.dot(
            x, p["qkv"]["kernel"].astype(x.dtype), preferred_element_type=x.dtype
        ).reshape(B, N, 3 * D)
        out = fused_qkv_bias_attention(
            qkv, p["qkv"]["bias"].astype(x.dtype), num_heads, False,
            softmax_f32, valid_len,
        )
        return linear(out, p["proj"])

    qkv = linear(x, p["qkv"])  # (B, N, 3D) or (B·N, 3D)
    qkv = qkv.reshape(B, N, 3 * D)

    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, H, hd)
    q = jnp.swapaxes(q, 1, 2)  # (B, H, N, hd)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)

    scale = 1.0 / math.sqrt(head_dim)
    # softmax_f32=True keeps fp32 score storage + softmax (accuracy path,
    # used for fine-tuning); False stores scores in the compute dtype and
    # runs the softmax there too — halves the (N, N) HBM traffic that
    # bounds attention (+15% step throughput for MAE pretraining, whose
    # masked-MSE objective tolerates it).
    score_dtype = jnp.float32 if softmax_f32 else x.dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=score_dtype
    )
    if valid_len is not None and valid_len < N:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=3)
        scores = jnp.where(col < valid_len, scores, -jnp.inf)
    weights = jax.nn.softmax(scores * scale, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=x.dtype)

    out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
    if seq_len is not None:
        out = out.reshape(B * N, D)
    return linear(out, p["proj"])


# ---------------------------------------------------------------------------
# Stacked transformer blocks
# ---------------------------------------------------------------------------

def init_blocks(key: jax.Array, depth: int, dim: int, mlp_ratio: float) -> Params:
    """Initialise ``depth`` pre-norm transformer blocks, stacked on axis 0."""
    hidden = int(dim * mlp_ratio)
    k_qkv, k_proj, k_fc1, k_fc2 = jax.random.split(key, 4)
    return {
        "ln1": init_layernorm(dim, stack=depth),
        "attn": {
            "qkv": init_linear(k_qkv, dim, 3 * dim, stack=depth),
            "proj": init_linear(k_proj, dim, dim, stack=depth),
        },
        "ln2": init_layernorm(dim, stack=depth),
        "mlp": {
            "fc1": init_linear(k_fc1, dim, hidden, stack=depth),
            "fc2": init_linear(k_fc2, hidden, dim, stack=depth),
        },
    }


def run_blocks(
    x: jax.Array,
    blocks: Params,
    num_heads: int,
    ln_eps: float = 1e-6,
    use_pallas: bool = False,
    remat: bool = False,
    unroll: bool = False,
    softmax_f32: bool = True,
    fused_ln: Optional[bool] = None,
    flatten_stream: Optional[bool] = None,
    valid_len: Optional[int] = None,
    mlp_fusion: Optional[str] = None,
    qkv_ln_fusion: bool = False,
) -> jax.Array:
    """Apply the stacked pre-norm blocks with ``lax.scan``.

    Equivalent computation to the reference's loop over ``timm`` Blocks
    (``models_mae.py:166-168``) but compiled once for all depths.  With
    ``unroll`` the scan is replaced by a Python loop over static slices —
    longer compiles, but XLA can fuse and schedule across block boundaries.
    """

    # Run the residual stream FLATTENED as (B·N, D) when the sequence is
    # sublane-aligned.  A 2-D stream leaves XLA no 3-D layout freedom: every
    # linear is a plain GEMM, and the kernel's (B, N, 3D) view of a {1,0}
    # 2-D array is a true bitcast — but ONLY when N % 8 == 0 (the (8, 128)
    # tiling of the 3-D view's (N, 3D) minor dims must coincide with the
    # 2-D row tiling).  At N=197 the view is a physical retile and flatten
    # measured NET-NEGATIVE (1522 vs 1649 img/s, round 2); with the
    # sequence padded to a sublane multiple (MAEConfig.decoder_pad_to) the
    # views are free and the batch-major-vs-{2,1,0} relayout copies around
    # the attention custom calls vanish by construction.
    batch, seq = x.shape[0], x.shape[1]
    if flatten_stream is None:
        dim = x.shape[-1]
        flatten_stream = seq % 8 == 0 and dim % 128 == 0 and (3 * dim) % 128 == 0
    flatten = flatten_stream and use_pallas
    if flatten:
        x = x.reshape(batch * seq, x.shape[2])
    seq_len = seq if flatten else None

    # Auto policy (fused_ln=None): the Pallas LN kernels win at small
    # batches (+1% at B=64: XLA's fp32 LN reductions round-trip HBM) but
    # lose at large 3-D ones (−4% at B=256: XLA flips the residual stream
    # to a batch-major {2,0,1} layout and every custom call pins {2,1,0},
    # inserting relayout copies).  On the FLATTENED 2-D stream the pins are
    # moot, but XLA's rank-2 LN fusions are already near-bandwidth and the
    # 2-D kernels measured 1756.6 vs 1761.1 img/s — so auto keeps them OFF
    # there too (available via fused_layernorm=True).  v5e, PERF_NOTES.
    if fused_ln is None:
        ln_fused = use_pallas and not flatten and x.shape[0] < 256
    else:
        ln_fused = fused_ln

    # MLP kernel policy: on the flattened stream the fc1+GELU kernel is the
    # measured default; "full" (fc1+GELU+fc2 in one kernel, gelu(h) never in
    # HBM) is the A/B candidate (BENCH_MLP=full).  3-D streams always "off".
    if mlp_fusion is None:
        mlp_fusion = "fc1"
    if mlp_fusion not in ("off", "fc1", "full", "full_ln"):
        # A typo'd BENCH_MLP value must fail loudly, not silently A/B the
        # wrong kernel configuration (advisor finding, round 3).
        raise ValueError(
            f"mlp_fusion must be one of 'off'/'fc1'/'full'/'full_ln', "
            f"got {mlp_fusion!r}"
        )
    mlp_kernel = mlp_fusion if flatten else "off"

    qkv_ln = qkv_ln_fusion and flatten

    def body(h, layer):
        if qkv_ln:
            a, a_ln = h, layer["ln1"]
        else:
            a = layernorm(h, layer["ln1"]["scale"], layer["ln1"]["bias"],
                          ln_eps, fused=ln_fused)
            a_ln = None
        h = h + attention(
            a, layer["attn"], num_heads,
            use_pallas=use_pallas, softmax_f32=softmax_f32, seq_len=seq_len,
            valid_len=valid_len, ln=a_ln, ln_eps=ln_eps,
        )
        if mlp_kernel == "full_ln":
            h = mlp_ln(h, layer["ln2"], layer["mlp"], ln_eps)
        else:
            m = layernorm(h, layer["ln2"]["scale"], layer["ln2"]["bias"],
                          ln_eps, fused=ln_fused)
            h = h + mlp(m, layer["mlp"], kernel=mlp_kernel)
        return h, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    if unroll:
        depth = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        for i in range(depth):
            layer = jax.tree_util.tree_map(lambda a: a[i], blocks)
            x, _ = body(x, layer)
    else:
        x, _ = jax.lax.scan(body, x, blocks)
    if flatten:
        x = x.reshape(batch, seq, x.shape[-1])
    return x


def run_blocks_collect(
    x: jax.Array,
    blocks: Params,
    num_heads: int,
    ln_eps: float = 1e-6,
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`run_blocks` but also stacks every block's output.

    Used by dense-prediction decoders that tap intermediate feature maps
    (reference taps blocks {2, 5, 8, 11} — ``models.py:124``).
    Returns ``(final, stacked_outputs[depth, B, N, D])``.
    """

    def body(h, layer):
        a = layernorm(h, layer["ln1"]["scale"], layer["ln1"]["bias"], ln_eps)
        h = h + attention(a, layer["attn"], num_heads, use_pallas=use_pallas)
        m = layernorm(h, layer["ln2"]["scale"], layer["ln2"]["bias"], ln_eps)
        h = h + mlp(m, layer["mlp"])
        return h, h

    final, collected = jax.lax.scan(body, x, blocks)
    return final, collected
