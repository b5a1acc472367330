"""Fused AdamW leaf update as a Pallas kernel.

XLA compiles the per-leaf AdamW chain into separate fusions whose streams
(p, g, mu, nu in; p, mu, nu out — ~28 bytes/param) run ~35% over the HBM
bandwidth floor (~6.0 ms vs ~4.4 ms for ViT-B on v5e).  One Pallas kernel
per leaf guarantees the single-pass pipeline, and emits the compute-dtype
parameter copy in the same pass (see ``training/pretrain.py``: the copy is
carried through the step so the forward never re-reads the fp32 master).

Semantics are bit-identical to ``optim.adamw_update``'s ``leaf_update``
(torch.optim.AdamW parity: decoupled weight decay scaled by lr,
bias-corrected moments, fp32 math).  Only leaves whose lr/wd scales are
plain Python floats take this path — scale *arrays* (layer-decay trees)
fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adamw_leaf_pallas"]


def _kernel(scalars_ref, p_ref, g_ref, mu_ref, nu_ref,
            p_out, mu_out, nu_out, pc_out, *,
            b1, b2, eps, weight_decay, ls, ws):
    lr = scalars_ref[0]
    bc1 = scalars_ref[1]
    bc2 = scalars_ref[2]
    p32 = p_ref[:].astype(jnp.float32)
    g32 = g_ref[:].astype(jnp.float32)
    mu = b1 * mu_ref[:] + (1.0 - b1) * g32
    nu = b2 * nu_ref[:] + (1.0 - b2) * jnp.square(g32)
    m_hat = mu / bc1
    n_hat = nu / bc2
    step_dir = m_hat / (jnp.sqrt(n_hat) + eps) + weight_decay * ws * p32
    new_p = p32 - lr * ls * step_dir
    p_out[:] = new_p
    mu_out[:] = mu
    nu_out[:] = nu
    pc_out[:] = new_p.astype(pc_out.dtype)


def _tile_rows(R: int, C: int) -> int:
    # 9 streamed (T, C) fp32-ish blocks, double-buffered: keep under ~8 MB.
    budget_elems = 8 * 1024 * 1024 // (2 * 9 * 4)
    t = max(8, min(R, budget_elems // max(C, 1)) // 8 * 8)
    return min(t, R) if R >= 8 else R


def adamw_leaf_pallas(
    p: jax.Array,
    g: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    lr: jax.Array,
    bc1: jax.Array,
    bc2: jax.Array,
    *,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    ls: float,
    ws: float,
    compute_dtype,
    interpret: bool = False,
):
    """One AdamW step for one leaf.

    Returns ``(new_p f32, new_mu, new_nu, new_p_compute)`` where the last is
    the ``compute_dtype`` copy emitted in the same pass.
    """
    shape = p.shape
    C = shape[-1] if p.ndim >= 1 else 1
    R = p.size // max(C, 1)
    p2, g2 = p.reshape(R, C), g.reshape(R, C)
    mu2, nu2 = mu.reshape(R, C), nu.reshape(R, C)
    T = _tile_rows(R, C)
    grid = (R + T - 1) // T

    kernel = functools.partial(
        _kernel, b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay, ls=ls, ws=ws,
    )
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(bc1, jnp.float32),
        jnp.asarray(bc2, jnp.float32),
    ])
    block = pl.BlockSpec((T, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block, block, block, block,
        ],
        out_specs=[block, block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((R, C), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * R * C,
            bytes_accessed=7 * R * C * 4,
            transcendentals=R * C,
        ),
        interpret=interpret,
    )(scalars, p2, g2, mu2, nu2)
    new_p, new_mu, new_nu, new_pc = out
    return (
        new_p.reshape(shape),
        new_mu.reshape(shape),
        new_nu.reshape(shape),
        new_pc.reshape(shape),
    )
