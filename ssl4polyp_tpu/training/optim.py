"""AdamW with pytree-valued learning-rate and weight-decay scales.

The reference expresses training policy through torch param groups:
no-weight-decay on bias/norm (``main_pretrain.py:217``), head vs backbone
learning rates (``train_classification.py:5751-5765``), and freeze regimes
that toggle ``requires_grad`` (``finetune.py:49-91``).

The functional equivalent here is a single AdamW whose per-leaf **scale
trees** broadcast against the parameter shapes:

* ``lr_scale`` — 0.0 freezes a leaf, any float rescales its LR.  Because
  transformer blocks are stacked with a leading depth axis, "unfreeze only
  the last N blocks" is a ``(depth, 1, ...)`` 0/1 array on the block leaves
  (slice-level control no per-leaf mask system can express);
* ``wd_scale`` — 0.0 exempts a leaf (bias/norm/cls_token/pos_embed).

Semantics match ``torch.optim.AdamW``: decoupled weight decay scaled by the
step learning rate; bias-corrected first/second moments; all optimizer math
in fp32.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Any
Tree = Any

__all__ = [
    "AdamWState",
    "adamw_init",
    "adamw_update",
    "adamw_update_fused",
    "LARSState",
    "lars_init",
    "lars_update",
    "no_weight_decay_scales",
    "finetune_lr_scales",
    "pretrain_lr_scales",
    "layerwise_lr_decay_scales",
    "clip_by_global_norm",
    "global_norm",
]


class AdamWState(NamedTuple):
    step: jax.Array  # int32 scalar
    mu: Params
    nu: Params


def adamw_init(params: Params) -> AdamWState:
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamWState(step=jnp.zeros((), jnp.int32), mu=zeros,
                      nu=jax.tree_util.tree_map(jnp.copy, zeros))


def adamw_update(
    params: Params,
    grads: Params,
    state: AdamWState,
    *,
    lr: jax.Array | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    lr_scale: Optional[Tree] = None,
    wd_scale: Optional[Tree] = None,
) -> tuple[Params, AdamWState]:
    """One AdamW step. ``lr_scale``/``wd_scale`` are pytrees matching
    ``params``' structure whose leaves broadcast against each parameter."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def leaf_update(p, g, mu, nu, ls, ws):
        g32 = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        mu = b1 * mu + (1.0 - b1) * g32
        nu = b2 * nu + (1.0 - b2) * jnp.square(g32)
        m_hat = mu / bc1
        n_hat = nu / bc2
        step_dir = m_hat / (jnp.sqrt(n_hat) + eps) + weight_decay * ws * p32
        new_p = p32 - lr * ls * step_dir
        return new_p.astype(p.dtype), mu, nu

    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    ls_tree = lr_scale if lr_scale is not None else ones
    ws_tree = wd_scale if wd_scale is not None else ones

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_ls = treedef.flatten_up_to(ls_tree)
    flat_ws = treedef.flatten_up_to(ws_tree)

    new_p, new_mu, new_nu = [], [], []
    for p, g, mu, nu, ls, ws in zip(flat_p, flat_g, flat_mu, flat_nu, flat_ls, flat_ws):
        np_, nmu, nnu = leaf_update(p, g, mu, nu, ls, ws)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)

    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        AdamWState(
            step=step,
            mu=jax.tree_util.tree_unflatten(treedef, new_mu),
            nu=jax.tree_util.tree_unflatten(treedef, new_nu),
        ),
    )


def adamw_update_fused(
    params: Params,
    grads: Params,
    state: AdamWState,
    *,
    lr: jax.Array | float,
    compute_dtype,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    lr_scale: Optional[Tree] = None,
    wd_scale: Optional[Tree] = None,
    interpret: bool = False,
) -> tuple[Params, Params, AdamWState]:
    """AdamW step that also emits the compute-dtype parameter copy.

    Returns ``(params, params_c, state)``.  Identical math to
    :func:`adamw_update`; on accelerators, leaves whose lr/wd scales are
    plain floats run as one Pallas kernel each (single-pass p/g/mu/nu
    streams + in-pass bf16 emission — XLA's per-leaf fusions measure ~35%
    over the HBM floor).  Scale-array leaves (layer-decay trees) and CPU
    runs use the XLA path.
    """
    from ssl4polyp_tpu.models.layers import keep_f32_leaf
    from ssl4polyp_tpu.ops.adamw import adamw_leaf_pallas

    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    use_pallas = interpret or jax.default_backend() != "cpu"

    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    ls_tree = lr_scale if lr_scale is not None else ones
    ws_tree = wd_scale if wd_scale is not None else ones

    flat_p, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [path for path, _ in flat_p]
    flat_p = [leaf for _, leaf in flat_p]
    plain = jax.tree_util.tree_structure(params)
    flat_g = plain.flatten_up_to(grads)
    flat_mu = plain.flatten_up_to(state.mu)
    flat_nu = plain.flatten_up_to(state.nu)
    flat_ls = plain.flatten_up_to(ls_tree)
    flat_ws = plain.flatten_up_to(ws_tree)

    def leaf_update(p, g, mu, nu, ls, ws):
        g32 = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        mu = b1 * mu + (1.0 - b1) * g32
        nu = b2 * nu + (1.0 - b2) * jnp.square(g32)
        m_hat = mu / bc1
        n_hat = nu / bc2
        step_dir = m_hat / (jnp.sqrt(n_hat) + eps) + weight_decay * ws * p32
        new_p = p32 - lr * ls * step_dir
        return new_p.astype(p.dtype), mu, nu

    new_p, new_pc, new_mu, new_nu = [], [], [], []
    for path, p, g, mu, nu, ls, ws in zip(
        paths, flat_p, flat_g, flat_mu, flat_nu, flat_ls, flat_ws
    ):
        keep = keep_f32_leaf(path, p) or compute_dtype == jnp.float32
        pc_dtype = p.dtype if keep else compute_dtype
        if use_pallas and isinstance(ls, (int, float)) and isinstance(ws, (int, float)):
            np_, nmu, nnu, npc = adamw_leaf_pallas(
                p, g, mu, nu, lr, bc1, bc2,
                b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                ls=float(ls), ws=float(ws), compute_dtype=pc_dtype,
                interpret=interpret,
            )
        else:
            np_, nmu, nnu = leaf_update(p, g, mu, nu, ls, ws)
            npc = np_ if keep else np_.astype(pc_dtype)
        new_p.append(np_)
        new_pc.append(npc)
        new_mu.append(nmu)
        new_nu.append(nnu)

    return (
        plain.unflatten(new_p),
        plain.unflatten(new_pc),
        AdamWState(
            step=step,
            mu=plain.unflatten(new_mu),
            nu=plain.unflatten(new_nu),
        ),
    )


# ---------------------------------------------------------------------------
# Scale-tree builders
# ---------------------------------------------------------------------------

_NO_DECAY_LEAF_NAMES = {"bias", "scale", "cls_token", "pos_embed", "mask_token"}


def no_weight_decay_scales(params: Params) -> Tree:
    """0.0 on biases/norm scales/tokens/pos-embeds, 1.0 elsewhere.

    Matches timm's no-WD grouping used by the reference MAE driver
    (``main_pretrain.py:217-218``): 1-D tensors and tokens skip decay.
    """

    def walk(node, name):
        if isinstance(node, dict):
            return {key: walk(value, key) for key, value in node.items()}
        if name in _NO_DECAY_LEAF_NAMES or getattr(node, "ndim", 0) <= 1:
            return 0.0
        return 1.0

    return walk(params, "")


def finetune_lr_scales(
    params: Params,
    mode: str,
    depth: int,
    head_scale: float = 1.0,
    backbone_scale: float = 1.0,
    freeze_pos_embed: bool = False,
) -> Tree:
    """Build the lr_scale tree implementing a fine-tune regime.

    Modes (reference ``finetune.py:29-91``): ``full`` trains everything;
    ``none`` trains only the head; ``head+1``/``head+2`` additionally train
    the last 1/2 encoder blocks.  ``head_scale``/``backbone_scale`` carry
    per-group learning rates (``train_classification.py:5751-5765``).

    ``freeze_pos_embed``: zero the lr on ``pos_embed`` leaves even in
    ``full`` mode — the MAE-lineage classifier inherits the pretrainer's
    ``requires_grad=False`` sincos buffers (reference
    ``models_mae.py:37,51`` via ``ViT_from_MAE``), so those tables must
    never receive updates; the timm lineage's LEARNED pos embeds train
    normally.
    """
    mode = (mode or "full").strip().lower()
    if mode not in {"none", "full", "head+1", "head+2"}:
        raise ValueError(f"Unsupported fine-tune mode {mode!r}")

    tail = {"none": 0, "full": depth, "head+1": 1, "head+2": 2}[mode]
    depth_gate = jnp.concatenate(
        [jnp.zeros(depth - tail), jnp.ones(tail)]
    )  # (depth,) 1.0 for trainable tail blocks

    def block_scale(leaf):
        gate = depth_gate.reshape((depth,) + (1,) * (leaf.ndim - 1))
        return backbone_scale * gate

    def walk(node, path):
        if isinstance(node, dict):
            return {key: walk(value, path + (key,)) for key, value in node.items()}
        if path and path[-1] == "pos_embed" and freeze_pos_embed:
            return 0.0
        if path and path[0] == "head":
            return head_scale
        if path and path[0] == "blocks":
            if mode == "full":
                return backbone_scale
            return block_scale(node)
        # Everything else (patch embed, cls token, pos embed, final norm)
        # belongs to the backbone group and is trainable only in "full".
        return backbone_scale if mode == "full" else 0.0

    return walk(params, ())


def pretrain_lr_scales(params: Params) -> Tree:
    """MAE pretraining lr scales: 1.0 everywhere, 0.0 on ``pos_embed``
    leaves — the reference's encoder/decoder sin-cos tables are frozen
    buffers (``models_mae.py:37,51``: ``requires_grad=False``), so AdamW
    must never touch them (cls/mask tokens stay trainable)."""

    def walk(node, name):
        if isinstance(node, dict):
            return {key: walk(value, key) for key, value in node.items()}
        return 0.0 if name == "pos_embed" else 1.0

    return walk(params, "")


def layerwise_lr_decay_scales(
    params: Params,
    depth: int,
    decay: float = 0.75,
    head_scale: float = 1.0,
) -> Tree:
    """Layer-wise learning-rate decay for MAE fine-tuning.

    Replicates the policy of the vendored upstream helper the reference
    ships (``mae/util/lr_decay.py``: ``param_groups_lrd``): embeddings get
    ``decay^(depth+1)``, block *i* gets ``decay^(depth - i)``, the head gets
    full LR.  With stacked blocks this is a single ``(depth, 1, ...)`` scale
    vector per block leaf.
    """
    block_scales = jnp.asarray([decay ** (depth - i) for i in range(depth)])
    embed_scale = float(decay ** (depth + 1))

    def walk(node, path):
        if isinstance(node, dict):
            return {key: walk(value, path + (key,)) for key, value in node.items()}
        if path and path[0] == "head":
            return head_scale
        if path and path[0] == "blocks":
            return block_scales.reshape((depth,) + (1,) * (node.ndim - 1))
        if path and path[0] == "norm":
            # final norm belongs to the last "layer group" upstream
            return float(decay ** 0) * 1.0
        return embed_scale

    return walk(params, ())


# ---------------------------------------------------------------------------
# LARS (linear-probe optimizer, upstream MAE ``util/lars.py``)
# ---------------------------------------------------------------------------


class LARSState(NamedTuple):
    step: jax.Array
    momentum: Params


def lars_init(params: Params) -> LARSState:
    zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return LARSState(step=jnp.zeros((), jnp.int32), momentum=zeros)


def lars_update(
    params: Params,
    grads: Params,
    state: LARSState,
    *,
    lr: jax.Array | float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
    lr_scale: Optional[Tree] = None,
) -> tuple[Params, LARSState]:
    """LARS with the upstream convention: layer adaptation and weight decay
    apply only to tensors with ndim > 1 (bias/norm params get plain SGD)."""
    step = state.step + 1
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    ls_tree = lr_scale if lr_scale is not None else ones

    def leaf(p, g, m, ls):
        p32 = p.astype(jnp.float32)
        g32 = g.astype(jnp.float32)
        if p.ndim > 1:
            g32 = g32 + weight_decay * p32
            p_norm = jnp.linalg.norm(p32)
            g_norm = jnp.linalg.norm(g32)
            trust = jnp.where(
                (p_norm > 0) & (g_norm > 0),
                trust_coefficient * p_norm / g_norm,
                1.0,
            )
            g32 = g32 * trust
        m = momentum * m + g32
        return (p32 - lr * ls * m).astype(p.dtype), m

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.momentum)
    flat_ls = treedef.flatten_up_to(ls_tree)
    new_p, new_m = [], []
    for p, g, m, ls in zip(flat_p, flat_g, flat_m, flat_ls):
        np_, nm = leaf(p, g, m, ls)
        new_p.append(np_)
        new_m.append(nm)
    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        LARSState(step=step, momentum=jax.tree_util.tree_unflatten(treedef, new_m)),
    )


# ---------------------------------------------------------------------------
# Gradient utilities
# ---------------------------------------------------------------------------

def global_norm(tree: Tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def clip_by_global_norm(grads: Tree, max_norm: float) -> tuple[Tree, jax.Array]:
    norm = global_norm(grads)
    factor = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    clipped = jax.tree_util.tree_map(lambda g: g * factor.astype(g.dtype), grads)
    return clipped, norm
