"""Multi-step training-trajectory parity vs torch (CPU, fp32).

The strongest accuracy-parity evidence obtainable without real data: run N
optimizer steps on the SAME tiny ViT — identical weights, batches, LR
schedule, weight-decay grouping — once through torch
(autograd + ``torch.optim.AdamW`` + ``F.binary_cross_entropy_with_logits``,
the reference stack at
``src/ssl4polyp/classification/train_classification.py:6089-6104`` with
``config/base.yaml`` optimizer semantics) and once through this framework
(``jax.grad`` + ``training/optim.py::adamw_update`` +
``classification._loss_from_logits`` + ``schedules.warmup_cosine``), and
assert the loss and parameter trajectories stay within fp32 round-off.
Any divergence in optimizer math (bias correction, decoupled decay,
no-decay grouping), loss semantics (pos_weight, two-logit→one-logit
collapse), or schedule sampling shows up as trajectory drift here.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ssl4polyp_tpu.models.vit import ViTConfig, init_vit, vit_forward  # noqa: E402
from ssl4polyp_tpu.training import optim  # noqa: E402
from ssl4polyp_tpu.training.classification import _loss_from_logits  # noqa: E402
from ssl4polyp_tpu.training.schedules import warmup_cosine  # noqa: E402

CFG = ViTConfig(
    img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
    num_classes=2, pos_embed="learned", compute_dtype=jnp.float32,
    use_pallas_attention=False, unroll_blocks=True, pad_tokens_to=0,
)

N_STEPS = 12
BASE_LR = 1e-3
WARMUP = 3
WEIGHT_DECAY = 0.05
POS_WEIGHT = 1.7


def _to_torch(tree, path=()):
    if isinstance(tree, dict):
        return {k: _to_torch(v, path + (k,)) for k, v in tree.items()}
    tensor = torch.tensor(np.asarray(tree), dtype=torch.float64)
    tensor = tensor.to(torch.float32)
    tensor.requires_grad_(True)
    return tensor


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for key, value in tree.items():
            yield from _flatten(value, path + (key,))
    else:
        yield path, tree


def _torch_forward(tp, images, cfg: ViTConfig):
    """Mirror of vit_forward (XLA path) in torch ops: reshape patch embed,
    pre-norm blocks with fused-QKV attention, final norm, cls head."""
    B, H, W, C = images.shape
    p = cfg.patch_size
    g = H // p
    x = images.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, p * p * C)
    x = x @ tp["patch_embed"]["kernel"] + tp["patch_embed"]["bias"]

    pos = tp["pos_embed"]
    x = x + pos[:, 1:, :]
    cls = (tp["cls_token"] + pos[:, :1, :]).expand(B, 1, cfg.embed_dim)
    x = torch.cat([cls, x], dim=1)

    blocks = tp["blocks"]
    hd = cfg.embed_dim // cfg.num_heads
    for i in range(cfg.depth):
        def b(leaf):
            return leaf[i]

        h = F.layer_norm(x, (cfg.embed_dim,), b(blocks["ln1"]["scale"]),
                         b(blocks["ln1"]["bias"]), eps=cfg.ln_eps)
        qkv = h @ b(blocks["attn"]["qkv"]["kernel"]) + b(blocks["attn"]["qkv"]["bias"])
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, cfg.num_heads, hd)
        q, k, v = qkv.unbind(dim=2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # (B, H, N, hd)
        scores = q @ k.transpose(-2, -1)
        weights = torch.softmax(scores * (1.0 / math.sqrt(hd)), dim=-1)
        out = (weights @ v).transpose(1, 2).reshape(B, N, cfg.embed_dim)
        out = out @ b(blocks["attn"]["proj"]["kernel"]) + b(blocks["attn"]["proj"]["bias"])
        x = x + out

        h = F.layer_norm(x, (cfg.embed_dim,), b(blocks["ln2"]["scale"]),
                         b(blocks["ln2"]["bias"]), eps=cfg.ln_eps)
        h = h @ b(blocks["mlp"]["fc1"]["kernel"]) + b(blocks["mlp"]["fc1"]["bias"])
        h = F.gelu(h)  # exact erf, matching jax.nn.gelu(approximate=False)
        h = h @ b(blocks["mlp"]["fc2"]["kernel"]) + b(blocks["mlp"]["fc2"]["bias"])
        x = x + h

    x = F.layer_norm(x, (cfg.embed_dim,), tp["norm"]["scale"], tp["norm"]["bias"],
                     eps=cfg.ln_eps)
    pooled = x[:, 0]
    return pooled @ tp["head"]["kernel"] + tp["head"]["bias"]


def _torch_loss(logits, labels):
    z = logits[:, 1] - logits[:, 0]
    return F.binary_cross_entropy_with_logits(
        z, labels.to(torch.float32),
        pos_weight=torch.tensor(POS_WEIGHT),
    )


def _batches(rng, n):
    out = []
    for _ in range(n):
        images = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        labels = rng.integers(0, 2, size=(4,)).astype(np.int64)
        out.append((images, labels))
    return out


def test_training_trajectory_matches_torch():
    params = init_vit(jax.random.PRNGKey(0), CFG)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    tp = _to_torch(jax.tree_util.tree_map(np.asarray, params))

    batches = _batches(np.random.default_rng(42), N_STEPS)
    sched = warmup_cosine(BASE_LR, total_steps=N_STEPS, warmup_steps=WARMUP)

    # --- torch side: param groups replicate no_weight_decay_scales ------
    wd_tree = optim.no_weight_decay_scales(params)
    flat_wd = dict(_flatten(wd_tree))
    decay, no_decay = [], []
    for path, tensor in _flatten(tp):
        (decay if flat_wd[path] == 1.0 else no_decay).append(tensor)
    opt = torch.optim.AdamW(
        [
            {"params": decay, "weight_decay": WEIGHT_DECAY},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=BASE_LR, betas=(0.9, 0.999), eps=1e-8,
    )
    torch_losses = []
    for step, (images, labels) in enumerate(batches):
        for group in opt.param_groups:
            group["lr"] = sched(step)
        opt.zero_grad()
        logits = _torch_forward(tp, torch.tensor(images), CFG)
        loss = _torch_loss(logits, torch.tensor(labels))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- jax side: the framework's actual step stack --------------------
    valid = jnp.ones((4,), dtype=bool)

    def loss_fn(p, images, labels):
        logits = vit_forward(p, images, CFG)
        return _loss_from_logits(logits, labels, valid, "binary_bce",
                                 POS_WEIGHT, (1.0, 1.0))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    state = optim.adamw_init(params)
    jax_losses = []
    for step, (images, labels) in enumerate(batches):
        loss, grads = grad_fn(params, jnp.asarray(images), jnp.asarray(labels))
        params, state = optim.adamw_update(
            params, grads, state, lr=sched(step),
            weight_decay=WEIGHT_DECAY, wd_scale=wd_tree,
        )
        jax_losses.append(float(loss))

    # --- trajectories agree to fp32 round-off ---------------------------
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)

    flat_torch = dict(_flatten(tp))
    worst = 0.0
    D = CFG.embed_dim
    for path, leaf in _flatten(params):
        got = np.asarray(leaf)
        want = flat_torch[path].detach().numpy()
        if path == ("blocks", "attn", "qkv", "bias"):
            # The K-slice of the fused QKV bias is a ZERO-GRADIENT
            # direction: scores are invariant to a constant key shift
            # (q·b is the same for every key, softmax-invariant), so its
            # gradient is fp32 roundoff — which Adam's m/√v normalizes
            # into full lr-sized random-walk steps that differ between
            # frameworks (and between torch runs).  The reference's timm
            # ViT has the same degeneracy; exclude the K-slice.
            got = np.concatenate([got[:, :D], got[:, 2 * D :]], axis=1)
            want = np.concatenate([want[:, :D], want[:, 2 * D :]], axis=1)
        denom = max(1e-3, float(np.abs(want).max()))
        worst = max(worst, float(np.abs(got - want).max()) / denom)
    assert worst < 5e-4, f"parameter trajectories diverged: rel {worst:.2e}"


def test_weighted_ce_loss_matches_torch():
    """Weighted cross-entropy mode vs torch's class-weighted CE (reference
    multiclass path, train_classification.py:6089-6104)."""
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((16, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(16,))
    weights = (0.5, 2.0, 1.25)

    ours = _loss_from_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones((16,), bool),
        "weighted_ce", 1.0, weights,
    )
    # torch reduction='mean' divides by the SUM OF WEIGHTS of the targets
    # (the reference's nn.CrossEntropyLoss(weight=...) semantics,
    # train_classification.py:6104) — compare against torch directly.
    want = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels),
        weight=torch.tensor(weights),
    )
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-6)

    # masked rows drop out of both numerator and weight-denominator
    valid = np.ones(16, bool)
    valid[10:] = False
    ours_masked = _loss_from_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid),
        "weighted_ce", 1.0, weights,
    )
    want_masked = F.cross_entropy(
        torch.tensor(logits[:10]), torch.tensor(labels[:10]),
        weight=torch.tensor(weights),
    )
    np.testing.assert_allclose(float(ours_masked), float(want_masked), rtol=1e-6)


def test_bce_pos_weight_matches_torch_elementwise():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((32, 2)).astype(np.float32) * 3
    labels = rng.integers(0, 2, size=(32,))
    ours = _loss_from_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.ones((32,), bool),
        "binary_bce", POS_WEIGHT, (1.0, 1.0),
    )
    z = torch.tensor(logits[:, 1] - logits[:, 0])
    want = F.binary_cross_entropy_with_logits(
        z, torch.tensor(labels, dtype=torch.float32),
        pos_weight=torch.tensor(POS_WEIGHT),
    )
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-6)


def _torch_lars_step(tensors, lr, *, weight_decay, momentum_buf,
                     momentum=0.9, trust_coefficient=0.001, lr_scales=None):
    """Reference LARS semantics (upstream MAE ``util/lars.py``, the
    linear-probe optimizer at ``main_linprobe.py:99``), re-expressed as
    plain tensor ops: layer adaptation + weight decay apply only to
    ndim>1 tensors; the trust ratio uses the decayed gradient's norm;
    momentum accumulates the adapted gradient."""
    with torch.no_grad():
        for i, p in enumerate(tensors):
            dp = p.grad.clone()
            if p.ndim > 1:
                dp = dp + weight_decay * p
                p_norm = torch.norm(p)
                d_norm = torch.norm(dp)
                q = torch.where(
                    (p_norm > 0.0) & (d_norm > 0.0),
                    trust_coefficient * p_norm / d_norm,
                    torch.ones(()),
                )
                dp = dp * q
            momentum_buf[i] = momentum * momentum_buf[i] + dp
            scale = 1.0 if lr_scales is None else lr_scales[i]
            p -= lr * scale * momentum_buf[i]


def test_lars_trajectory_matches_torch():
    """Linear-probe optimizer parity: N LARS steps on a head atop frozen
    features (upstream ``main_linprobe`` stack — ``mae_finetune.py::
    run_linear_probe``) match a torch implementation of the same published
    algorithm step-for-step, including the frozen (lr_scale=0) leaves."""
    rng = np.random.default_rng(7)
    D, C, B, steps = 24, 2, 16, 15
    params = {
        "encoder": {"kernel": jnp.asarray(rng.standard_normal((D, D)), jnp.float32)},
        "head": {
            "kernel": jnp.asarray(rng.standard_normal((D, C)) * 0.02, jnp.float32),
            "bias": jnp.zeros((C,), jnp.float32),
        },
    }
    # run_linear_probe freezes everything but the head via lr scales
    lr_scale = {"encoder": {"kernel": 0.0}, "head": {"kernel": 1.0, "bias": 1.0}}
    features = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    labels = rng.integers(0, 2, size=(B,))
    sched = warmup_cosine(0.1, total_steps=steps, warmup_steps=3)
    WD = 0.01

    def loss_fn(p):
        logits = (features @ p["encoder"]["kernel"]) @ p["head"]["kernel"] + p["head"]["bias"]
        return _loss_from_logits(logits, jnp.asarray(labels), jnp.ones((B,), bool),
                                 "binary_bce", 1.0, (1.0, 1.0))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    state = optim.lars_init(params)
    jax_losses = []
    p = params
    for step in range(steps):
        loss, grads = grad_fn(p)
        p, state = optim.lars_update(
            p, grads, state, lr=sched(step), weight_decay=WD, lr_scale=lr_scale,
        )
        jax_losses.append(float(loss))

    # torch side
    te = torch.tensor(np.asarray(params["encoder"]["kernel"]), requires_grad=True)
    tk = torch.tensor(np.asarray(params["head"]["kernel"]), requires_grad=True)
    tb = torch.tensor(np.asarray(params["head"]["bias"]), requires_grad=True)
    tensors = [te, tk, tb]
    scales = [0.0, 1.0, 1.0]
    bufs = [torch.zeros_like(t) for t in tensors]
    tf = torch.tensor(np.asarray(features))
    tl = torch.tensor(labels.astype(np.float32))
    torch_losses = []
    for step in range(steps):
        for t in tensors:
            if t.grad is not None:
                t.grad = None
        logits = (tf @ te) @ tk + tb
        loss = F.binary_cross_entropy_with_logits(logits[:, 1] - logits[:, 0], tl)
        loss.backward()
        _torch_lars_step(tensors, sched(step), weight_decay=WD,
                         momentum_buf=bufs, lr_scales=scales)
        torch_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["head"]["kernel"]), tk.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["head"]["bias"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    # frozen leaf never moved (momentum accumulates but lr_scale gates the step)
    np.testing.assert_array_equal(np.asarray(p["encoder"]["kernel"]),
                                  np.asarray(params["encoder"]["kernel"]))


def test_layer_decay_trajectory_matches_torch():
    """Layer-wise lr-decay parity: our single AdamW with the
    ``layerwise_lr_decay_scales`` tree (MAE fine-tune stack,
    ``mae_finetune.py::run_mae_finetune``; upstream ``util/lr_decay.py::
    param_groups_lrd``) matches torch AdamW with one param group per
    (layer-scale, weight-decay) pair, lr set to ``sched(step) * scale``
    each step — the reference's param-group mechanics."""
    DECAY = 0.75
    params = init_vit(jax.random.PRNGKey(1), CFG)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    depth = CFG.depth
    batches = _batches(np.random.default_rng(11), N_STEPS)
    sched = warmup_cosine(BASE_LR, total_steps=N_STEPS, warmup_steps=WARMUP)

    lr_tree = optim.layerwise_lr_decay_scales(params, depth, DECAY)
    wd_tree = optim.no_weight_decay_scales(params)

    # --- torch side: per-block tensors so each block gets its own group --
    def _leaf_scale(path, i=None):
        if path[0] == "head" or path[0] == "norm":
            return 1.0
        if path[0] == "blocks":
            return DECAY ** (depth - i)
        return DECAY ** (depth + 1)

    flat_wd = dict(_flatten(wd_tree))
    np_params = jax.tree_util.tree_map(np.asarray, params)
    tensors = {}  # (path, block_idx|None) -> torch tensor
    for path, leaf in _flatten(np_params):
        if path[0] == "blocks":
            for i in range(depth):
                tensors[(path, i)] = torch.tensor(leaf[i]).requires_grad_(True)
        else:
            tensors[(path, None)] = torch.tensor(leaf).requires_grad_(True)

    groups = {}  # (scale, wd) -> params list
    for (path, i), t in tensors.items():
        key = (_leaf_scale(path, i), WEIGHT_DECAY if flat_wd[path] == 1.0 else 0.0)
        groups.setdefault(key, []).append(t)
    opt = torch.optim.AdamW(
        [{"params": ps, "weight_decay": wd, "lr": BASE_LR, "ld_scale": scale}
         for (scale, wd), ps in groups.items()],
        betas=(0.9, 0.999), eps=1e-8,
    )

    def _nest(pairs):
        out = {}
        for path, value in pairs:
            node = out
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = value
        return out

    def _torch_params():
        stacked = {}
        for (path, i), t in tensors.items():
            stacked.setdefault(path, {})[i] = t
        pairs = []
        for path, by_idx in stacked.items():
            if None in by_idx:
                pairs.append((path, by_idx[None]))
            else:
                pairs.append((path, torch.stack([by_idx[i] for i in range(depth)])))
        return _nest(pairs)

    torch_losses = []
    for step, (images, labels) in enumerate(batches):
        for group in opt.param_groups:
            group["lr"] = sched(step) * group["ld_scale"]
        opt.zero_grad()
        logits = _torch_forward(_torch_params(), torch.tensor(images), CFG)
        loss = _torch_loss(logits, torch.tensor(labels))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- jax side: the framework's fine-tune step stack ------------------
    valid = jnp.ones((4,), dtype=bool)

    def loss_fn(p, images, labels):
        logits = vit_forward(p, images, CFG)
        return _loss_from_logits(logits, labels, valid, "binary_bce",
                                 POS_WEIGHT, (1.0, 1.0))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    state = optim.adamw_init(params)
    jax_losses = []
    p = params
    for step, (images, labels) in enumerate(batches):
        loss, grads = grad_fn(p, jnp.asarray(images), jnp.asarray(labels))
        p, state = optim.adamw_update(
            p, grads, state, lr=sched(step),
            weight_decay=WEIGHT_DECAY, lr_scale=lr_tree, wd_scale=wd_tree,
        )
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)

    D = CFG.embed_dim
    final_torch = dict(_flatten(jax.tree_util.tree_map(
        lambda t: t, _torch_params())))
    worst = 0.0
    for path, leaf in _flatten(p):
        got = np.asarray(leaf)
        want = final_torch[path].detach().numpy()
        if path == ("blocks", "attn", "qkv", "bias"):
            got = np.concatenate([got[..., :D], got[..., 2 * D:]], axis=-1)
            want = np.concatenate([want[..., :D], want[..., 2 * D:]], axis=-1)
        denom = max(1e-3, float(np.abs(want).max()))
        worst = max(worst, float(np.abs(got - want).max()) / denom)
    assert worst < 5e-4, f"layer-decay trajectories diverged: rel {worst:.2e}"
