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
