"""MAE pretrain-step trajectory parity vs torch (CPU, fp32).

Companion to ``test_trajectory_parity`` for the PRETRAIN stack: N AdamW
(0.9, 0.95) steps of the full MAE computation — patchify, masking,
encoder-on-kept, decoder with mask-token splice/unshuffle, masked-MSE —
on identical weights, images and masks, once through a torch mirror and
once through ``models/mae.py`` + ``training/optim.py``.  Pins the
semantics of ``models_mae.py`` (reference) end to end, including the
frozen sincos pos_embed buffers (``models_mae.py:37,51``) and the
norm-pix-loss variant (``:198-214``).

The mask is the one degree of freedom torch cannot reproduce (JAX PRNG):
the test pre-computes the argsort-of-uniform-noise permutation with the
SAME key ``mae_forward`` consumes and feeds the torch mirror those
indices.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ssl4polyp_tpu.models.mae import (  # noqa: E402
    MAEConfig,
    init_mae,
    mae_forward,
    patchify,
)
from ssl4polyp_tpu.models.vit import ViTConfig  # noqa: E402
from ssl4polyp_tpu.training import optim  # noqa: E402
from ssl4polyp_tpu.training.schedules import warmup_cosine  # noqa: E402

CFG = MAEConfig(
    encoder=ViTConfig(img_size=32, patch_size=8, embed_dim=32, depth=2,
                      num_heads=4, compute_dtype=jnp.float32,
                      use_pallas_attention=False, unroll_blocks=True),
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=4,
    mask_ratio=0.75,
)

N_STEPS = 8
BASE_LR = 1.5e-3
WEIGHT_DECAY = 0.05


def _to_torch(tree):
    if isinstance(tree, dict):
        return {k: _to_torch(v) for k, v in tree.items()}
    tensor = torch.tensor(np.asarray(tree), dtype=torch.float32)
    tensor.requires_grad_(True)
    return tensor


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for key, value in tree.items():
            yield from _flatten(value, path + (key,))
    else:
        yield path, tree


def _torch_blocks(x, blocks, depth, heads, eps):
    dim = x.shape[-1]
    hd = dim // heads
    for i in range(depth):
        def b(leaf):
            return leaf[i]

        h = F.layer_norm(x, (dim,), b(blocks["ln1"]["scale"]),
                         b(blocks["ln1"]["bias"]), eps=eps)
        qkv = h @ b(blocks["attn"]["qkv"]["kernel"]) + b(blocks["attn"]["qkv"]["bias"])
        B, N = qkv.shape[0], qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, heads, hd)
        q, k, v = (t.transpose(1, 2) for t in qkv.unbind(dim=2))
        weights = torch.softmax((q @ k.transpose(-2, -1)) / math.sqrt(hd), dim=-1)
        out = (weights @ v).transpose(1, 2).reshape(B, N, dim)
        x = x + out @ b(blocks["attn"]["proj"]["kernel"]) + b(blocks["attn"]["proj"]["bias"])
        h = F.layer_norm(x, (dim,), b(blocks["ln2"]["scale"]),
                         b(blocks["ln2"]["bias"]), eps=eps)
        h = h @ b(blocks["mlp"]["fc1"]["kernel"]) + b(blocks["mlp"]["fc1"]["bias"])
        h = F.gelu(h)
        x = x + h @ b(blocks["mlp"]["fc2"]["kernel"]) + b(blocks["mlp"]["fc2"]["bias"])
    return x


def _torch_patchify(images, p):
    B, H, W, C = images.shape
    g = H // p
    x = images.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, g * g, p * p * C)


def _torch_mae_forward(tp, images, ids_keep, ids_restore, mask, cfg: MAEConfig,
                       norm_pix=False):
    enc = cfg.encoder
    eps = enc.ln_eps
    B = images.shape[0]
    patches = _torch_patchify(images, enc.patch_size)
    x = patches @ tp["patch_embed"]["kernel"] + tp["patch_embed"]["bias"]
    pos = tp["pos_embed"]
    x = x + pos[:, 1:, :]
    kept = torch.gather(
        x, 1, ids_keep.unsqueeze(-1).expand(B, ids_keep.shape[1], enc.embed_dim)
    )
    cls = (tp["cls_token"] + pos[:, :1, :]).expand(B, 1, enc.embed_dim)
    h = torch.cat([cls, kept], dim=1)
    h = _torch_blocks(h, tp["blocks"], enc.depth, enc.num_heads, eps)
    h = F.layer_norm(h, (enc.embed_dim,), tp["norm"]["scale"], tp["norm"]["bias"],
                     eps=eps)

    dec = tp["decoder"]
    z = h @ dec["embed"]["kernel"] + dec["embed"]["bias"]
    L = ids_restore.shape[1]
    n_masked = L + 1 - z.shape[1]
    mask_tokens = dec["mask_token"].expand(B, n_masked, cfg.decoder_embed_dim)
    body = torch.cat([z[:, 1:, :], mask_tokens], dim=1)
    body = torch.gather(
        body, 1, ids_restore.unsqueeze(-1).expand(B, L, cfg.decoder_embed_dim)
    )
    z = torch.cat([z[:, :1, :], body], dim=1)
    z = z + dec["pos_embed"]
    z = _torch_blocks(z, dec["blocks"], cfg.decoder_depth, cfg.decoder_num_heads, eps)
    z = F.layer_norm(z, (cfg.decoder_embed_dim,), dec["norm"]["scale"],
                     dec["norm"]["bias"], eps=eps)
    pred = (z @ dec["pred"]["kernel"] + dec["pred"]["bias"])[:, 1:, :]

    target = patches
    if norm_pix:
        mean = target.mean(dim=-1, keepdim=True)
        var = target.var(dim=-1, keepdim=True, unbiased=False)
        target = (target - mean) / torch.sqrt(var + 1e-6)
    per_patch = ((pred - target) ** 2).mean(dim=-1)
    return (per_patch * mask).sum() / mask.sum().clamp(min=1.0)


def _mask_arrays(key, B, L, len_keep):
    """The exact masking mae_forward will derive from `key`."""
    noise = jax.random.uniform(key, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((B, L)).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return (np.asarray(ids_keep), np.asarray(ids_restore), np.asarray(mask))


def test_mae_training_trajectory_matches_torch():
    params = init_mae(jax.random.PRNGKey(0), CFG)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    tp = _to_torch(jax.tree_util.tree_map(np.asarray, params))
    # frozen sincos buffers (reference models_mae.py:37,51)
    tp["pos_embed"].requires_grad_(False)
    tp["decoder"]["pos_embed"].requires_grad_(False)

    rng = np.random.default_rng(7)
    batches = [rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
               for _ in range(N_STEPS)]
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(99), i)
                 for i in range(N_STEPS)]
    sched = warmup_cosine(BASE_LR, total_steps=N_STEPS, warmup_steps=2)

    # --- torch side -----------------------------------------------------
    wd_tree = optim.no_weight_decay_scales(params)
    flat_wd = dict(_flatten(wd_tree))
    decay, no_decay = [], []
    for path, tensor in _flatten(tp):
        if not tensor.requires_grad:
            continue
        (decay if flat_wd[path] == 1.0 else no_decay).append(tensor)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WEIGHT_DECAY},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=BASE_LR, betas=(0.9, 0.95), eps=1e-8,
    )
    L = CFG.encoder.num_patches
    torch_losses = []
    for step, images in enumerate(batches):
        ids_keep, ids_restore, mask = _mask_arrays(
            step_keys[step], images.shape[0], L, CFG.len_keep
        )
        for group in opt.param_groups:
            group["lr"] = sched(step)
        opt.zero_grad()
        loss = _torch_mae_forward(
            tp, torch.tensor(images), torch.tensor(ids_keep),
            torch.tensor(ids_restore), torch.tensor(mask), CFG,
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # --- jax side: the framework's actual pretrain math ------------------
    def loss_fn(p, images, key):
        loss, _, _ = mae_forward(p, images, key, CFG)
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    state = optim.adamw_init(params)
    lr_scale = optim.pretrain_lr_scales(params)
    jax_losses = []
    for step, images in enumerate(batches):
        loss, grads = grad_fn(params, jnp.asarray(images), step_keys[step])
        params, state = optim.adamw_update(
            params, grads, state, lr=sched(step), b1=0.9, b2=0.95,
            weight_decay=WEIGHT_DECAY, lr_scale=lr_scale, wd_scale=wd_tree,
        )
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)

    flat_torch = dict(_flatten(tp))
    for path, leaf in _flatten(params):
        got = np.asarray(leaf)
        want = flat_torch[path].detach().numpy()
        if path[-2:] == ("qkv", "bias"):
            # K-slice of the fused QKV bias: zero-gradient direction that
            # Adam random-walks differently per framework (see
            # test_trajectory_parity) — exclude.
            D = got.shape[-1] // 3
            got = np.concatenate([got[:, :D], got[:, 2 * D:]], axis=1)
            want = np.concatenate([want[:, :D], want[:, 2 * D:]], axis=1)
        denom = max(1e-3, float(np.abs(want).max()))
        worst = float(np.abs(got - want).max()) / denom
        assert worst < 1e-3, f"{'/'.join(path)} diverged: rel {worst:.2e}"


def test_norm_pix_loss_matches_torch():
    cfg = MAEConfig(
        encoder=CFG.encoder, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=4, mask_ratio=0.75, norm_pix_loss=True,
    )
    params = init_mae(jax.random.PRNGKey(3), cfg)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    tp = _to_torch(jax.tree_util.tree_map(np.asarray, params))
    images = np.random.default_rng(5).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    L = cfg.encoder.num_patches
    ids_keep, ids_restore, mask = _mask_arrays(key, 2, L, cfg.len_keep)

    jax_loss, _, _ = mae_forward(params, jnp.asarray(images), key, cfg)
    torch_loss = _torch_mae_forward(
        tp, torch.tensor(images), torch.tensor(ids_keep),
        torch.tensor(ids_restore), torch.tensor(mask), cfg, norm_pix=True,
    )
    np.testing.assert_allclose(float(jax_loss), float(torch_loss), rtol=1e-5)


def test_patchify_matches_torch_layout():
    images = np.random.default_rng(1).uniform(size=(2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(patchify(jnp.asarray(images), 8))
    theirs = _torch_patchify(torch.tensor(images), 8).numpy()
    np.testing.assert_array_equal(ours, theirs)
