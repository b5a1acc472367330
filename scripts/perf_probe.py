"""Per-component timing probe for the MAE pretrain step on the attached chip.

Times (fwd+bwd, jitted) with a forced device→host readback per timing loop
(the axon relay queues dispatches asynchronously; see CLAUDE.md gotchas):

  * encoder blocks alone (50 tokens, 12 blocks, D=768) — XLA vs Pallas attn
  * decoder blocks alone (197 tokens, 8 blocks, D=512, head_dim 32) — both
  * AdamW update alone (full MAE param tree)
  * embed/mask/loss shell (full step minus all transformer blocks)

Run from the repo root:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache python scripts/perf_probe.py
Env: PROBE_BATCH (64), PROBE_ITERS (20), PROBE_SECTIONS (csv filter).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssl4polyp_tpu.data.augment import normalize_batch
from ssl4polyp_tpu.models import layers
from ssl4polyp_tpu.models.mae import MAE_VIT_B16, init_mae, mae_forward
from ssl4polyp_tpu.training import optim

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
ITERS = int(os.environ.get("PROBE_ITERS", "20"))
SECTIONS = os.environ.get("PROBE_SECTIONS", "").split(",") if os.environ.get("PROBE_SECTIONS") else None


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)


def timeit(name, fn, *args):
    if SECTIONS is not None and not any(s in name for s in SECTIONS):
        return None
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def block_probe(name, blocks, x, heads, pallas):
    def loss(b, x):
        b = layers.cast_params_for_compute(b, jnp.bfloat16)
        y = layers.run_blocks(x, b, heads, use_pallas=pallas,
                              unroll=True, softmax_f32=False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timeit(name, jax.jit(jax.grad(loss)), blocks, x)


def main():
    cfg = MAE_VIT_B16
    encoder = dataclasses.replace(
        cfg.encoder, remat=False, use_pallas_attention=True,
        unroll_blocks=True, attention_softmax_f32=False,
    )
    cfg = dataclasses.replace(cfg, encoder=encoder)
    key = jax.random.PRNGKey(0)
    params = init_mae(key, cfg)

    enc_blocks = params["blocks"]
    dec_blocks = params["decoder"]["blocks"]
    x_enc = jnp.asarray(np.random.randn(BATCH, 50, 768), dtype=jnp.bfloat16)
    x_dec = jnp.asarray(np.random.randn(BATCH, 197, 512), dtype=jnp.bfloat16)

    block_probe("encoder blocks fwd+bwd [pallas]", enc_blocks, x_enc, 12, True)
    block_probe("encoder blocks fwd+bwd [xla]", enc_blocks, x_enc, 12, False)
    block_probe("decoder blocks fwd+bwd [pallas]", dec_blocks, x_dec, 16, True)
    block_probe("decoder blocks fwd+bwd [xla]", dec_blocks, x_dec, 16, False)

    # --- AdamW ---
    opt_state = optim.adamw_init(params)
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    wd = optim.no_weight_decay_scales(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    @jax.jit
    def adamw(p, g, s):
        return optim.adamw_update(p, g, s, lr=1e-3, b1=0.9, b2=0.95,
                                  weight_decay=0.05, lr_scale=ones, wd_scale=wd)

    timeit("adamw update (full tree)", adamw, params, grads, opt_state)

    # --- shell: full forward/backward at depth 1+1 (embed, mask, decoder
    # splice, pred head, loss + one block each — subtract per-block costs
    # from above to get the pure shell) ---
    shell_cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(encoder, depth=1),
        decoder_depth=1,
    )
    shell_params = init_mae(key, shell_cfg)
    images = jnp.asarray(
        np.random.randint(0, 255, (BATCH, 224, 224, 3), dtype=np.uint8))

    def shell_loss(p, images_u8, k):
        imgs = normalize_batch(images_u8, dtype=jnp.bfloat16)
        loss, _, _ = mae_forward(p, imgs, k, shell_cfg)
        return loss

    timeit("shell (embed+mask+pred+loss+2blk) fwd+bwd",
           jax.jit(jax.grad(shell_loss)), shell_params, images,
           jax.random.PRNGKey(1))

    # --- fine-tune components (classification step: full 197-token
    # encoder padded to 200, flattened 2-D stream + fc1 kernel — the
    # production engine defaults; see factory.py pad_tokens_to).  Subtract
    # 12× the per-block cost from the finetune shell + blocks to localise
    # where the 1178 img/s step diverges from the MAE budget. ---
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit

    x_ft = jnp.asarray(np.random.randn(BATCH, 200, 768), dtype=jnp.bfloat16)

    def ft_block_probe(name, pallas):
        def loss(b, x):
            b = layers.cast_params_for_compute(b, jnp.bfloat16)
            y = layers.run_blocks(
                x, b, 12, use_pallas=pallas, unroll=True,
                softmax_f32=False, valid_len=197 if pallas else None,
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        timeit(name, jax.jit(jax.grad(loss)), enc_blocks, x_ft)

    ft_block_probe("finetune vit blocks fwd+bwd @200 [pallas]", True)
    ft_block_probe("finetune vit blocks fwd+bwd @200 [xla]", False)

    classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(2), None, num_classes=2, depth=1,
        unroll_blocks=True, use_pallas_attention=True,
    )
    labels = jnp.asarray(np.random.randint(0, 2, (BATCH,)), dtype=jnp.int32)

    def ft_shell_loss(p, images_u8, y):
        imgs = normalize_batch(images_u8, dtype=classifier.cfg.compute_dtype)
        logits = classifier.apply(
            layers.cast_params_for_compute(p, classifier.cfg.compute_dtype),
            imgs,
        ).astype(jnp.float32)
        one_hot = jax.nn.one_hot(y, 2)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))

    timeit("finetune shell (embed+pool+head+loss+1blk)",
           jax.jit(jax.grad(ft_shell_loss)), classifier.params, images, labels)

    full_classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(3), None, num_classes=2)
    ft_state = optim.adamw_init(full_classifier.params)
    ft_ones = jax.tree_util.tree_map(lambda _: 1.0, full_classifier.params)
    ft_wd = optim.no_weight_decay_scales(full_classifier.params)
    ft_grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p) * 1e-4, full_classifier.params)

    @jax.jit
    def ft_adamw(p, g, s):
        return optim.adamw_update(p, g, s, lr=1e-3, b1=0.9, b2=0.999,
                                  weight_decay=0.05, lr_scale=ft_ones,
                                  wd_scale=ft_wd)

    timeit("finetune adamw update (classifier tree)",
           ft_adamw, full_classifier.params, ft_grads, ft_state)


if __name__ == "__main__":
    main()
