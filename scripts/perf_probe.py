"""Per-component timing probe for the MAE pretrain step on the attached chip.

Times (fwd+bwd, jitted, donated where possible):
  * encoder blocks alone (50 tokens, 12 blocks, D=768)
  * decoder blocks alone (197 tokens, 8 blocks, D=512, head_dim 32)
  * AdamW update alone (full MAE param tree)
  * full pretrain step (loss+grads+AdamW)

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache python scripts/perf_probe.py
Env: PROBE_BATCH (64), PROBE_PALLAS (1), PROBE_UNROLL (1)
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssl4polyp_tpu.data.augment import normalize_batch
from ssl4polyp_tpu.models import layers
from ssl4polyp_tpu.models.mae import MAE_VIT_B16, init_mae, mae_forward
from ssl4polyp_tpu.training import optim

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
PALLAS = os.environ.get("PROBE_PALLAS", "1") == "1"
UNROLL = os.environ.get("PROBE_UNROLL", "1") == "1"
ITERS = int(os.environ.get("PROBE_ITERS", "20"))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    cfg = MAE_VIT_B16
    encoder = dataclasses.replace(
        cfg.encoder, remat=False, use_pallas_attention=PALLAS,
        unroll_blocks=UNROLL, attention_softmax_f32=False,
    )
    cfg = dataclasses.replace(cfg, encoder=encoder)
    key = jax.random.PRNGKey(0)
    params = init_mae(key, cfg)

    # --- component: encoder blocks (B, 50, 768) ---
    enc_blocks = params["blocks"]
    x_enc = jnp.asarray(np.random.randn(BATCH, 50, 768), dtype=jnp.bfloat16)

    def enc_loss(blocks, x):
        blocks = layers.cast_params_for_compute(blocks, jnp.bfloat16)
        y = layers.run_blocks(x, blocks, 12, use_pallas=PALLAS,
                              unroll=UNROLL, softmax_f32=False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    enc_grad = jax.jit(jax.grad(enc_loss))
    timeit("encoder blocks fwd+bwd", enc_grad, enc_blocks, x_enc)

    # --- component: decoder blocks (B, 197, 512) ---
    dec_blocks = params["decoder"]["blocks"]
    x_dec = jnp.asarray(np.random.randn(BATCH, 197, 512), dtype=jnp.bfloat16)

    def dec_loss(blocks, x):
        blocks = layers.cast_params_for_compute(blocks, jnp.bfloat16)
        y = layers.run_blocks(x, blocks, 16, use_pallas=PALLAS,
                              unroll=UNROLL, softmax_f32=False)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    dec_grad = jax.jit(jax.grad(dec_loss))
    timeit("decoder blocks fwd+bwd", dec_grad, dec_blocks, x_dec)

    # --- component: AdamW ---
    opt_state = optim.adamw_init(params)
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    wd = optim.no_weight_decay_scales(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    @jax.jit
    def adamw(p, g, s):
        return optim.adamw_update(p, g, s, lr=1e-3, b1=0.9, b2=0.95,
                                  weight_decay=0.05, lr_scale=ones, wd_scale=wd)

    timeit("adamw update (full tree)", adamw, params, grads, opt_state)

    # --- full step ---
    images = jnp.asarray(
        np.random.randint(0, 255, (BATCH, 224, 224, 3), dtype=np.uint8))

    def loss_fn(p, images_u8, k):
        imgs = normalize_batch(images_u8, dtype=jnp.bfloat16)
        loss, _, _ = mae_forward(p, imgs, k, cfg)
        return loss

    @jax.jit
    def full_step(p, s, images_u8, k):
        loss, g = jax.value_and_grad(loss_fn)(p, images_u8, k)
        p, s = optim.adamw_update(p, g, s, lr=1e-3, b1=0.9, b2=0.95,
                                  weight_decay=0.05, lr_scale=ones, wd_scale=wd)
        return p, s, loss

    dt = timeit("full step (loss+grads+adamw)", full_step, params, opt_state,
                images, jax.random.PRNGKey(1))
    print(f"throughput @ batch {BATCH}: {BATCH / dt * 1e3:.0f} img/s")


if __name__ == "__main__":
    main()
