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


if __name__ == "__main__":
    main()
