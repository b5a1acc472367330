"""Headline benchmark: MAE ViT-B/16 pretraining step throughput on TPU.

Measures images/sec for the full jitted pretrain step (normalize → random
75% masking → encoder → decoder → masked-pixel MSE → grads → AdamW) at
bf16 compute on the attached chip, matching the reference workload
(``mae/main_pretrain.py``: batch 64/GPU, mask_ratio 0.75).

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver's north-star target is ≥2× A100 images/sec/chip.  We take 825 img/s
as the A100 MAE ViT-B/16 AMP pretrain estimate (MAE repo reports ~41.1h for
800 epochs × 1.28M images on 64 V100s ≈ 217 img/s/V100; A100 ≈ 3.8× V100
on this workload), so baseline = 2 × 825 = 1650 img/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

# Persistent XLA compile cache: TPU compiles via the remote-compile relay
# take 10+ minutes for the fused multi-step executable; with the cache the
# bench re-runs in under a minute.  Must be set before jax initialises.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache"),
)

BASELINE_IMAGES_PER_SEC = 1650.0  # 2x A100 estimate (north-star target)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssl4polyp_tpu.data.augment import normalize_batch
    from ssl4polyp_tpu.models.mae import MAE_VIT_B16, init_mae, mae_forward
    from ssl4polyp_tpu.parallel.mesh import build_mesh
    from ssl4polyp_tpu.training import optim

    import dataclasses
    import os

    cfg = MAE_VIT_B16
    encoder = dataclasses.replace(
        cfg.encoder,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        use_pallas_attention=os.environ.get("BENCH_PALLAS", "1") == "1",
        unroll_blocks=os.environ.get("BENCH_UNROLL", "1") == "1",
        attention_softmax_f32=os.environ.get("BENCH_F32_SOFTMAX", "0") == "1",
        fused_layernorm=(
            None if "BENCH_FUSED_LN" not in os.environ
            else os.environ["BENCH_FUSED_LN"] == "1"
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        encoder=encoder,
        decoder_depth=int(os.environ.get("BENCH_DECODER_DEPTH", cfg.decoder_depth)),
    )
    n_devices = len(jax.devices())
    mesh = build_mesh()
    # 256/chip with one optimizer step per batch mirrors the reference's
    # effective-4096 recipe (256 × 16 chips; MAE uses accum_iter to reach
    # 4096 regardless of world size) and amortises the fixed AdamW +
    # dispatch cost over 4x the images of the per-GPU-64 layout.
    batch = int(os.environ.get("BENCH_BATCH", "256")) * n_devices

    params = init_mae(jax.random.PRNGKey(0), cfg)
    opt_state = optim.adamw_init(params)
    wd_scale = optim.no_weight_decay_scales(params)
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)

    from ssl4polyp_tpu.models.layers import cast_params_for_compute

    def loss_fn(p_c, images_u8, key):
        images = normalize_batch(images_u8, dtype=cfg.encoder.compute_dtype)
        loss, _, _ = mae_forward(p_c, images, key, cfg)
        return loss

    steps_per_call = int(os.environ.get("BENCH_STEPS_PER_CALL", "16"))

    # The compute-dtype parameter copy is carried through the step: the
    # cast of the UPDATED params fuses into the AdamW write (one pass),
    # instead of the forward re-reading the full fp32 tree every microstep.
    # Gradients w.r.t. the bf16 copy are numerically identical to grads
    # w.r.t. fp32 params through the cast (the transpose of a convert is a
    # convert); AdamW upcasts them to fp32 itself.
    def one_step(p, p_c, s, images_u8, key, lr):
        loss, grads = jax.value_and_grad(loss_fn)(p_c, images_u8, key)
        p, s = optim.adamw_update(
            p, grads, s, lr=lr, b1=0.9, b2=0.95, weight_decay=0.05,
            lr_scale=ones, wd_scale=wd_scale,
        )
        p_c = cast_params_for_compute(p, cfg.encoder.compute_dtype)
        return p, p_c, s, loss

    def step(p, p_c, s, images_u8, key, lr):
        if steps_per_call == 1:
            return one_step(p, p_c, s, images_u8, key, lr)

        # K optimizer steps fused into one dispatch: images_u8 is
        # (K, B, H, W, 3); identical math to K sequential steps.
        def body(carry, xs):
            p, p_c, s = carry
            micro_images, micro_key = xs
            p, p_c, s, loss = one_step(p, p_c, s, micro_images, micro_key, lr)
            return (p, p_c, s), loss

        keys = jax.random.split(key, steps_per_call)
        (p, p_c, s), losses = jax.lax.scan(body, (p, p_c, s), (images_u8, keys))
        return p, p_c, s, losses[-1]

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    image_sharding = (
        NamedSharding(mesh, P(None, "data")) if steps_per_call > 1 else sharded
    )
    jit_step = jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, image_sharding,
                      replicated, replicated),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    )

    rng = np.random.default_rng(0)
    image_shape = (batch, 224, 224, 3)
    if steps_per_call > 1:
        image_shape = (steps_per_call, batch, 224, 224, 3)
    images = jax.device_put(
        rng.integers(0, 255, image_shape, dtype=np.uint8),
        NamedSharding(mesh, P(None, "data")) if steps_per_call > 1 else sharded,
    )
    params = jax.device_put(params, replicated)
    params_c = jax.device_put(
        jax.jit(lambda p: cast_params_for_compute(p, cfg.encoder.compute_dtype))(params),
        replicated,
    )
    opt_state = jax.device_put(opt_state, replicated)
    lr = jax.device_put(jnp.float32(1e-3), replicated)

    # Warmup (compile + stabilise); float() forces a device→host readback so
    # timing is robust even if the transport treats block_until_ready loosely.
    key = jax.random.PRNGKey(1)
    for i in range(3):
        params, params_c, opt_state, loss = jit_step(
            params, params_c, opt_state, images, jax.random.fold_in(key, i), lr)
    float(loss)

    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(iters):
        params, params_c, opt_state, loss = jit_step(
            params, params_c, opt_state, images, jax.random.fold_in(key, 100 + i), lr
        )
    float(loss)
    if trace_dir:
        jax.profiler.stop_trace()
    elapsed = time.perf_counter() - t0

    images_per_sec = batch * steps_per_call * iters / elapsed
    per_chip = images_per_sec / n_devices
    print(json.dumps({
        "metric": "mae_vitb16_pretrain_throughput",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
