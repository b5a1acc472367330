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
from pathlib import Path

# Persistent XLA compile cache: TPU compiles via the remote-compile relay
# take 10+ minutes for the fused multi-step executable; with the cache the
# bench re-runs in under a minute.  Must be set before jax initialises.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache"),
)

# Honor JAX_PLATFORMS (e.g. =cpu) over the sitecustomize's axon pin so the
# bench can be smoke-run on the host mesh when the TPU relay is down.
from ssl4polyp_tpu.utils.platform import honor_platform_env

honor_platform_env()

BASELINE_IMAGES_PER_SEC = 1650.0  # 2x A100 estimate (north-star target)

# The measured-best operating point (PERF_NOTES.md round 3: 1761 img/s/chip
# at 1.067x).  These are the env-knob defaults; tests/test_bench_config.py
# pins them so a drive-by default change can't silently flip the driver's
# perf gate — change them only WITH a fresh measurement logged in
# PERF_NOTES.md, and update the test in the same commit.
DEFAULTS = {
    "BENCH_BATCH": "256",            # 320/384/512 all measured slower
    "BENCH_STEPS_PER_CALL": "16",    # 8 measured slower (1673)
    "BENCH_PALLAS": "1",             # XLA attention is -40% (1065)
    "BENCH_UNROLL": "1",             # scan is ~25% slower at runtime
    "BENCH_REMAT": "0",
    "BENCH_F32_SOFTMAX": "0",
    "BENCH_DECODER_PAD": "200",      # sublane-aligned flattened stream
    "BENCH_ENCODER_PAD": "0",        # 56 measured slower (1748)
    "BENCH_VIT_PAD": "1",            # finetune +5.2% (1192 vs 1133)
    "BENCH_MLP": "fc1",              # "full"/"full_ln" = one-kernel MLP (A/B)
    "BENCH_QKV_LN": "0",             # 1 = LN folded into QKV projection (A/B)
    "BENCH_ITERS": "10",
    "BENCH_TRIALS": "3",
}


def _env(name: str) -> str:
    return os.environ.get(name, DEFAULTS[name])


def _measure(jit_call, *, images_per_iter: int, n_devices: int):
    """(median img/s/chip, per-trial list): trials × iters dispatches with a
    forced readback per trial (the relay treats block_until_ready loosely)."""
    import numpy as np

    iters = int(_env("BENCH_ITERS"))
    trials = int(_env("BENCH_TRIALS"))
    if iters < 1 or trials < 1:
        raise SystemExit(
            f"BENCH_ITERS ({iters}) and BENCH_TRIALS ({trials}) must be >= 1"
        )
    per_trial = []
    step = 0
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jit_call(step)
            step += 1
        float(out)
        elapsed = time.perf_counter() - t0
        per_trial.append(images_per_iter * iters / elapsed / n_devices)
    return float(np.median(per_trial)), per_trial


def _emit(metric: str, per_chip: float, per_trial, *, baseline: float,
          extra: dict | None = None) -> None:
    import numpy as np

    q1, q3 = (float(np.quantile(per_trial, q)) for q in (0.25, 0.75))
    record = {
        "metric": metric,
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / baseline, 3),
        "trials": len(per_trial),
        "iqr": [round(q1, 1), round(q3, 1)],
        "min": round(min(per_trial), 1),
        "max": round(max(per_trial), 1),
    }
    if extra:
        record.update(extra)
    print(json.dumps(record))


def _peak_tflops_per_chip() -> float:
    """bf16 peak of the attached chip (BENCH_PEAK_TFLOPS overrides).

    Published per-chip dense bf16 peaks; substring-matched on
    ``device_kind``.  Unknown kinds (incl. the CPU smoke mesh) return 0 and
    the MFU field is omitted rather than fabricated."""
    import jax

    override = os.environ.get("BENCH_PEAK_TFLOPS")
    if override:
        return float(override)
    kind = (jax.devices()[0].device_kind or "").lower()
    table = [
        ("v5 lite", 197.0), ("v5e", 197.0),
        ("v5p", 459.0), ("v5", 459.0),
        ("v6 lite", 918.0), ("v6e", 918.0),
        ("v4", 275.0),
        ("v3", 123.0),
        ("v2", 46.0),
    ]
    for key, peak in table:
        if key in kind:
            return peak
    return 0.0


def _mae_train_flops_per_image(cfg) -> float:
    """Analytic matmul FLOPs for one image's MAE train step (fwd + bwd).

    Per transformer block forward (2·M·N·K FLOPs per matmul): QKV 6·N·D² +
    scores 2·N²·D + AV 2·N²·D + proj 2·N·D² + MLP 16·N·D², totalling
    24·N·D² + 4·N²·D FLOPs.  Backward
    ≈ 2× forward (dX and dW per matmul); remat would add ~1 fwd more (the
    default runs remat off).  Padded sequence lengths count as executed
    FLOPs.  At ViT-B/16 mask 0.75 this lands at ≈59 GF/img — consistent
    with the round-1 trace's ~58 TF/s plateau at 787 img/s with remat
    (≈4× fwd ≈ 79 GF/img)."""
    enc = cfg.encoder
    n_enc = 1 + cfg.len_keep
    if cfg.encoder_pad_to:
        n_enc = max(n_enc, int(cfg.encoder_pad_to))
    n_dec = 1 + enc.num_patches
    if cfg.decoder_pad_to:
        n_dec = max(n_dec, int(cfg.decoder_pad_to))

    def block_fwd(n: int, d: int) -> float:
        return 24.0 * n * d * d + 4.0 * n * n * d

    d_enc, d_dec = enc.embed_dim, cfg.decoder_embed_dim
    fwd = enc.depth * block_fwd(n_enc, d_enc)
    fwd += cfg.decoder_depth * block_fwd(n_dec, d_dec)
    fwd += 2.0 * enc.num_patches * enc.patch_dim * d_enc      # patch embed
    fwd += 2.0 * n_enc * d_enc * d_dec                        # decoder embed
    fwd += 2.0 * n_dec * d_dec * enc.patch_dim                # pixel pred
    bwd_factor = 3.0 if getattr(enc, "remat", False) else 2.0
    return fwd * (1.0 + bwd_factor)


def bench_finetune() -> None:
    """ViT-B/16 classification fine-tune step (augment → fwd → bwd → AdamW)
    at the reference's batch 128 (``config/base.yaml:1-13``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssl4polyp_tpu.data.augment import normalize_batch
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit
    from ssl4polyp_tpu.models.layers import cast_params_for_compute
    from ssl4polyp_tpu.parallel.mesh import build_mesh
    from ssl4polyp_tpu.training import optim

    mesh = build_mesh()
    n_devices = len(jax.devices())
    batch = int(_env("BENCH_BATCH")) * n_devices
    classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(0), None, num_classes=2,
        # CPU smoke only: shrink the model so the fused-dispatch path can
        # be compile-checked without a full ViT-B CPU build.
        depth=int(os.environ.get("BENCH_FT_DEPTH", "12")),
        unroll_blocks=_env("BENCH_UNROLL") == "1",
        use_pallas_attention=_env("BENCH_PALLAS") == "1",
        # BENCH_VIT_PAD=0 opts out of the factory's sublane padding (A/B).
        pad_tokens_to=(
            None if _env("BENCH_VIT_PAD") == "1" else 0
        ),
        mlp_fusion=_env("BENCH_MLP"),
        qkv_ln_fusion=_env("BENCH_QKV_LN") == "1",
    )
    cfg = classifier.cfg
    params = classifier.params
    opt_state = optim.adamw_init(params)
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    wd_scale = optim.no_weight_decay_scales(params)

    # BENCH_FT_STEPS_PER_CALL=K fuses K optimizer steps per dispatch (the
    # engine's plan.steps_per_call path).  Round-4 measured: 4 → 1175.1
    # vs 1155.9 img/s at 1 (+1.7%); 8 is equal within noise (1174.0).
    ft_steps = max(1, int(os.environ.get("BENCH_FT_STEPS_PER_CALL", "4")))

    def step(p, s, images_u8, labels):
        def loss_fn(p):
            images = normalize_batch(images_u8, dtype=cfg.compute_dtype)
            logits = classifier.apply(
                cast_params_for_compute(p, cfg.compute_dtype), images
            ).astype(jnp.float32)
            one_hot = jax.nn.one_hot(labels, 2)
            return -jnp.mean(
                jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = optim.adamw_update(
            p, grads, s, lr=1e-3, weight_decay=0.05,
            lr_scale=ones, wd_scale=wd_scale,
        )
        return p, s, loss

    def fused(p, s, images_u8, labels):
        def body(carry, xs):
            p, s = carry
            p, s, loss = step(p, s, xs[0], xs[1])
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), (images_u8, labels))
        return p, s, losses[-1]

    replicated = NamedSharding(mesh, P())
    if ft_steps > 1:
        sharded = NamedSharding(mesh, P(None, "data"))
        jit_step = jax.jit(
            fused,
            in_shardings=(replicated, replicated, sharded, sharded),
            out_shardings=(replicated, replicated, replicated),
            donate_argnums=(0, 1),
        )
    else:
        sharded = NamedSharding(mesh, P("data"))
        jit_step = jax.jit(
            step,
            in_shardings=(replicated, replicated, sharded, sharded),
            out_shardings=(replicated, replicated, replicated),
            donate_argnums=(0, 1),
        )
    rng = np.random.default_rng(0)
    img_shape = (ft_steps, batch, 224, 224, 3) if ft_steps > 1 else (batch, 224, 224, 3)
    lbl_shape = (ft_steps, batch) if ft_steps > 1 else (batch,)
    images = jax.device_put(
        rng.integers(0, 255, img_shape, dtype=np.uint8), sharded
    )
    labels = jax.device_put(rng.integers(0, 2, lbl_shape, dtype=np.int32), sharded)
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)
    state = {"p": params, "s": opt_state}
    for _ in range(3):
        state["p"], state["s"], loss = jit_step(state["p"], state["s"], images, labels)
    float(loss)

    def call(_):
        state["p"], state["s"], loss = jit_step(state["p"], state["s"], images, labels)
        return loss

    per_chip, per_trial = _measure(
        call, images_per_iter=batch * ft_steps, n_devices=n_devices
    )
    _emit("vitb16_finetune_throughput", per_chip, per_trial,
          baseline=float(os.environ.get("BENCH_FT_BASELINE", "1650")))


def bench_eval() -> None:
    """ViT-B/16 inference forward (uint8 → logits) device throughput.

    Images are staged onto the mesh once: the engine's ``make_forward_fn``
    includes per-batch host↔device staging, which on this container goes
    through the axon relay (~40 MB at <1 MB/s readback) and measures the
    transport, not the chip — on a real TPU-VM the loader overlaps that
    PCIe copy with compute."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssl4polyp_tpu.data.augment import normalize_batch
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit
    from ssl4polyp_tpu.models.layers import cast_params_for_compute
    from ssl4polyp_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    n_devices = len(jax.devices())
    batch = int(_env("BENCH_BATCH")) * n_devices
    classifier = get_imagenet_or_random_vit(
        jax.random.PRNGKey(0), None, num_classes=2,
        unroll_blocks=_env("BENCH_UNROLL") == "1",
        use_pallas_attention=_env("BENCH_PALLAS") == "1",
        pad_tokens_to=(
            None if _env("BENCH_VIT_PAD") == "1" else 0
        ),
    )
    cfg = classifier.cfg
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    @jax.jit
    def forward(params, images_u8):
        images = normalize_batch(images_u8, dtype=cfg.compute_dtype)
        logits = classifier.apply(params, images).astype(jnp.float32)
        return logits.sum()  # scalar readback only

    params = jax.device_put(
        cast_params_for_compute(classifier.params, cfg.compute_dtype), replicated
    )
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (batch, 224, 224, 3), dtype=np.uint8), sharded
    )
    for _ in range(3):
        out = forward(params, images)
    float(out)

    def call(_):
        return forward(params, images)

    per_chip, per_trial = _measure(call, images_per_iter=batch, n_devices=n_devices)
    _emit("vitb16_eval_throughput", per_chip, per_trial,
          baseline=float(os.environ.get("BENCH_EVAL_BASELINE", "5000")))


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
        remat=_env("BENCH_REMAT") == "1",
        use_pallas_attention=_env("BENCH_PALLAS") == "1",
        unroll_blocks=_env("BENCH_UNROLL") == "1",
        attention_softmax_f32=_env("BENCH_F32_SOFTMAX") == "1",
        fused_layernorm=(
            None if "BENCH_FUSED_LN" not in os.environ
            else os.environ["BENCH_FUSED_LN"] == "1"
        ),
        mlp_fusion=_env("BENCH_MLP"),
        qkv_ln_fusion=_env("BENCH_QKV_LN") == "1",
    )
    cfg = dataclasses.replace(
        cfg,
        encoder=encoder,
        decoder_depth=int(os.environ.get("BENCH_DECODER_DEPTH", cfg.decoder_depth)),
        # Default 200: sublane-aligned N makes the flattened stream's kernel
        # views bitcasts (no relayout copies); exactness is masked/tested.
        decoder_pad_to=(
            int(_env("BENCH_DECODER_PAD")) or None
        ),
        encoder_pad_to=(
            int(_env("BENCH_ENCODER_PAD")) or None
        ),
    )
    n_devices = len(jax.devices())
    mesh = build_mesh()
    # 256/chip with one optimizer step per batch mirrors the reference's
    # effective-4096 recipe (256 × 16 chips; MAE uses accum_iter to reach
    # 4096 regardless of world size) and amortises the fixed AdamW +
    # dispatch cost over 4x the images of the per-GPU-64 layout.
    batch = int(_env("BENCH_BATCH")) * n_devices

    params = init_mae(jax.random.PRNGKey(0), cfg)
    opt_state = optim.adamw_init(params)
    wd_scale = optim.no_weight_decay_scales(params)
    # Matches the engine: frozen sincos pos_embed leaves (lr 0).
    ones = optim.pretrain_lr_scales(params)

    from ssl4polyp_tpu.models.layers import cast_params_for_compute

    def loss_fn(p_c, images_u8, key):
        images = normalize_batch(images_u8, dtype=cfg.encoder.compute_dtype)
        loss, _, _ = mae_forward(p_c, images, key, cfg)
        return loss

    steps_per_call = int(_env("BENCH_STEPS_PER_CALL"))

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

    # The gate is a median over independent trials, not a single sample —
    # the axon relay's dispatch jitter is real (~20% under host contention).
    state = {"p": params, "pc": params_c, "s": opt_state}

    def call(i):
        state["p"], state["pc"], state["s"], loss = jit_step(
            state["p"], state["pc"], state["s"], images,
            jax.random.fold_in(key, 100 + i), lr,
        )
        return loss

    per_chip, per_trial = _measure(
        call, images_per_iter=batch * steps_per_call, n_devices=n_devices
    )
    if trace_dir:
        jax.profiler.stop_trace()
    # MFU: analytic matmul FLOPs/img × achieved rate ÷ the chip's bf16 peak
    # (VERDICT r4 item 8 — track utilisation, not just throughput).
    flops_per_image = _mae_train_flops_per_image(cfg)
    extra = {"flops_per_image_g": round(flops_per_image / 1e9, 2)}
    peak = _peak_tflops_per_chip()
    if peak > 0:
        extra["mfu"] = round(per_chip * flops_per_image / (peak * 1e12), 4)
        extra["peak_tflops"] = peak
        extra["achieved_tflops"] = round(per_chip * flops_per_image / 1e12, 1)
    _emit("mae_vitb16_pretrain_throughput", per_chip, per_trial,
          baseline=BASELINE_IMAGES_PER_SEC, extra=extra)


def _ensure_corpus(n_frames: int, src_h: int, src_w: int) -> Path:
    """Synthetic JPEG corpus at SUN-like source resolution (cached in /tmp).

    Low-frequency content + noise gives realistic JPEG entropy (pure noise
    decodes unrealistically slowly; flat color unrealistically fast)."""
    import tempfile

    import numpy as np
    from PIL import Image

    corpus = Path(tempfile.gettempdir()) / f"bench_input_{n_frames}_{src_h}x{src_w}"
    if not corpus.exists() or len(list(corpus.glob("*.jpg"))) < n_frames:
        corpus.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_frames):
            base = rng.integers(0, 255, size=(src_h // 16, src_w // 16, 3),
                                dtype=np.uint8)
            img = Image.fromarray(base).resize((src_w, src_h), Image.BILINEAR)
            arr = np.asarray(img, dtype=np.int16)
            arr = np.clip(
                arr + rng.integers(-12, 12, size=arr.shape, dtype=np.int16),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).save(corpus / f"f{i:05d}.jpg", quality=90)
    return corpus


def bench_e2e() -> None:
    """Combined loader→device sustained pipeline (VERDICT r4 item 4).

    The host PretrainLoader (JPEG decode + random-resized-crop, native C++
    path when available) feeds the REAL jitted MAE train step concurrently
    — prefetch threads decode the next batches while the chip steps.  This
    measures the overlap, not two separate numbers:

    * ``value``: end-to-end images/sec/chip through the combined pipeline;
    * ``host_fetch_wait_fraction``: share of wall time the dispatch loop
      spent blocked waiting for the next host batch (0 ⇒ host fully hides
      behind device compute; ~1 ⇒ host-bound);
    * ``device_only_img_s``: same step on pre-staged device batches,
      measured in-run (the stall-free ceiling);
    * ``projected_full_host_img_s``: honest projection of the host rate to
      BENCH_INPUT_HOST_CORES cores when this terminal exposes a subset.

    Reference counterpart: torch DataLoader workers feeding DDP
    (``packs.py:319-394`` + ``engine_pretrain.py:22``).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssl4polyp_tpu.data.augment import normalize_batch
    from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader
    from ssl4polyp_tpu.models.layers import cast_params_for_compute
    from ssl4polyp_tpu.models.mae import MAE_VIT_B16, init_mae, mae_forward
    from ssl4polyp_tpu.parallel.mesh import build_mesh
    from ssl4polyp_tpu.training import optim

    n_devices = len(jax.devices())
    batch = int(_env("BENCH_BATCH")) * n_devices
    workers = int(os.environ.get("BENCH_E2E_WORKERS", "32"))
    n_frames = int(os.environ.get("BENCH_INPUT_FRAMES", "2048"))
    min_seconds = float(os.environ.get("BENCH_E2E_SECONDS", "25"))

    cfg = MAE_VIT_B16
    encoder = dataclasses.replace(
        cfg.encoder,
        use_pallas_attention=_env("BENCH_PALLAS") == "1",
        unroll_blocks=_env("BENCH_UNROLL") == "1",
        attention_softmax_f32=_env("BENCH_F32_SOFTMAX") == "1",
        mlp_fusion=_env("BENCH_MLP"),
    )
    cfg = dataclasses.replace(
        cfg, encoder=encoder,
        decoder_depth=int(os.environ.get("BENCH_DECODER_DEPTH", cfg.decoder_depth)),
        decoder_pad_to=(int(_env("BENCH_DECODER_PAD")) or None),
    )

    mesh = build_mesh()
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    params = init_mae(jax.random.PRNGKey(0), cfg)
    opt_state = optim.adamw_init(params)
    wd_scale = optim.no_weight_decay_scales(params)
    lr_scale = optim.pretrain_lr_scales(params)

    def step(p, p_c, s, images_u8, key):
        def loss_fn(p_c):
            images = normalize_batch(images_u8, dtype=cfg.encoder.compute_dtype)
            loss, _, _ = mae_forward(p_c, images, key, cfg)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p_c)
        p, s = optim.adamw_update(
            p, grads, s, lr=1e-3, b1=0.9, b2=0.95, weight_decay=0.05,
            lr_scale=lr_scale, wd_scale=wd_scale,
        )
        return p, cast_params_for_compute(p, cfg.encoder.compute_dtype), s, loss

    jit_step = jax.jit(
        step,
        in_shardings=(replicated, replicated, replicated, sharded, replicated),
        out_shardings=(replicated,) * 3 + (replicated,),
        donate_argnums=(0, 1, 2),
    )

    params = jax.device_put(params, replicated)
    params_c = jax.device_put(
        jax.jit(lambda p: cast_params_for_compute(p, cfg.encoder.compute_dtype))(params),
        replicated,
    )
    opt_state = jax.device_put(opt_state, replicated)
    key = jax.random.PRNGKey(1)

    corpus = _ensure_corpus(
        n_frames,
        int(os.environ.get("BENCH_INPUT_SRC_H", "1080")),
        int(os.environ.get("BENCH_INPUT_SRC_W", "1240")),
    )
    index = ImageFolderIndex(corpus, no_train_dir=True)
    loader = PretrainLoader(
        index, batch, image_size=224, num_workers=workers, prefetch_batches=4,
    )

    # warm up the executable on one staged batch
    rng = np.random.default_rng(0)
    staged = jax.device_put(
        rng.integers(0, 255, (batch, 224, 224, 3), dtype=np.uint8), sharded
    )
    for i in range(3):
        params, params_c, opt_state, loss = jit_step(
            params, params_c, opt_state, staged, jax.random.fold_in(key, i))
    float(loss)

    # device-only ceiling, measured in-run on the staged batch
    t0 = time.perf_counter()
    ceiling_iters = 8
    for i in range(ceiling_iters):
        params, params_c, opt_state, loss = jit_step(
            params, params_c, opt_state, staged, jax.random.fold_in(key, 10 + i))
    float(loss)
    device_only = batch * ceiling_iters / (time.perf_counter() - t0) / n_devices

    # sustained combined pipeline: loader prefetch threads decode while the
    # chip steps; fetch-wait is the time THIS loop blocks on the host.
    n_images = 0
    fetch_wait = 0.0
    wall0 = time.perf_counter()
    step_index = 100
    epoch = 0
    while True:
        loader.set_epoch(epoch)
        for host_batch in loader:
            device_batch = jax.device_put(host_batch, sharded)
            params, params_c, opt_state, loss = jit_step(
                params, params_c, opt_state, device_batch,
                jax.random.fold_in(key, step_index),
            )
            step_index += 1
            n_images += host_batch.shape[0]
        epoch += 1
        if time.perf_counter() - wall0 >= min_seconds:
            break
    float(loss)  # drain the dispatch queue before stopping the clock
    wall = time.perf_counter() - wall0
    e2e_rate = n_images / wall / n_devices

    # fetch-wait fraction: re-run one epoch timing next() explicitly
    iterator = iter(loader)
    wait0 = time.perf_counter()
    waited = 0.0
    images2 = 0
    while True:
        t = time.perf_counter()
        try:
            host_batch = next(iterator)
        except StopIteration:
            break
        waited += time.perf_counter() - t
        device_batch = jax.device_put(host_batch, sharded)
        params, params_c, opt_state, loss = jit_step(
            params, params_c, opt_state, device_batch,
            jax.random.fold_in(key, step_index),
        )
        step_index += 1
        images2 += host_batch.shape[0]
    float(loss)
    wall2 = time.perf_counter() - wait0
    stall_fraction = waited / wall2 if wall2 > 0 else 0.0

    try:
        visible_cores = len(os.sched_getaffinity(0))
    except AttributeError:
        visible_cores = os.cpu_count() or 1
    host_cores = int(os.environ.get("BENCH_INPUT_HOST_CORES",
                                    str(os.cpu_count() or visible_cores)))
    host_rate = n_images / wall  # global host production rate during overlap
    projected = host_rate / max(visible_cores, 1) * host_cores
    print(json.dumps({
        "metric": "mae_e2e_pipeline_throughput",
        "value": round(e2e_rate, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(e2e_rate / BASELINE_IMAGES_PER_SEC, 3),
        "detail": {
            "device_only_img_s": round(device_only, 1),
            "host_img_s": round(host_rate, 1),
            "host_fetch_wait_fraction": round(stall_fraction, 3),
            "visible_cores": visible_cores,
            "host_cores": host_cores,
            "projected_full_host_img_s": round(projected, 1),
            "workers": workers,
            "batch_per_chip": batch // n_devices,
        },
    }))


def bench_input() -> None:
    """Host input-pipeline throughput: can the host FEED the chip?

    The TPU step consumes 1700+ img/s/chip of 224×224 uint8 batches; this
    workload proves (or sizes) the host headroom against that rate — the
    reference counterpart is the torch DataLoader worker pool
    (``packs.py:319-394``).  Entirely host-side (no TPU needed):

    * generates a synthetic JPEG corpus at SUN-like source resolution;
    * measures ``PretrainLoader`` (PIL decode + random-resized-crop + flip,
      the MAE pretrain path) end-to-end at several worker counts;
    * A/Bs the eval-path frame decode (PIL vs the native C++ libjpeg pool,
      ``native/jpeg_loader.cpp``).

    The JSON line's value is the best PretrainLoader rate as measured on the
    cores visible to this process.  ``vs_baseline`` compares the FULL-HOST
    projection (per-visible-core rate × BENCH_INPUT_HOST_CORES, default the
    machine's cpu_count) against BENCH_INPUT_BASELINE (default 1761 = the
    round-3 device consumption rate), so >= 1.0 means a production host
    keeps the chip fed even when this terminal exposes only a core subset
    (detail carries both the measured and projected rates).
    """
    import tempfile

    import numpy as np
    from PIL import Image

    from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader
    from ssl4polyp_tpu.data.transforms import decode_frame
    from ssl4polyp_tpu.native import decode_resize_batch, native_available

    n_frames = int(os.environ.get("BENCH_INPUT_FRAMES", "2048"))
    src_h = int(os.environ.get("BENCH_INPUT_SRC_H", "1080"))
    src_w = int(os.environ.get("BENCH_INPUT_SRC_W", "1240"))  # SUN native res
    batch = int(os.environ.get("BENCH_INPUT_BATCH", "256"))
    worker_grid = [
        int(w) for w in os.environ.get("BENCH_INPUT_WORKERS", "8,16,32,48").split(",")
    ]
    baseline = float(os.environ.get("BENCH_INPUT_BASELINE", "1761"))

    corpus = _ensure_corpus(n_frames, src_h, src_w)
    index = ImageFolderIndex(corpus, no_train_dir=True)
    results = {}
    best = 0.0
    # Only claim a "native" measurement when the C++ decoder actually runs
    # (the loader silently falls back to PIL otherwise).
    native_variants = (False, True) if native_available() else (False,)
    if not native_available():
        results["native"] = "unavailable"
    for use_native in native_variants:
        for workers in worker_grid:
            loader = PretrainLoader(
                index, batch, image_size=224, num_workers=workers,
                prefetch_batches=4, use_native=use_native,
            )
            n_images = 0
            t0 = time.perf_counter()
            for images in loader:
                n_images += images.shape[0]
            rate = n_images / (time.perf_counter() - t0)
            tag = "native" if use_native else "pil"
            results[f"pretrain_{tag}_w{workers}"] = round(rate, 1)
            best = max(best, rate)

    # Eval-path decode A/B on the first `batch` frames.
    paths = index.paths[:batch]
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(lambda p: decode_frame(p, 224), paths))
    results["eval_decode_pil_w16"] = round(batch / (time.perf_counter() - t0), 1)
    if native_available():
        t0 = time.perf_counter()
        decode_resize_batch(paths, 224, 224, n_threads=16)
        results["eval_decode_native_w16"] = round(
            batch / (time.perf_counter() - t0), 1
        )

    # A restricted terminal may expose only a few cores; project the
    # per-visible-core rate onto a full production host so vs_baseline keeps
    # its ">= 1.0 means the host feeds the chip" meaning everywhere.
    try:
        visible_cores = len(os.sched_getaffinity(0))
    except AttributeError:
        visible_cores = os.cpu_count() or 1
    host_cores = int(os.environ.get("BENCH_INPUT_HOST_CORES",
                                    str(os.cpu_count() or visible_cores)))
    projected = best / max(visible_cores, 1) * host_cores
    results["visible_cores"] = visible_cores
    results["host_cores"] = host_cores
    results["projected_full_host"] = round(projected, 1)
    print(json.dumps({
        "metric": "host_input_pipeline_throughput",
        "value": round(best, 1),
        "unit": "images/sec",
        "vs_baseline": round(projected / baseline, 3),
        "detail": results,
    }))


if __name__ == "__main__":
    workload = os.environ.get("BENCH_WORKLOAD", "pretrain")
    if workload == "finetune":
        bench_finetune()
    elif workload == "eval":
        bench_eval()
    elif workload == "input":
        bench_input()
    elif workload == "e2e":
        bench_e2e()
    else:
        main()
