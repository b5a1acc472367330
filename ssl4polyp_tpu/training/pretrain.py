"""MAE pretraining engine: pjit data-parallel, scan-accumulated, resumable.

Capability parity with the reference driver + engine
(``src/ssl4polyp/models/mae/main_pretrain.py`` / ``engine_pretrain.py``):

* per-iteration warmup + half-cycle cosine LR with linear batch scaling
  (lr = blr · eff_batch / 256);
* AdamW(0.9, 0.95) with no weight decay on bias/norm/tokens;
* gradient accumulation — a ``lax.scan`` over microbatches inside ONE
  compiled step (the reference steps the optimizer every ``accum_iter``
  python iterations);
* bf16 compute (replacing CUDA AMP), fp32 master params and optimizer;
* epoch checkpoints with retention (keep-last-K + every-N milestones),
  ``last`` pointer, SIGTERM/SIGINT save-and-exit, auto-resume;
* non-finite-loss abort and JSON epoch log lines.

Distribution: params replicated, batch sharded along the mesh "data" axis;
XLA inserts the gradient all-reduce over ICI (no DDP, no NCCL, no
rendezvous).
"""

from __future__ import annotations

import dataclasses
import json
import math
import signal
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ssl4polyp_tpu.data.augment import normalize_batch
from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader
from ssl4polyp_tpu.models.layers import cast_params_for_compute
from ssl4polyp_tpu.models.mae import MAEConfig, MAE_VIT_B16, init_mae, mae_forward
from ssl4polyp_tpu.parallel.mesh import build_mesh
from ssl4polyp_tpu.training import optim
from ssl4polyp_tpu.training.schedules import warmup_cosine
from ssl4polyp_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    cleanup_checkpoints,
    load_checkpoint,
    save_checkpoint,
    update_pointer,
)
from ssl4polyp_tpu.utils.logging import RunLogger, Throughput

__all__ = ["PretrainSettings", "run_pretraining", "make_pretrain_step", "cli_main"]


@dataclass
class PretrainSettings:
    data_root: str = ""
    output_dir: str = "outputs/mae_pretrain"
    model: str = "mae_vit_base_patch16"
    epochs: int = 400
    warmup_epochs: int = 40
    batch_size: int = 64  # per accumulation microbatch, global across mesh
    accum_iter: int = 1
    blr: float = 1e-3
    min_lr: float = 0.0
    weight_decay: float = 0.05
    mask_ratio: float = 0.75
    norm_pix_loss: bool = False
    seed: int = 0
    image_size: int = 224
    num_workers: int = 16
    log_interval: int = 20
    save_freq_epochs: int = 20
    save_freq_mins: Optional[float] = None  # time-based mid-epoch saves
    keep_last: int = 2
    keep_every_n_epochs: Optional[int] = 100
    no_train_dir: bool = False
    precision: str = "bf16"  # bf16 | fp32
    use_pallas_attention: Optional[bool] = None  # None → on for TPU backends
    steps_per_call: int = 1  # optimizer steps fused per device dispatch
    limit_steps_per_epoch: Optional[int] = None  # smoke runs
    resume: Optional[str] = None  # "auto" | path | None
    # Overlap checkpoint serialization/writes with the next epoch's compute
    # (utils/checkpoint.py::AsyncCheckpointer; the device→host snapshot stays
    # synchronous for donation safety).  The reference saves synchronously
    # (util/misc.py:306-335); off restores that behaviour.
    async_checkpoint: bool = True

    @property
    def effective_batch(self) -> int:
        return self.batch_size * self.accum_iter

    @property
    def absolute_lr(self) -> float:
        # blr scaled by effective batch / 256 (reference main_pretrain.py:203-204)
        return self.blr * self.effective_batch / 256.0


def model_config(settings: PretrainSettings) -> MAEConfig:
    presets = {
        "mae_vit_base_patch16": MAE_VIT_B16,
    }
    if settings.model not in presets:
        raise ValueError(f"Unknown model preset {settings.model!r}")
    base = presets[settings.model]
    compute = jnp.bfloat16 if settings.precision == "bf16" else jnp.float32
    use_pallas = settings.use_pallas_attention
    if use_pallas is None:
        # The batched-rows fused QKV kernel beats the XLA einsum path by
        # ~11% on v5e (PERF_NOTES.md); interpret-mode Pallas on CPU is slow,
        # so tests keep the XLA path.
        use_pallas = jax.default_backend() != "cpu"
    encoder = dataclasses.replace(
        base.encoder,
        img_size=settings.image_size,
        compute_dtype=compute,
        use_pallas_attention=use_pallas,
        # Unrolled blocks beat lax.scan by ~25% at runtime on TPU (XLA can
        # schedule across block boundaries); scan keeps CPU test compiles fast.
        unroll_blocks=jax.default_backend() != "cpu",
        # Masked-MSE pretraining tolerates compute-dtype softmax; +15% step
        # throughput from halving (N, N) score traffic.  Fine-tuning keeps
        # the fp32 softmax default for accuracy parity.
        attention_softmax_f32=(compute == jnp.float32),
    )
    # Pad the decoder sequence to the next sublane multiple (197 → 200 for
    # ViT-B/16) on accelerators: with N % 8 == 0 the flattened residual
    # stream's 3-D kernel views are true bitcasts (layers.run_blocks auto
    # policy), which removes the batch-major relayout copies around the
    # attention custom calls.  Exactness is tested end to end
    # (tests/test_qkv_attention.py::test_mae_decoder_pad_exact).
    n_tokens = base.encoder.num_patches + 1
    pad_to = -(-n_tokens // 8) * 8 if use_pallas and n_tokens % 8 else None
    return dataclasses.replace(
        base,
        encoder=encoder,
        mask_ratio=settings.mask_ratio,
        norm_pix_loss=settings.norm_pix_loss,
        decoder_pad_to=pad_to,
    )


def make_pretrain_step(
    cfg: MAEConfig, mesh, accum_iter: int, weight_decay: float, steps_per_call: int = 1
):
    """Build the jitted train step.

    Signature: ``(params, params_c, opt_state, images_u8, key, it0, lr,
    lr_scale, wd_scale) → (params, params_c, opt_state, metrics)``.
    ``images_u8`` is (accum, B, H, W, 3) uint8 sharded along "data" on the
    batch axis — or (steps, accum, B, H, W, 3) when ``steps_per_call > 1``,
    in which case that many full optimizer steps run inside ONE dispatch
    (identical math; amortises per-dispatch latency).

    ``params_c`` is the compute-dtype copy of ``params`` (see
    :func:`init_compute_params`): the forward consumes it directly and the
    post-update recast fuses into the AdamW write, so the fp32 master tree
    is never re-read per microbatch.  Gradients w.r.t. the copy are
    numerically identical to gradients w.r.t. fp32 params taken through the
    in-forward cast (the transpose of a convert is a convert); AdamW
    upcasts them to fp32 itself.
    """

    def loss_fn(params_c, images_u8, key):
        images = normalize_batch(images_u8, dtype=cfg.encoder.compute_dtype)
        loss, _, _ = mae_forward(params_c, images, key, cfg)
        return loss

    def one_step(params, params_c, opt_state, images_u8, step_key, lr, lr_scale, wd_scale):
        def microbatch(carry, xs):
            grads_acc, loss_acc = carry
            micro_images, micro_key = xs
            loss, grads = jax.value_and_grad(loss_fn)(params_c, micro_images, micro_key)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
        )
        keys = jax.random.split(step_key, accum_iter)
        (grads, loss_sum), _ = jax.lax.scan(
            microbatch, (zero_grads, jnp.zeros((), jnp.float32)), (images_u8, keys)
        )
        scale = 1.0 / accum_iter
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        loss = loss_sum * scale
        grad_norm = optim.global_norm(grads)
        params, opt_state = optim.adamw_update(
            params,
            grads,
            opt_state,
            lr=lr,
            b1=0.9,
            b2=0.95,
            weight_decay=weight_decay,
            lr_scale=lr_scale,
            wd_scale=wd_scale,
        )
        params_c = cast_params_for_compute(params, cfg.encoder.compute_dtype)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return params, params_c, opt_state, metrics

    def step_fn(params, params_c, opt_state, images_u8, epoch_key, it0, lr,
                lr_scale, wd_scale):
        # Per-step keys are fold_in(epoch_key, global_iteration) regardless
        # of dispatch fusion, and the fused path takes a (K,) lr VECTOR so
        # each step samples the per-iteration cosine at its own global step
        # — steps_per_call=K matches K sequential dispatches (tested).
        if steps_per_call == 1:
            return one_step(
                params, params_c, opt_state, images_u8,
                jax.random.fold_in(epoch_key, it0), lr, lr_scale, wd_scale,
            )

        def body(carry, xs):
            p, p_c, s = carry
            chunk_images, offset, step_lr = xs
            step_key = jax.random.fold_in(epoch_key, it0 + offset)
            p, p_c, s, metrics = one_step(
                p, p_c, s, chunk_images, step_key, step_lr, lr_scale, wd_scale)
            return (p, p_c, s), metrics

        offsets = jnp.arange(steps_per_call)
        (params, params_c, opt_state), metrics = jax.lax.scan(
            body, (params, params_c, opt_state), (images_u8, offsets, lr)
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        last["loss"] = jnp.mean(metrics["loss"])
        return params, params_c, opt_state, last

    replicated = NamedSharding(mesh, P())
    batch_axis = 2 if steps_per_call > 1 else 1
    spec = P(*([None] * batch_axis), "data")
    data_sharded = NamedSharding(mesh, spec)
    return jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, replicated, data_sharded,
                      replicated, replicated, replicated, replicated, replicated),
        out_shardings=(replicated, replicated, replicated, replicated),
        donate_argnums=(0, 1, 2),
    )


def init_compute_params(params, cfg: MAEConfig, mesh):
    """Build the replicated compute-dtype parameter copy for the train step."""
    replicated = NamedSharding(mesh, P())
    cast = jax.jit(
        lambda p: cast_params_for_compute(p, cfg.encoder.compute_dtype),
        out_shardings=replicated,
    )
    return cast(jax.device_put(params, replicated))


def run_pretraining(settings: PretrainSettings, mesh=None) -> Dict[str, Any]:
    """Full pretraining loop; returns the final summary dict."""
    mesh = mesh or build_mesh()
    cfg = model_config(settings)
    output_dir = Path(settings.output_dir)
    ckpt_dir = output_dir / "ckpts"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    logger = RunLogger(output_dir, "pretrain")

    index = ImageFolderIndex(settings.data_root, no_train_dir=settings.no_train_dir)
    loader = PretrainLoader(
        index,
        batch_size=settings.effective_batch,
        image_size=settings.image_size,
        seed=settings.seed,
        num_workers=settings.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    steps_per_epoch = len(loader)
    if settings.limit_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, settings.limit_steps_per_epoch)
    total_steps = steps_per_epoch * settings.epochs
    schedule = warmup_cosine(
        settings.absolute_lr,
        total_steps,
        settings.warmup_epochs * steps_per_epoch,
        settings.min_lr,
    )

    root_key = jax.random.PRNGKey(settings.seed)
    params = init_mae(jax.random.fold_in(root_key, 0), cfg)
    opt_state = optim.adamw_init(params)
    start_epoch = 0

    # ---- resume --------------------------------------------------------
    resume_path: Optional[Path] = None
    if settings.resume == "auto":
        # Prefer the last.ckpt pointer; fall back to the NUMERICALLY
        # greatest epoch (lexicographic sort would resume checkpoint-99
        # over checkpoint-119 and silently discard epochs).
        pointer = ckpt_dir / "last.ckpt"
        if pointer.exists():
            resume_path = pointer
        else:
            candidates = sorted(
                ckpt_dir.glob("checkpoint-*.ckpt"),
                key=lambda p: int(p.stem.split("-")[-1]),
            )
            if candidates:
                resume_path = candidates[-1]
    elif settings.resume:
        resume_path = Path(settings.resume)
    if resume_path is not None and resume_path.exists():
        restored = load_checkpoint(resume_path)
        params = jax.tree_util.tree_map(jnp.asarray, restored["payload"]["params"])
        opt = restored["payload"]["opt"]
        opt_state = optim.AdamWState(
            step=jnp.asarray(opt["step"]),
            mu=jax.tree_util.tree_map(jnp.asarray, opt["mu"]),
            nu=jax.tree_util.tree_map(jnp.asarray, opt["nu"]),
        )
        start_epoch = int(restored["meta"].get("epoch", -1)) + 1
        logger.text(f"Resumed from {resume_path} at epoch {start_epoch}")

    # pos_embed leaves are FROZEN sincos buffers in the reference
    # (models_mae.py:37,51 requires_grad=False) — lr 0, never updated.
    lr_scale = optim.pretrain_lr_scales(params)
    wd_scale = optim.no_weight_decay_scales(params)
    params_c = init_compute_params(params, cfg, mesh)
    steps_per_call = max(1, int(settings.steps_per_call))
    train_step = make_pretrain_step(
        cfg, mesh, settings.accum_iter, settings.weight_decay, steps_per_call
    )
    # Tail batches that don't fill a fused dispatch run through a
    # single-step executable (padding them would apply extra updates).
    train_step_single = (
        train_step if steps_per_call == 1
        else make_pretrain_step(cfg, mesh, settings.accum_iter, settings.weight_decay, 1)
    )

    # ---- signal handling: save and exit --------------------------------
    interrupted = {"flag": False}

    def _handler(signum, frame):
        interrupted["flag"] = True

    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _handler)
        except ValueError:
            pass  # not in main thread

    checkpointer = AsyncCheckpointer() if settings.async_checkpoint else None

    def save_epoch(epoch: int) -> Path:
        payload = {
            "params": params,
            "opt": {"step": opt_state.step, "mu": opt_state.mu, "nu": opt_state.nu},
        }
        meta = {
            "epoch": epoch,
            "settings": dataclasses.asdict(settings),
            "model": settings.model,
        }
        path = ckpt_dir / f"checkpoint-{epoch}.ckpt"

        def _cleanup():
            cleanup_checkpoints(
                ckpt_dir,
                keep_last=settings.keep_last,
                keep_every_n_epochs=settings.keep_every_n_epochs,
            )

        if checkpointer is not None:
            # Host snapshot now (donation-safe), serialize+write+pointer+
            # retention on the writer thread, overlapped with the next
            # epoch's compute.
            checkpointer.save(
                path, payload, meta,
                pointer=ckpt_dir / "last.ckpt", cleanup=_cleanup,
            )
            return path
        save_checkpoint(path, payload, meta)
        update_pointer(ckpt_dir / "last.ckpt", path)
        _cleanup()
        return path

    if steps_per_call > 1:
        data_sharding = NamedSharding(mesh, P(None, None, "data"))
    else:
        data_sharding = NamedSharding(mesh, P(None, "data"))
    throughput = Throughput()
    summary: Dict[str, Any] = {}
    step_global = start_epoch * steps_per_epoch
    accum = settings.accum_iter
    micro = settings.effective_batch // accum

    def shape_batch(raw: "np.ndarray") -> "np.ndarray":
        return raw.reshape(accum, micro, *raw.shape[1:])

    try:
        for epoch in range(start_epoch, settings.epochs):
            loader.set_epoch(epoch)
            epoch_loss = 0.0
            epoch_log_points = 0
            epoch_steps = 0
            steps_since_log = 0
            t0 = time.perf_counter()
            last_save_time = time.perf_counter()
            pending: list = []
            iterator = iter(loader)
            it = 0
            while True:
                # Collect steps_per_call batches for one fused dispatch.
                pending.clear()
                while len(pending) < steps_per_call and it + len(pending) < steps_per_epoch:
                    try:
                        pending.append(shape_batch(next(iterator)))
                    except StopIteration:
                        break
                if not pending:
                    break
                chunk = len(pending)
                # Per-step schedule values: the per-iteration cosine is
                # sampled at each step's own global index even inside a
                # fused dispatch (matches K sequential dispatches).
                lrs = [schedule(step_global + j) for j in range(chunk)]
                epoch_key = jax.random.fold_in(root_key, epoch)
                if steps_per_call > 1 and chunk == steps_per_call:
                    device_batch = jax.device_put(np.stack(pending), data_sharding)
                    params, params_c, opt_state, metrics = train_step(
                        params, params_c, opt_state, device_batch,
                        epoch_key, jnp.int32(it),
                        jnp.asarray(lrs, jnp.float32), lr_scale, wd_scale,
                    )
                else:
                    # tail: dispatch remaining batches one step at a time
                    single_sharding = NamedSharding(mesh, P(None, "data"))
                    for j, single in enumerate(pending):
                        device_batch = jax.device_put(single, single_sharding)
                        params, params_c, opt_state, metrics = train_step_single(
                            params, params_c, opt_state, device_batch,
                            epoch_key, jnp.int32(it + j), jnp.float32(lrs[j]),
                            lr_scale, wd_scale,
                        )
                lr = lrs[-1]
                step_global += chunk if steps_per_call > 1 else 1
                epoch_steps += chunk if steps_per_call > 1 else 1
                steps_since_log += chunk
                if (it // max(1, steps_per_call)) % max(
                    1, settings.log_interval // max(1, steps_per_call)
                ) == 0:
                    loss_value = float(metrics["loss"])
                    if not math.isfinite(loss_value):
                        logger.text(f"FATAL: non-finite loss {loss_value} at step {step_global}")
                        save_epoch(epoch)
                        raise FloatingPointError(f"Loss is {loss_value}, stopping")
                    grad_norm_value = float(metrics["grad_norm"])
                    if not math.isfinite(grad_norm_value):
                        logger.text(
                            f"WARNING: non-finite grad norm at step {step_global}"
                        )
                    epoch_loss += loss_value
                    epoch_log_points += 1
                    # Actual steps since the last log — the fused cadence is
                    # chunk-quantized, so the nominal log_interval would
                    # over-report by up to log_interval/steps_per_call.
                    rate = throughput.tick(
                        settings.effective_batch * steps_since_log
                    )
                    steps_since_log = 0
                    logger.scalar("train/loss", loss_value, step_global)
                    logger.scalar("train/lr", lr, step_global)
                    logger.scalar("train/grad_norm", float(metrics["grad_norm"]), step_global)
                    if rate:
                        logger.scalar("train/images_per_sec", rate, step_global)
                if interrupted["flag"]:
                    logger.text("Signal received: checkpointing and exiting")
                    save_epoch(epoch)
                    return {"interrupted": True, "epoch": epoch}
                if (
                    settings.save_freq_mins
                    and time.perf_counter() - last_save_time
                    > settings.save_freq_mins * 60.0
                ):
                    # time-based mid-epoch checkpoint (reference
                    # engine_pretrain.py:90-93)
                    save_epoch(epoch)
                    last_save_time = time.perf_counter()
                it += chunk
                if it >= steps_per_epoch:
                    break

            mean_loss = epoch_loss / max(1, epoch_log_points)
            epoch_record = {
                "epoch": epoch,
                "train_loss": mean_loss,
                "lr": schedule(step_global),
                "epoch_time_s": time.perf_counter() - t0,
            }
            logger.json_line(epoch_record)
            logger.text(f"epoch {epoch}: loss {mean_loss:.4f}")
            if (epoch + 1) % settings.save_freq_epochs == 0 or epoch == settings.epochs - 1:
                save_epoch(epoch)
            summary = epoch_record
    finally:
        if checkpointer is not None:
            # Join the in-flight write on EVERY exit path (normal, signal
            # save-and-exit, non-finite-loss abort) so the process never
            # exits with a half-written .tmp pending.
            checkpointer.wait()
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        logger.close()

    # The final epoch was already checkpointed inside the loop (the
    # `epoch == settings.epochs - 1` branch of the save condition).
    return summary


def cli_main(argv: Optional[list] = None) -> None:
    from ssl4polyp_tpu.parallel.multihost import initialize_multihost
    from ssl4polyp_tpu.utils.cli import parse_into_dataclass

    # Multi-host DCN init (no-op single process) — reference
    # misc.init_distributed_mode, util/misc.py:217-249.
    initialize_multihost()
    settings = parse_into_dataclass(
        PretrainSettings, argv, description="MAE pretraining (TPU)"
    )
    run_pretraining(settings)


if __name__ == "__main__":
    cli_main()
