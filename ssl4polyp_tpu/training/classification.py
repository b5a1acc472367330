"""Classification fine-tuning engine (the reference monolith, re-designed).

One pjit-compiled train step over a ("data", "model") mesh; host-side
orchestration for thresholds, early stopping, checkpoint selection and
artifact export.  Capability map to the reference
(``src/ssl4polyp/classification/train_classification.py``):

* ``build()``        → :func:`build_run` (datasets, model, scales, parent)
* ``train_epoch()``  → the jitted ``train_step`` + :func:`_run_train_epoch`
* ``test()``         → :mod:`ssl4polyp_tpu.evaluation.evaluate`
* experiment rules   → :mod:`ssl4polyp_tpu.training.protocol` (RunPlan)
* run naming         → :mod:`ssl4polyp_tpu.training.layout`
* artifact schemas   → :mod:`ssl4polyp_tpu.evaluation.exports`

Fine-tune regimes and per-group learning rates are lr-scale pytrees on a
single AdamW (no param groups, no requires_grad mutation); multi-stage
schedules (exp5c) swap the scale tree at stage boundaries.
"""

from __future__ import annotations

import dataclasses
import json
import math
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax.sharding import NamedSharding, PartitionSpec as P

from ssl4polyp_tpu.configs.layered import load_layered_config
from ssl4polyp_tpu.data.augment import augment_batch, normalize_batch
from ssl4polyp_tpu.data.loader import HostDataLoader
from ssl4polyp_tpu.data.packs import PackIndex, create_classification_datasets
from ssl4polyp_tpu.evaluation import exports
from ssl4polyp_tpu.evaluation.evaluate import evaluate_split
from ssl4polyp_tpu.metrics import thresholds as th
from ssl4polyp_tpu.metrics.threshold_store import canonical_threshold_path
from ssl4polyp_tpu.models.factory import Classifier, build_classifier
from ssl4polyp_tpu.parallel.mesh import build_mesh
from ssl4polyp_tpu.parallel.multihost import initialize_multihost, is_primary
from ssl4polyp_tpu.training import optim
from ssl4polyp_tpu.training.layout import RunLayout, format_selection_tag, resolve_run_layout
from ssl4polyp_tpu.training.protocol import FinetuneStage, RunPlan
from ssl4polyp_tpu.training.schedules import EarlyStopper, PlateauScheduler, warmup_cosine
from ssl4polyp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, update_pointer
from ssl4polyp_tpu.utils.logging import RunLogger, Throughput

__all__ = ["TrainContext", "build_run", "run_classification_training", "cli_main"]


# ---------------------------------------------------------------------------
# Parent run references (frozen-τ / canonical SUN init)
# ---------------------------------------------------------------------------

@dataclass
class ParentRunReference:
    checkpoint_path: Path
    checkpoint_sha256: Optional[str] = None
    metrics_path: Optional[Path] = None
    metrics_sha256: Optional[str] = None
    metrics_payload: Dict[str, Any] = field(default_factory=dict)

    def provenance_block(self, base_dir: Optional[Path]) -> Dict[str, Any]:
        def rel(path: Optional[Path]) -> Optional[str]:
            if path is None:
                return None
            try:
                return str(Path(path).resolve().relative_to(Path(base_dir).resolve()))
            except Exception:
                return str(path)

        block: Dict[str, Any] = {"checkpoint": rel(self.checkpoint_path)}
        if self.checkpoint_sha256:
            block["checkpoint_sha256"] = self.checkpoint_sha256
        if self.metrics_path:
            block["metrics"] = {
                "path": rel(self.metrics_path),
                **({"sha256": self.metrics_sha256} if self.metrics_sha256 else {}),
            }
        return block


def load_parent_reference(checkpoint_path: str | Path) -> ParentRunReference:
    """Load a parent checkpoint + its sibling metrics payload."""
    path = Path(checkpoint_path)
    if not path.exists():
        raise FileNotFoundError(f"Parent checkpoint not found: {path}")
    sha = exports.sha256_file(path)
    stem = path.with_suffix("")
    metrics_candidates = [
        Path(str(stem) + ".metrics.json"),
        Path(str(stem) + "_last.metrics.json"),
    ]
    metrics_path = next((c for c in metrics_candidates if c.exists()), None)
    payload: Dict[str, Any] = {}
    metrics_sha = None
    if metrics_path is not None:
        payload = json.loads(metrics_path.read_text(encoding="utf-8"))
        metrics_sha = exports.sha256_file(metrics_path)
    else:
        # thresholds may live in the checkpoint meta
        try:
            meta = load_checkpoint(path).get("meta", {})
            if isinstance(meta.get("thresholds"), Mapping):
                payload = {"thresholds": meta["thresholds"]}
        except Exception:
            payload = {}
    return ParentRunReference(
        checkpoint_path=path,
        checkpoint_sha256=sha,
        metrics_path=metrics_path,
        metrics_sha256=metrics_sha,
        metrics_payload=payload,
    )


# ---------------------------------------------------------------------------
# Build
# ---------------------------------------------------------------------------

@dataclass
class TrainContext:
    plan: RunPlan
    layout: RunLayout
    mesh: Any
    classifier: Classifier
    params: Any
    datasets: Dict[str, PackIndex]
    dataset_summary: Dict[str, Dict[str, Any]]
    class_counts: List[int]
    class_weights: List[float]
    pos_weight: float
    loss_mode: str
    parent_reference: Optional[ParentRunReference]
    logger: RunLogger
    num_classes: int = 2
    eval_only: bool = False
    exp_config_name: Optional[str] = None


def _dataset_summary(datasets: Mapping[str, PackIndex]) -> Dict[str, Dict[str, Any]]:
    summary: Dict[str, Dict[str, Any]] = {}
    for alias, index in datasets.items():
        entry = dict(index.provenance)
        entry["n_frames"] = len(index)
        summary[alias] = entry
    return summary


def build_run(
    plan: RunPlan,
    *,
    output_dir: str | Path,
    mesh=None,
    pack_root: Optional[Path] = None,
    roots_map: Optional[Mapping[str, str]] = None,
    checkpoint_root: Optional[Path] = None,
    exp_config_name: Optional[str] = None,
    num_classes: int = 2,
    check_exists: bool = True,
    model_overrides: Optional[Mapping[str, Any]] = None,
) -> TrainContext:
    mesh = mesh or build_mesh()
    layout = resolve_run_layout(
        output_dir=output_dir,
        model_tag=plan.model_tag,
        dataset_cfg=plan.dataset_cfg,
        dataset_resolved=plan.dataset_resolved,
        seed=plan.seed,
        parent_checkpoint=plan.parent_checkpoint,
        init_from=plan.init_from,
    )
    layout.output_dir.mkdir(parents=True, exist_ok=True)
    logger = RunLogger(layout.output_dir, layout.stem)

    resolved = plan.dataset_resolved
    datasets = create_classification_datasets(
        train_spec=resolved.get("train_pack"),
        val_spec=resolved.get("val_pack"),
        test_spec=resolved.get("test_pack"),
        train_split=resolved.get("train_split") or "train",
        val_split=resolved.get("val_split") or "val",
        test_split=resolved.get("test_split") or "test",
        pack_root=pack_root,
        roots_map=roots_map,
        image_size=plan.image_size,
        perturbation_splits=plan.perturbation_splits,
        snapshot_dir=layout.output_dir / "snapshot",
        check_exists=check_exists,
    )

    # class statistics from the train split (reference :5613-5630)
    train_index = datasets.get("train")
    if train_index is not None and train_index.labels is not None:
        counts = train_index.class_counts(num_classes).tolist()
        total = sum(counts)
        class_weights = [
            (total / (num_classes * c)) if c > 0 else 0.0 for c in counts
        ]
    else:
        counts = [0] * num_classes
        class_weights = [1.0] * num_classes

    if num_classes == 2:
        loss_mode = "binary_bce"
        neg, pos = float(counts[0]), float(counts[1])
        pos_weight = (neg / pos) if pos > 0 else 1.0
    else:
        loss_mode = "multiclass_ce"
        pos_weight = 1.0

    compute = jnp.bfloat16 if plan.precision == "bf16" else jnp.float32
    overrides: Dict[str, Any] = {
        "compute_dtype": compute,
        "img_size": plan.image_size,
        # Unrolled blocks outperform lax.scan at runtime on accelerators;
        # scan keeps CPU (test) compiles fast.
        "unroll_blocks": jax.default_backend() != "cpu",
        # Fused QKV attention kernel (+11% over the einsum path on v5e);
        # fine-tuning keeps fp32 softmax inside the kernel.
        "use_pallas_attention": jax.default_backend() != "cpu",
    }
    if model_overrides:
        overrides.update(model_overrides)
    classifier = build_classifier(
        jax.random.PRNGKey(plan.seed),
        plan.model_cfg,
        num_classes=num_classes,
        checkpoint_root=checkpoint_root,
        **overrides,
    )
    params = classifier.params

    parent_reference: Optional[ParentRunReference] = None
    if plan.parent_checkpoint:
        parent_reference = load_parent_reference(plan.parent_checkpoint)
        restored = load_checkpoint(parent_reference.checkpoint_path)
        parent_params = restored["payload"].get("params")
        if parent_params is None:
            raise ValueError(
                f"Parent checkpoint {parent_reference.checkpoint_path} lacks params"
            )
        params = jax.tree_util.tree_map(jnp.asarray, parent_params)

    eval_only = datasets.get("train") is None

    return TrainContext(
        plan=plan,
        layout=layout,
        mesh=mesh,
        classifier=classifier,
        params=params,
        datasets=datasets,
        dataset_summary=_dataset_summary(datasets),
        class_counts=counts,
        class_weights=class_weights,
        pos_weight=pos_weight,
        loss_mode=loss_mode,
        parent_reference=parent_reference,
        logger=logger,
        num_classes=num_classes,
        eval_only=eval_only,
        exp_config_name=exp_config_name,
    )


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------

def _loss_from_logits(logits, labels, valid, loss_mode, pos_weight, class_weights):
    logits = logits.astype(jnp.float32)
    valid_f = valid.astype(jnp.float32)
    if loss_mode == "binary_bce":
        z = logits[:, 1] - logits[:, 0] if logits.shape[-1] == 2 else logits[:, 0]
        y = labels.astype(jnp.float32)
        log_sig = -jnp.logaddexp(0.0, -z)
        log_1m = -jnp.logaddexp(0.0, z)
        per = -(pos_weight * y * log_sig + (1.0 - y) * log_1m)
    else:
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
        weights = jnp.asarray(class_weights)[labels]
        per = -picked * weights
        # torch CrossEntropyLoss(weight=...) reduction='mean' normalizes by
        # the SUM OF TARGET WEIGHTS, not the sample count (reference
        # train_classification.py:6104) — match that exactly.
        return jnp.sum(per * valid_f) / jnp.maximum(
            jnp.sum(weights * valid_f), 1e-12
        )
    return jnp.sum(per * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)


def make_train_step(ctx: TrainContext, steps_per_call: int = 1):
    """Build the jitted fine-tune step.

    ``steps_per_call > 1`` fuses that many optimizer steps into ONE device
    dispatch via ``lax.scan`` over stacked batches — the same math as K
    sequential dispatches (each step keeps its own batch, validity mask,
    augmentation key, and schedule lr; floats agree to fp32 round-off, as
    XLA re-fuses the scanned body), amortising the fixed dispatch latency
    exactly like the MAE engine's ``PretrainSettings.steps_per_call``
    (PERF_NOTES round 1: the relay adds ~18 ms/dispatch).
    Fused signature: ``(params, opt_state, images (K,B,H,W,3),
    labels (K,B), valid (K,B), keys (K,2), lrs (K,), lr_scale, wd_scale)``.
    """
    cfg = ctx.classifier.cfg
    loss_mode = ctx.loss_mode
    pos_weight = ctx.pos_weight
    class_weights = tuple(ctx.class_weights)
    weight_decay = ctx.plan.weight_decay
    apply_fn = ctx.classifier.apply

    def step(params, opt_state, images_u8, labels, valid, key, lr, lr_scale, wd_scale):
        def loss_fn(p):
            images = augment_batch(images_u8, key, dtype=cfg.compute_dtype)
            logits = apply_fn(p, images)
            return _loss_from_logits(
                logits, labels, valid, loss_mode, pos_weight, class_weights
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grad_norm = optim.global_norm(grads)
        params, opt_state = optim.adamw_update(
            params, grads, opt_state,
            lr=lr, weight_decay=weight_decay,
            lr_scale=lr_scale, wd_scale=wd_scale,
        )
        return params, opt_state, {"loss": loss, "grad_norm": grad_norm}

    replicated = NamedSharding(ctx.mesh, P())
    if steps_per_call <= 1:
        sharded = NamedSharding(ctx.mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(replicated, replicated, sharded, sharded, sharded,
                          replicated, replicated, replicated, replicated),
            out_shardings=(replicated, replicated, replicated),
            donate_argnums=(0, 1),
        )

    def fused(params, opt_state, images_u8, labels, valid, keys, lrs,
              lr_scale, wd_scale):
        def body(carry, xs):
            p, s = carry
            chunk_images, chunk_labels, chunk_valid, key, lr = xs
            p, s, metrics = step(
                p, s, chunk_images, chunk_labels, chunk_valid, key, lr,
                lr_scale, wd_scale,
            )
            return (p, s), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (images_u8, labels, valid, keys, lrs)
        )
        out = {"loss": metrics["loss"],  # (K,) per-step losses
               "grad_norm": metrics["grad_norm"][-1]}
        return params, opt_state, out

    chunk_sharded = NamedSharding(ctx.mesh, P(None, "data"))
    return jax.jit(
        fused,
        in_shardings=(replicated, replicated, chunk_sharded, chunk_sharded,
                      chunk_sharded, replicated, replicated, replicated,
                      replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1),
    )


def make_forward_fn(classifier: Classifier, mesh: Any):
    """Jitted uint8→logits eval forward over the data mesh.

    A first-class entry point shared by the training engine and the
    standalone eval CLI (``evaluation/eval_classification.py``) — takes the
    classifier and mesh explicitly so callers don't have to fake a
    ``TrainContext``."""
    cfg = classifier.cfg
    apply_fn = classifier.apply
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    @jax.jit
    def forward(params, images_u8):
        images = normalize_batch(images_u8, dtype=cfg.compute_dtype)
        return apply_fn(params, images).astype(jnp.float32)

    n_data = int(mesh.shape["data"])

    def run(params):
        def fn(images_u8):
            host = np.asarray(images_u8)
            # The batch axis must divide the data mesh axis; pad and slice.
            remainder = host.shape[0] % n_data
            pad = (n_data - remainder) % n_data
            if pad:
                host = np.concatenate([host, np.zeros((pad, *host.shape[1:]), host.dtype)])
            device_batch = jax.device_put(host, sharded)
            logits = np.asarray(forward(params, device_batch))
            return logits[: logits.shape[0] - pad] if pad else logits

        return fn

    return run


# ---------------------------------------------------------------------------
# Fine-tune schedule runtime
# ---------------------------------------------------------------------------

@dataclass
class ScheduleRuntime:
    """Applies multi-stage fine-tune schedules at epoch boundaries
    (reference ``FinetuneScheduleRuntime`` — ``train_classification.py:
    860-954``)."""

    stages: Tuple[FinetuneStage, ...]
    base_lr: float
    depth: int
    # MAE-lineage (sincos) classifiers inherit the pretrainer's frozen
    # pos_embed buffers (reference ViT_from_MAE <- models_mae.py:37);
    # timm-lineage learned pos embeds train normally.
    freeze_pos_embed: bool = False

    def stage_at(self, epoch: int) -> Optional[FinetuneStage]:
        if not self.stages:
            return None
        boundary = 0
        for stage in self.stages:
            boundary += stage.epochs
            if epoch < boundary:
                return stage
        return self.stages[-1]

    def lr_and_scales(self, params, epoch: int, default_mode: str):
        stage = self.stage_at(epoch)
        if stage is None:
            scales = optim.finetune_lr_scales(
                params, default_mode, self.depth,
                freeze_pos_embed=self.freeze_pos_embed,
            )
            return self.base_lr, scales, default_mode, None
        head_lr = stage.head_lr if stage.head_lr is not None else self.base_lr
        backbone_scale = 1.0
        if stage.backbone_lr is not None and head_lr > 0:
            backbone_scale = stage.backbone_lr / head_lr
        scales = optim.finetune_lr_scales(
            params, stage.mode, self.depth,
            head_scale=1.0, backbone_scale=backbone_scale,
            freeze_pos_embed=self.freeze_pos_embed,
        )
        return head_lr, scales, stage.mode, stage.name


# ---------------------------------------------------------------------------
# Threshold runtime
# ---------------------------------------------------------------------------

def _resolve_policy_tau(
    ctx: TrainContext,
    policy: Optional[str],
    val_results: Optional[Mapping[str, Any]],
    epoch: int,
    previous_tau: Optional[float],
    val_split_path: Optional[str],
) -> Tuple[Optional[float], Optional[Dict[str, Any]]]:
    if not policy or policy == "none":
        return None, None
    if policy == "sun_val_frozen":
        if ctx.parent_reference is None or not ctx.parent_reference.metrics_payload:
            raise ValueError(
                "Policy 'sun_val_frozen' requires a parent run providing thresholds."
            )
        tau, record = th.resolve_frozen_sun_threshold(
            ctx.parent_reference.metrics_payload.get("thresholds") or {},
            source_key="primary",
            expected_split_substring="sun_full/val",
            checkpoint_path=ctx.parent_reference.checkpoint_path,
            checkpoint_sha256=ctx.parent_reference.checkpoint_sha256,
        )
        return tau, record
    if val_results is None:
        return previous_tau, None
    result = th.compute_policy_threshold(
        val_results["probabilities"],
        val_results["targets"],
        policy=policy,
        split_name=val_split_path or "val",
        epoch=epoch,
        previous_tau=previous_tau,
    )
    return result.tau, dict(result.record)


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------

def run_classification_training(
    ctx: TrainContext,
    thresholds_root: Optional[Path] = None,
    resume: bool = False,
) -> Dict[str, Any]:
    plan = ctx.plan
    layout = ctx.layout
    logger = ctx.logger
    mesh = ctx.mesh
    num_devices = mesh.devices.size

    # Config snapshot (reference writes config.yaml + git commit per run)
    snapshot = {
        "plan": {
            key: (str(value) if isinstance(value, Path) else value)
            for key, value in dataclasses.asdict(plan).items()
            if not key.startswith("_") and key != "dataset_layout"
        },
        "stem": layout.stem,
    }
    if is_primary():
        (layout.output_dir / f"{layout.stem}.config.yaml").write_text(
            yaml.safe_dump(json.loads(json.dumps(snapshot, default=str))), encoding="utf-8"
        )

    val_split_path: Optional[str] = None
    data_block = exports.build_data_block(ctx.dataset_summary)
    if "val" in data_block:
        val_split_path = data_block["val"]["path"]

    selection_tag = format_selection_tag(plan.early_stop_monitor)
    monitor_name = plan.early_stop_monitor or "val_loss"
    monitor_key = monitor_name.split("_", 1)[1] if "_" in monitor_name else monitor_name
    monitor_mode = plan.early_stop_mode or (
        "max" if any(tok in monitor_key for tok in ("auroc", "auprc", "f1", "acc")) else "min"
    )

    forward_factory = make_forward_fn(ctx.classifier, ctx.mesh)
    dataset_name = plan.dataset_layout.name

    thresholds_map: Dict[str, float] = {}
    primary_record: Optional[Dict[str, Any]] = None
    sensitivity_record: Optional[Dict[str, Any]] = None
    primary_tau: Optional[float] = None
    sensitivity_tau: Optional[float] = None
    threshold_key = None
    sensitivity_threshold_key = None

    def eval_split_now(alias: str, params, tau: Optional[float], limit: Optional[int]):
        index = ctx.datasets[alias]
        loader = HostDataLoader(
            index, batch_size=plan.batch_size, shuffle=False,
            num_workers=plan.num_workers, drop_last=False,
            # Disjoint per-process stripes: evaluate_split's multi-host
            # all-gather assumes them (duplicated stripes would double
            # every count-bearing metric/artifact).
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        return evaluate_split(
            forward_factory(params),
            loader,
            index,
            split_name=alias,
            num_classes=ctx.num_classes,
            tau=tau,
            loss_mode=ctx.loss_mode,
            pos_weight=ctx.pos_weight,
            class_weights=ctx.class_weights,
            limit_batches=limit,
            morphology_eval=plan.morphology_eval or None,
            perturbation_eval=index.perturbations_enabled
            or dataset_name == "sun_test_perturbations",
        )

    run_mode = "train"
    if ctx.eval_only:
        run_mode = "eval"
    elif plan.finetune_mode == "none" and not plan.finetune_schedule and plan.is_exp5a:
        run_mode = "inference"

    summary: Dict[str, Any] = {}
    params = ctx.params
    zero_shot_block: Optional[Dict[str, Any]] = None
    zero_shot_outputs: Optional[Path] = None

    # ---------------- zero-shot pre-finetune inference (exp5c :291-426) ----
    if (
        not ctx.eval_only
        and ctx.parent_reference is not None
        and plan.threshold_policy == "sun_val_frozen"
        and dataset_name.startswith("polypgen_fewshot")
        and "test" in ctx.datasets
    ):
        tau0, record0 = _resolve_policy_tau(ctx, "sun_val_frozen", None, -1, None, val_split_path)
        zs = eval_split_now("test", params, tau0, plan.limit_test_batches)
        zero_shot_outputs = layout.output_dir / f"{layout.stem}_zeroshot_outputs.csv"
        zs_export = exports.export_frame_outputs(
            zero_shot_outputs,
            metadata_rows=zs["metadata_rows"],
            probabilities=zs["probabilities"],
            targets=zs["targets"],
            preds=zs["preds"],
            dataset_name=dataset_name,
        )
        zero_shot_block = {
            "tau": tau0,
            "metrics": exports.metric_block_for_export(zs),
            "outputs_csv": zero_shot_outputs.name,
            "outputs_csv_sha256": zs_export.sha256,
        }
        logger.text(
            f"zero-shot: AUROC {zs.get('auroc', float('nan')):.4f} at frozen tau {tau0}"
        )

    best_checkpoint_path: Optional[Path] = None
    best_monitor: Optional[float] = None
    last_epoch = -1
    train_loss_last: Optional[float] = None
    val_results: Optional[Dict[str, Any]] = None
    epochs_run = 0

    if not ctx.eval_only:
        n_data = int(mesh.shape["data"])
        batch_pad = (n_data - plan.batch_size % n_data) % n_data
        if batch_pad:
            # Few-shot protocols prescribe tiny global batches (4/8/16) that
            # may not divide the chip count; pad each batch with valid=False
            # rows — the masked loss makes the gradients exact (the torch
            # reference instead requires batch % world_size == 0).
            logger.text(
                f"padding global batch {plan.batch_size} with {batch_pad} masked "
                f"rows to split over {n_data} devices"
            )
        train_index = ctx.datasets["train"]
        train_loader = HostDataLoader(
            train_index, batch_size=plan.batch_size, seed=plan.seed,
            num_workers=plan.num_workers,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        steps_per_epoch = len(train_loader)
        if plan.limit_train_batches:
            steps_per_epoch = min(steps_per_epoch, plan.limit_train_batches)
        total_steps = max(1, steps_per_epoch * plan.epochs)
        if plan.scheduler == "cosine":
            schedule = warmup_cosine(
                plan.lr, total_steps, plan.warmup_epochs * steps_per_epoch, plan.min_lr
            )
        else:
            schedule = lambda step: plan.lr  # noqa: E731
        plateau = (
            PlateauScheduler(
                factor=plan.scheduler_factor, patience=plan.scheduler_patience,
                mode=monitor_mode, min_lr=plan.min_lr,
            )
            if plan.scheduler == "plateau"
            else None
        )
        stopper = EarlyStopper(
            patience=plan.early_stop_patience,
            min_delta=plan.early_stop_min_delta,
            min_epochs=plan.early_stop_min_epochs,
            mode=monitor_mode,
        )

        depth = ctx.classifier.cfg.depth
        schedule_runtime = ScheduleRuntime(
            plan.finetune_schedule, plan.lr, depth,
            freeze_pos_embed=ctx.classifier.cfg.pos_embed == "sincos",
        )
        wd_scale = optim.no_weight_decay_scales(params)
        # 0 = "auto" (protocol._resolve_steps_per_call): fuse 4 steps per
        # dispatch on accelerators (round-4 v5e A/B: 1175.1 vs 1155.9
        # img/s, +1.7%; 8 adds nothing), stay at 1 on CPU where the fused
        # program's compile time dominates tiny runs.
        steps_per_call = int(plan.steps_per_call)
        if steps_per_call == 0:
            steps_per_call = 4 if jax.default_backend() != "cpu" else 1
        steps_per_call = max(1, steps_per_call)
        train_step = make_train_step(ctx, steps_per_call)
        # Tail batches that don't fill a fused dispatch run through a
        # single-step executable (filler steps would apply extra updates).
        train_step_single = (
            train_step if steps_per_call == 1 else make_train_step(ctx, 1)
        )
        chunk_sharded = NamedSharding(mesh, P(None, "data"))
        sharded = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        opt_state = jax.device_put(optim.adamw_init(params), replicated)
        root_key = jax.random.PRNGKey(plan.seed)
        throughput = Throughput()
        global_step = 0
        current_mode = plan.finetune_mode
        stage_lr, lr_scale, current_mode, stage_name = schedule_runtime.lr_and_scales(
            params, 0, plan.finetune_mode
        )
        no_improve = 0
        start_epoch = 0

        # ---- resume (reference build() resume path: pointer or newest
        # epoch checkpoint; JAX keys are values, so (seed, epoch, it)
        # reproduce data order and masking exactly) -----------------------
        if resume:
            candidates = sorted(layout.output_dir.glob(f"{layout.stem}_e*_*.ckpt"))
            pointer = layout.checkpoint_path
            resume_path = pointer if (pointer.exists() or pointer.is_symlink()) else (
                candidates[-1] if candidates else None
            )
            if resume_path is not None:
                restored = load_checkpoint(resume_path)
                params = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, restored["payload"]["params"]),
                    replicated,
                )
                opt = restored["payload"].get("opt")
                if opt is not None:
                    opt_state = jax.device_put(
                        optim.AdamWState(
                            step=jnp.asarray(opt["step"]),
                            mu=jax.tree_util.tree_map(jnp.asarray, opt["mu"]),
                            nu=jax.tree_util.tree_map(jnp.asarray, opt["nu"]),
                        ),
                        replicated,
                    )
                meta = restored.get("meta", {})
                start_epoch = int(meta.get("epoch", -1)) + 1
                best_monitor = meta.get("monitor_value")
                thresholds_meta = meta.get("thresholds") or {}
                stored_primary = thresholds_meta.get("primary")
                if isinstance(stored_primary, Mapping) and stored_primary.get("tau") is not None:
                    primary_tau = float(stored_primary["tau"])
                    primary_record = dict(stored_primary)
                stored_sensitivity = thresholds_meta.get("sensitivity")
                if isinstance(stored_sensitivity, Mapping) and stored_sensitivity.get("tau") is not None:
                    sensitivity_tau = float(stored_sensitivity["tau"])
                    sensitivity_record = dict(stored_sensitivity)
                global_step = start_epoch * steps_per_epoch
                best_checkpoint_path = Path(resume_path).resolve()
                # Seed the early stopper / plateau scheduler from the
                # restored best: a fresh stopper (_best=None) would treat
                # the first post-resume epoch as an improvement and reset
                # patience, letting a resumed run train up to `patience`
                # extra epochs vs an uninterrupted one.  Resume continues
                # from the BEST epoch, so bad_epochs legitimately restarts
                # at 0; the best value/epoch must carry over.
                if best_monitor is not None:
                    stopper.load_state_dict({
                        "best": float(best_monitor),
                        "best_epoch": int(meta.get("epoch", -1)),
                        "bad_epochs": 0,
                    })
                    if plateau is not None:
                        plateau.load_state_dict({
                            "scale": float(meta.get("plateau_scale", 1.0)),
                            "best": float(best_monitor),
                            "bad_epochs": 0,
                        })
                logger.text(
                    f"resumed from {Path(resume_path).name} at epoch {start_epoch}"
                )

        for epoch in range(start_epoch, plan.epochs):
            new_lr, new_scale, new_mode, new_stage = schedule_runtime.lr_and_scales(
                params, epoch, plan.finetune_mode
            )
            if new_mode != current_mode or new_stage != stage_name:
                logger.text(
                    f"finetune schedule: entering stage {new_stage!r} (mode {new_mode}) at epoch {epoch}"
                )
            stage_lr, lr_scale, current_mode, stage_name = (
                new_lr, new_scale, new_mode, new_stage,
            )

            train_loader.set_epoch(epoch)
            losses: list = []
            pending_losses: list = []  # device scalars, materialized in chunks

            def drain_losses() -> None:
                # Convert accumulated device losses to floats in one readback
                # burst; every step is averaged into train_loss and checked
                # for finiteness (reference averages all iterations), while
                # the slow relay only pays a sync at log points / epoch end.
                # Entries are device scalars or (K,) per-step loss vectors
                # from fused dispatches.
                flat = (
                    np.concatenate(
                        [np.atleast_1d(np.asarray(v, dtype=np.float64)) for v in pending_losses]
                    )
                    if pending_losses
                    else np.zeros((0,))
                )
                for offset, value in enumerate(flat):
                    if not math.isfinite(value):
                        step_at = global_step - len(flat) + offset + 1
                        raise FloatingPointError(f"non-finite loss at step {step_at}")
                    losses.append(float(value))
                pending_losses.clear()

            epoch_t0 = time.perf_counter()
            def step_lr(step_index: int) -> float:
                if plan.finetune_schedule:
                    return stage_lr
                if plan.scheduler == "cosine":
                    return schedule(step_index)
                if plateau is not None:
                    return plateau.scale(stage_lr)
                return stage_lr

            def shaped(batch):
                images, labels, valid = batch["image"], batch["label"], batch["valid"]
                if batch_pad:
                    images = np.concatenate(
                        [images, np.zeros((batch_pad, *images.shape[1:]), images.dtype)]
                    )
                    labels = np.concatenate([labels, np.zeros(batch_pad, labels.dtype)])
                    valid = np.concatenate([valid, np.zeros(batch_pad, bool)])
                return images, labels, valid

            epoch_key = jax.random.fold_in(root_key, epoch)
            iterator = iter(train_loader)
            it = 0
            steps_since_log = 0
            stop_epoch = False
            while not stop_epoch:
                if plan.max_train_steps is not None and global_step >= plan.max_train_steps:
                    logger.text(
                        f"reached max_train_steps={plan.max_train_steps}; stopping epoch early"
                    )
                    break
                # Collect up to steps_per_call batches for one dispatch
                # (bounded additionally by steps_per_epoch/max_train_steps).
                room = steps_per_epoch - it
                if plan.max_train_steps is not None:
                    room = min(room, plan.max_train_steps - global_step)
                chunk: list = []
                while len(chunk) < min(steps_per_call, room):
                    try:
                        chunk.append(shaped(next(iterator)))
                    except StopIteration:
                        stop_epoch = True
                        break
                if not chunk:
                    break
                k = len(chunk)
                lrs = [step_lr(global_step + j) for j in range(k)]
                keys = [jax.random.fold_in(epoch_key, it + j) for j in range(k)]
                if steps_per_call > 1 and k == steps_per_call:
                    params, opt_state, metrics = train_step(
                        params,
                        opt_state,
                        jax.device_put(np.stack([c[0] for c in chunk]), chunk_sharded),
                        jax.device_put(np.stack([c[1] for c in chunk]), chunk_sharded),
                        jax.device_put(np.stack([c[2] for c in chunk]), chunk_sharded),
                        jnp.stack(keys), jnp.asarray(lrs, jnp.float32),
                        lr_scale, wd_scale,
                    )
                    pending_losses.append(metrics["loss"])
                else:
                    for j, (images, labels, valid) in enumerate(chunk):
                        params, opt_state, metrics = train_step_single(
                            params,
                            opt_state,
                            jax.device_put(images, sharded),
                            jax.device_put(labels, sharded),
                            jax.device_put(valid, sharded),
                            keys[j], jnp.float32(lrs[j]), lr_scale, wd_scale,
                        )
                        pending_losses.append(metrics["loss"])
                global_step += k
                log_due = (it % plan.log_interval) < k if steps_per_call > 1 \
                    else it % plan.log_interval == 0
                it += k
                steps_since_log += k
                if log_due:
                    drain_losses()
                    loss_value = losses[-1]
                    # Count the ACTUAL steps since the last log — with fused
                    # dispatch the log cadence is chunk-quantized, and using
                    # the nominal log_interval would skew the rate by
                    # log_interval/steps_per_call.
                    rate = throughput.tick(plan.batch_size * steps_since_log)
                    steps_since_log = 0
                    logger.scalar("train/loss", loss_value, global_step)
                    logger.scalar("train/lr", lrs[-1], global_step)
                    logger.scalar("train/grad_norm", float(metrics["grad_norm"]), global_step)
                    if rate:
                        logger.scalar("train/images_per_sec", rate, global_step)
                if it >= steps_per_epoch:
                    break

            drain_losses()
            train_loss_last = float(np.mean(losses)) if losses else float("nan")
            epochs_run = epoch + 1
            last_epoch = epoch

            # ---- validation -------------------------------------------------
            val_results = None
            monitor_value = train_loss_last
            if "val" in ctx.datasets:
                val_results = eval_split_now("val", params, primary_tau, plan.limit_val_batches)
                primary_tau, primary_record = _resolve_policy_tau(
                    ctx, plan.threshold_policy, val_results, epoch, primary_tau, val_split_path
                )
                if plan.sensitivity_threshold_policy:
                    sensitivity_tau, sensitivity_record = _resolve_policy_tau(
                        ctx, plan.sensitivity_threshold_policy, val_results, epoch,
                        sensitivity_tau, val_split_path,
                    )
                monitor_value = float(val_results.get(monitor_key, val_results["loss"]))
                logger.scalars(
                    {k: v for k, v in val_results.items()
                     if isinstance(v, (int, float)) and not k.startswith("_")},
                    epoch, prefix="val/",
                )
                logger.text(
                    f"epoch {epoch}: train_loss {train_loss_last:.4f} "
                    f"val_loss {val_results['loss']:.4f} "
                    f"val_auroc {val_results.get('auroc', float('nan')):.4f} "
                    f"tau {primary_tau if primary_tau is not None else 'n/a'}"
                )
            if plateau is not None:
                plateau.step(monitor_value)

            if plan.threshold_policy and plan.threshold_policy != "none" and primary_tau is not None:
                threshold_key = th.format_threshold_key(
                    dataset_name, plan.dataset_resolved.get("val_split") or "val",
                    plan.threshold_policy,
                )
                thresholds_map[threshold_key] = float(primary_tau)
            if plan.sensitivity_threshold_policy and sensitivity_tau is not None:
                sensitivity_threshold_key = th.format_threshold_key(
                    dataset_name, plan.dataset_resolved.get("val_split") or "val",
                    plan.sensitivity_threshold_policy,
                )
                thresholds_map[sensitivity_threshold_key] = float(sensitivity_tau)

            # ---- checkpoint on improvement ---------------------------------
            improved = (
                best_monitor is None
                or (monitor_mode == "min" and monitor_value < best_monitor - plan.early_stop_min_delta)
                or (monitor_mode == "max" and monitor_value > best_monitor + plan.early_stop_min_delta)
            )
            if improved:
                best_monitor = monitor_value
                ckpt_name = f"{layout.stem}_e{epoch:02d}_{selection_tag}.ckpt"
                best_checkpoint_path = layout.output_dir / ckpt_name
                meta = {
                    "epoch": epoch,
                    "monitor_metric": monitor_name,
                    "monitor_value": monitor_value,
                    "seed": plan.seed,
                    "stem": layout.stem,
                    "model_cfg": _model_cfg_meta(ctx),
                    # plateau LR scale at save time — restored on resume so
                    # the reduced LR survives interruption
                    **({"plateau_scale": plateau.state_dict()["scale"]}
                       if plateau is not None else {}),
                    "thresholds": exports.build_thresholds_block(
                        thresholds_map,
                        policy=plan.threshold_policy,
                        primary=primary_record,
                        sensitivity=sensitivity_record,
                    ),
                }
                payload_tree: Dict[str, Any] = {"params": params}
                if plan.checkpoint_optimizer_state:
                    payload_tree["opt"] = {
                        "step": opt_state.step, "mu": opt_state.mu, "nu": opt_state.nu,
                    }
                save_checkpoint(best_checkpoint_path, payload_tree, meta)
                update_pointer(layout.checkpoint_path, best_checkpoint_path)
                no_improve = 0
            else:
                no_improve += 1

            if stopper.update(epoch, monitor_value):
                logger.text(
                    f"early stopping at epoch {epoch} "
                    f"(best {monitor_name}={stopper.best} @ epoch {stopper.best_epoch})"
                )
                break

        # reload best checkpoint for the final test (reference :7380-7414).
        # Restore onto the replicated sharding the eval forward was compiled
        # for — otherwise the host-resident arrays force a full recompile.
        if best_checkpoint_path is not None and best_checkpoint_path.exists():
            restored = load_checkpoint(best_checkpoint_path)
            params = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, restored["payload"]["params"]),
                NamedSharding(mesh, P()),
            )
            meta = restored.get("meta", {})
            # Restore the BEST epoch's τ records alongside its params: the
            # loop variables hold the LAST epoch's τ, derived from a model
            # that is not the one being tested — exactly the τ/checkpoint
            # provenance mismatch the guardrails exist to prevent.
            best_thresholds = meta.get("thresholds") or {}
            stored_primary = best_thresholds.get("primary")
            if isinstance(stored_primary, Mapping) and stored_primary.get("tau") is not None:
                primary_tau = float(stored_primary["tau"])
                primary_record = dict(stored_primary)
                if plan.threshold_policy and plan.threshold_policy not in ("none",):
                    threshold_key = th.format_threshold_key(
                        dataset_name,
                        plan.dataset_resolved.get("val_split") or "val",
                        plan.threshold_policy,
                    )
                    thresholds_map[threshold_key] = primary_tau
            stored_sensitivity = best_thresholds.get("sensitivity")
            if isinstance(stored_sensitivity, Mapping) and stored_sensitivity.get("tau") is not None:
                sensitivity_tau = float(stored_sensitivity["tau"])
                sensitivity_record = dict(stored_sensitivity)
            logger.text(
                f"reloaded best checkpoint {best_checkpoint_path.name} "
                f"({monitor_name}={meta.get('monitor_value')})"
            )
    else:
        # eval-only runs (exp5a/5b): frozen τ from the parent
        primary_tau, primary_record = _resolve_policy_tau(
            ctx, plan.threshold_policy, None, -1, None, val_split_path
        )
        if plan.threshold_policy and primary_tau is not None:
            threshold_key = th.format_threshold_key(
                dataset_name, plan.dataset_resolved.get("val_split") or "val",
                plan.threshold_policy,
            )
            thresholds_map[threshold_key] = float(primary_tau)
        if plan.sensitivity_threshold_policy == "sun_val_frozen":
            sensitivity_tau, sensitivity_record = primary_tau, dict(primary_record or {})

    # ---------------- final test -------------------------------------------
    test_results: Optional[Dict[str, Any]] = None
    curve_metadata: Optional[Dict[str, Any]] = None
    outputs_csv_path: Optional[Path] = None
    if "test" in ctx.datasets:
        test_results = eval_split_now("test", params, primary_tau, plan.limit_test_batches)
        outputs_csv_path = layout.output_dir / f"{layout.stem}_test_outputs.csv"
        outputs_export = exports.export_frame_outputs(
            outputs_csv_path,
            metadata_rows=test_results["metadata_rows"],
            probabilities=test_results["probabilities"],
            targets=test_results["targets"],
            preds=test_results["preds"],
            dataset_name=dataset_name,
        )
        if "test" in plan.curve_export_splits:
            curve_metadata = exports.export_curve_sets(
                layout.output_dir / layout.stem,
                "test",
                probabilities=test_results["probabilities"],
                targets=test_results["targets"],
                grid_points=plan.curve_export_splits["test"]["points"],
            )
        logger.text(
            f"test: AUROC {test_results.get('auroc', float('nan')):.4f} "
            f"F1 {test_results.get('f1', float('nan')):.4f} at tau {primary_tau}"
        )

    # ---------------- sensitivity block at test -----------------------------
    test_sensitivity_block = None
    if test_results is not None and sensitivity_tau is not None:
        from ssl4polyp_tpu.metrics.performance import binary_metrics_block

        test_sensitivity_block = binary_metrics_block(
            test_results["probabilities"], test_results["targets"],
            tau=sensitivity_tau, loss=test_results.get("loss"),
        )

    # align threshold record splits with data.val.path (reference :7533-7546)
    if primary_record is not None and val_split_path and primary_record.get("policy") != "sun_val_frozen":
        primary_record["split"] = val_split_path
    if sensitivity_record is not None and val_split_path and sensitivity_record.get("policy") != "sun_val_frozen":
        sensitivity_record["split"] = val_split_path

    # persist thresholds to the canonical store
    threshold_file_rel = None
    if thresholds_map and thresholds_root is not None:
        store_path = canonical_threshold_path(
            thresholds_root,
            val_pack=plan.dataset_resolved.get("val_pack"),
            model_tag=plan.model_tag,
            arch=plan.model_cfg.get("arch"),
            pretraining=plan.model_cfg.get("pretraining"),
            train_pack=plan.dataset_resolved.get("train_pack"),
            seed=plan.seed,
            policy=plan.threshold_policy,
        )
        th.save_thresholds(store_path, thresholds_map, primary=is_primary())
        threshold_file_rel = str(store_path)

    # ---------------- metrics.json -------------------------------------------
    run_block = exports.build_run_block(
        experiment=plan.experiment,
        experiment_config=ctx.exp_config_name,
        stem=layout.stem,
        model=plan.model_tag,
        arch=plan.model_cfg.get("arch"),
        pretraining=plan.model_cfg.get("pretraining"),
        finetune_mode=plan.finetune_mode,
        selection=selection_tag,
        seed=plan.seed,
        mode=run_mode,
        world_size=num_devices,
    )
    provenance_block = exports.build_provenance_block(
        model=plan.model_key or plan.model_tag,
        arch=plan.model_cfg.get("arch"),
        train_seed=plan.seed,
        dataset_summary=ctx.dataset_summary,
        test_outputs_csv=outputs_csv_path.name if outputs_csv_path else None,
        test_outputs_sha256=outputs_export.sha256 if outputs_csv_path else None,
        zero_shot_outputs_csv=zero_shot_outputs.name if zero_shot_outputs else None,
        zero_shot_outputs_sha256=(
            zero_shot_block["outputs_csv_sha256"] if zero_shot_block else None
        ),
        subset_percent=plan.dataset_layout.percent,
        pack_seed=plan.dataset_layout.dataset_seed,
        fewshot_budget=plan.dataset_layout.size,
        test_split=plan.dataset_resolved.get("test_split"),
        parent_run=(
            ctx.parent_reference.provenance_block(layout.base_dir)
            if ctx.parent_reference
            else None
        ),
    )
    thresholds_block = exports.build_thresholds_block(
        thresholds_map,
        policy=plan.threshold_policy,
        primary=primary_record,
        sensitivity=sensitivity_record,
        sources={"val": threshold_key or "", "test": threshold_key or ""},
    )

    payload: Dict[str, Any] = {
        "seed": plan.seed,
        "epoch": int(last_epoch),
        "train_loss": train_loss_last,
        "monitor_metric": monitor_name,
        "monitor_value": best_monitor,
        "run": run_block,
        "provenance": provenance_block,
        "data": data_block,
        "thresholds": thresholds_block,
        "threshold_policy": plan.threshold_policy,
    }
    if ctx.eval_only:
        payload["eval_only"] = True
    if val_results is not None:
        payload["val"] = exports.metric_block_for_export(val_results)
    if test_results is not None:
        payload["test_primary"] = exports.metric_block_for_export(test_results)
        if "case_metrics" in test_results:
            payload["test_per_case"] = test_results["case_metrics"]
        if "morphology_metrics" in test_results:
            payload["test_morphology"] = {
                key: exports.metric_block_for_export(value)
                for key, value in test_results["morphology_metrics"].items()
            }
        if "perturbation_metrics" in test_results:
            block: Dict[str, Any] = {
                "per_tag": {
                    tag: exports.metric_block_for_export(stats)
                    for tag, stats in sorted(test_results["perturbation_metrics"].items())
                }
            }
            if "perturbation_case_metrics" in test_results:
                block["per_case"] = test_results["perturbation_case_metrics"]
            payload["test_perturbations"] = block
    if test_sensitivity_block is not None:
        payload["test_sensitivity"] = exports.metric_block_for_export(test_sensitivity_block)
    if curve_metadata is not None:
        payload["curve_exports"] = {
            "test": {
                "path": curve_metadata["path"],
                "sha256": curve_metadata["sha256"],
                "metadata": {
                    "points": curve_metadata["points"],
                    "roc_csv": curve_metadata["roc_csv"],
                    "pr_csv": curve_metadata["pr_csv"],
                },
            }
        }
    if zero_shot_block is not None:
        payload["zero_shot"] = zero_shot_block
    if threshold_file_rel and threshold_key:
        payload["threshold_files"] = {threshold_key: threshold_file_rel}
    if plan.sensitivity_threshold_policy:
        payload["sensitivity_threshold_policy"] = plan.sensitivity_threshold_policy

    if is_primary():
        layout.metrics_path.write_text(json.dumps(payload, indent=2, default=_json_default))

    # _last checkpoint + metrics (reference :7557-7701)
    if not ctx.eval_only and last_epoch >= 0:
        last_name = f"{layout.stem}_last_e{last_epoch:02d}_{selection_tag}.ckpt"
        last_path = layout.output_dir / last_name
        save_checkpoint(
            last_path,
            {"params": params},
            {
                "epoch": last_epoch,
                "monitor_metric": monitor_name,
                "monitor_value": best_monitor,
                "seed": plan.seed,
                "model_cfg": _model_cfg_meta(ctx),
            },
        )
        update_pointer(layout.output_dir / f"{layout.stem}_last.ckpt", last_path)
        last_metrics_path = layout.output_dir / f"{layout.stem}_last.metrics.json"
        if is_primary():
            last_metrics_path.write_text(json.dumps(payload, indent=2, default=_json_default))

    logger.close()
    summary = {
        "stem": layout.stem,
        "epochs_run": epochs_run,
        "best_monitor": best_monitor,
        "tau": primary_tau,
        "metrics_path": str(layout.metrics_path),
        "test_auroc": test_results.get("auroc") if test_results else None,
        "payload": payload,
    }
    return summary


def _model_cfg_meta(ctx: TrainContext) -> Dict[str, Any]:
    """Architecture facts needed to rebuild the model at eval time."""
    cfg = ctx.classifier.cfg
    return {
        "img_size": cfg.img_size,
        "patch_size": cfg.patch_size,
        "embed_dim": cfg.embed_dim,
        "depth": cfg.depth,
        "num_heads": cfg.num_heads,
        "pos_embed": cfg.pos_embed,
        "out_token": cfg.out_token,
        "num_classes": cfg.num_classes,
        # Record the RESOLVED token padding (None → 0 = explicit no-pad):
        # padding changes bf16 reduction order at fp-noise scale, so a
        # frozen-τ eval must rebuild with the producing run's padding, not
        # the eval host's auto policy (advisor finding, round 3).
        "pad_tokens_to": int(cfg.pad_tokens_to or 0),
    }


def _json_default(value):
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, Path):
        return str(value)
    return str(value)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def cli_main(argv: Optional[List[str]] = None) -> None:
    import argparse

    from ssl4polyp_tpu.training.protocol import resolve_run_plan

    # Multi-host DCN init (no-op single process) — reference DDP init,
    # train_classification.py:6017-6027.
    initialize_multihost()

    parser = argparse.ArgumentParser(description="Classification fine-tuning (TPU)")
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("--model-key", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output-dir", default="checkpoints/classification")
    parser.add_argument("--pack-root", default=None)
    parser.add_argument("--checkpoint-root", default=None)
    parser.add_argument("--thresholds-root", default=None)
    parser.add_argument("--parent-checkpoint", default=None)
    parser.add_argument(
        "--override", action="append", default=[],
        help="dotted config overrides key.path=value",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the run's checkpoint pointer / newest epoch checkpoint",
    )
    # First-class smoke-run limits (reference train_classification.py:7932-7958);
    # equivalent to --override but documented and typed.
    parser.add_argument("--limit-train-batches", type=int, default=None)
    parser.add_argument("--limit-val-batches", type=int, default=None)
    parser.add_argument("--limit-test-batches", type=int, default=None)
    parser.add_argument("--max-train-steps", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = load_layered_config(args.exp_config)
    overrides: Dict[str, Any] = {}
    for limit_key in (
        "limit_train_batches", "limit_val_batches", "limit_test_batches", "max_train_steps",
    ):
        value = getattr(args, limit_key)
        if value is not None:
            overrides[limit_key] = int(value)
    for item in args.override:
        key, _, raw = item.partition("=")
        node = overrides
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        try:
            value: Any = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node[parts[-1]] = value

    plan = resolve_run_plan(
        cfg,
        model_key=args.model_key,
        seed=args.seed,
        overrides=overrides,
        parent_checkpoint=args.parent_checkpoint,
        output_dir=args.output_dir,
    )
    ctx = build_run(
        plan,
        output_dir=args.output_dir,
        pack_root=Path(args.pack_root) if args.pack_root else None,
        checkpoint_root=Path(args.checkpoint_root) if args.checkpoint_root else None,
        exp_config_name=args.exp_config,
    )
    thresholds_root = Path(args.thresholds_root) if args.thresholds_root else None
    summary = run_classification_training(
        ctx, thresholds_root=thresholds_root, resume=args.resume
    )
    print(json.dumps({k: v for k, v in summary.items() if k != "payload"}, default=str))


if __name__ == "__main__":
    cli_main()
