"""Upstream-MAE style fine-tune / linear-probe engines.

The reference vendors the upstream MAE fine-tuning path alongside its own
(``models/mae/main_finetune.py`` — AdamW + layer-wise LR decay + global
pooling; ``main_linprobe.py`` — LARS over a frozen encoder).  The study's
experiments use the classification engine instead, but the capability ships
here for parity:

* :func:`run_mae_finetune` — full fine-tune with ``layerwise_lr_decay_scales``
  (decay 0.75 upstream default) and spatial-mean pooling;
* :func:`run_linear_probe` — LARS, encoder frozen via zero lr-scales, head
  only.

Both consume a labeled :class:`PackIndex` (or any directory pack) and share
the jitted train-step pattern of the main engine.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ssl4polyp_tpu.data.augment import (
    augment_batch,
    mixup_cutmix_batch,
    normalize_batch,
    random_erasing,
    smooth_one_hot,
)
from ssl4polyp_tpu.data.loader import HostDataLoader
from ssl4polyp_tpu.data.packs import PackIndex
from ssl4polyp_tpu.models.factory import Classifier
from ssl4polyp_tpu.parallel.mesh import build_mesh
from ssl4polyp_tpu.training import optim
from ssl4polyp_tpu.training.schedules import warmup_cosine

__all__ = ["MAEFinetuneSettings", "run_mae_finetune", "run_linear_probe"]


@dataclass
class MAEFinetuneSettings:
    epochs: int = 100
    warmup_epochs: int = 5
    base_lr: float = 1e-3
    layer_decay: float = 0.75
    weight_decay: float = 0.05
    batch_size: int = 64
    num_workers: int = 8
    seed: int = 0
    log_interval: int = 20
    # Upstream regularizer knobs (reference ``main_finetune.py:87-112``):
    # label smoothing, Mixup/CutMix (enabled when alpha > 0), RandomErasing.
    smoothing: float = 0.1
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    reprob: float = 0.25
    recount: int = 1
    num_classes: int = 2


def _soft_cross_entropy(logits, targets, valid):
    """CE against soft targets (mixup/smoothed labels), masking padded rows."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(targets * log_probs, axis=-1)
    valid_f = valid.astype(jnp.float32)
    return jnp.sum(per_row * valid_f) / jnp.maximum(jnp.sum(valid_f), 1.0)


def _epoch_loop(classifier, params, train_index, settings, *, update_fn, opt_state, mesh, augment):
    cfg = classifier.cfg
    sharded = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def step(params, opt_state, images_u8, labels, valid, key, lr):
        def loss_fn(p):
            k_aug, k_erase, k_mix = jax.random.split(key, 3)
            if augment:
                images = augment_batch(images_u8, k_aug, dtype=cfg.compute_dtype)
            else:
                images = normalize_batch(images_u8, dtype=cfg.compute_dtype)
            targets = smooth_one_hot(labels, settings.num_classes, settings.smoothing)
            if augment:
                # timm order: per-sample erasing on the normalized tensor,
                # then batch-mode mixup/cutmix in the train loop
                if settings.reprob > 0.0:
                    images = random_erasing(
                        images, k_erase,
                        prob=settings.reprob, count=settings.recount,
                    )
                images, targets = mixup_cutmix_batch(
                    images, targets, k_mix,
                    mixup_alpha=settings.mixup_alpha,
                    cutmix_alpha=settings.cutmix_alpha,
                    prob=settings.mixup_prob,
                    switch_prob=settings.mixup_switch_prob,
                    valid=valid,
                )
            logits = classifier.apply(p, images)
            return _soft_cross_entropy(logits, targets, valid)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = update_fn(params, grads, opt_state, lr)
        return params, opt_state, loss

    jit_step = jax.jit(
        step,
        in_shardings=(replicated, replicated, sharded, sharded, sharded,
                      replicated, replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1),
    )

    loader = HostDataLoader(
        train_index, batch_size=settings.batch_size, seed=settings.seed,
        num_workers=settings.num_workers,
    )
    steps_per_epoch = len(loader)
    schedule = warmup_cosine(
        settings.base_lr, steps_per_epoch * settings.epochs,
        settings.warmup_epochs * steps_per_epoch,
    )
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)
    root_key = jax.random.PRNGKey(settings.seed)
    global_step = 0
    last_loss = float("nan")
    for epoch in range(settings.epochs):
        loader.set_epoch(epoch)
        for it, batch in enumerate(loader):
            key = jax.random.fold_in(jax.random.fold_in(root_key, epoch), it)
            params, opt_state, loss = jit_step(
                params, opt_state,
                jax.device_put(batch["image"], sharded),
                jax.device_put(batch["label"], sharded),
                jax.device_put(batch["valid"], sharded),
                key, jnp.float32(schedule(global_step)),
            )
            global_step += 1
        last_loss = float(loss)
        if not math.isfinite(last_loss):
            raise FloatingPointError(f"non-finite loss at epoch {epoch}")
    return params, last_loss


def run_mae_finetune(
    classifier: Classifier,
    train_index: PackIndex,
    settings: MAEFinetuneSettings = MAEFinetuneSettings(),
    mesh=None,
) -> Dict[str, Any]:
    """Full fine-tune with layer-wise LR decay (upstream ``main_finetune``).

    pos_embed is TRAINABLE here (it receives the embeddings-group layer
    decay) — upstream's fine-tune model is a standard trainable-pos-embed
    ViT whose table is initialised from the MAE checkpoint and then
    trained (``models_vit.py`` + ``lr_decay.param_groups_lrd``); only the
    SSL4POLYP classifier lineage (``ViT_from_MAE``) inherits the frozen
    buffer, which ``classification.ScheduleRuntime(freeze_pos_embed=...)``
    handles.  The two lineages intentionally differ.
    """
    mesh = mesh or build_mesh()
    params = classifier.params
    lr_scale = optim.layerwise_lr_decay_scales(
        params, classifier.cfg.depth, settings.layer_decay
    )
    wd_scale = optim.no_weight_decay_scales(params)
    opt_state = optim.adamw_init(params)

    def update(params, grads, opt_state, lr):
        return optim.adamw_update(
            params, grads, opt_state, lr=lr,
            weight_decay=settings.weight_decay,
            lr_scale=lr_scale, wd_scale=wd_scale,
        )

    params, last_loss = _epoch_loop(
        classifier, params, train_index, settings,
        update_fn=update, opt_state=opt_state, mesh=mesh, augment=True,
    )
    return {"params": params, "train_loss": last_loss}


def run_linear_probe(
    classifier: Classifier,
    train_index: PackIndex,
    settings: MAEFinetuneSettings = MAEFinetuneSettings(
        base_lr=0.1, weight_decay=0.0, smoothing=0.0
    ),
    mesh=None,
) -> Dict[str, Any]:
    """Linear probe: frozen encoder, LARS on the head (upstream ``main_linprobe``)."""
    mesh = mesh or build_mesh()
    params = classifier.params
    lr_scale = optim.finetune_lr_scales(params, "none", classifier.cfg.depth)
    opt_state = optim.lars_init(params)

    def update(params, grads, opt_state, lr):
        return optim.lars_update(
            params, grads, opt_state, lr=lr,
            weight_decay=settings.weight_decay, lr_scale=lr_scale,
        )

    params, last_loss = _epoch_loop(
        classifier, params, train_index, settings,
        update_fn=update, opt_state=opt_state, mesh=mesh, augment=False,
    )
    return {"params": params, "train_loss": last_loss}
