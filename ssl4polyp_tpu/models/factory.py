"""Backbone/classifier factories for the three pretraining schemes.

Mirrors the capability of the reference factories
(``src/ssl4polyp/models/utils/__init__.py:29-66``):

* ``get_mae_backbone``   — ViT-B encoder with MAE lineage (fixed sin-cos pos
  embeddings), optionally initialised from an MAE torch checkpoint
  (SSL-imnet / SSL-colon schemes);
* ``get_imagenet_or_random_vit`` — timm-lineage ViT-B (learned pos
  embeddings), optionally initialised from a local AugReg ``.npz``
  (SUP-imnet scheme) — no network download: the checkpoint path must exist.

Both return a :class:`Classifier` bundling the parameter pytree, the model
config and a jittable ``apply`` function.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dpt import DPTConfig, TAP_BLOCKS, dpt_forward, init_dpt
from .vit import ViTConfig, init_vit, vit_forward, vit_tap_features
from .import_torch import (
    load_torch_state_dict,
    mae_params_from_torch,
    vit_params_from_augreg_npz,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class Classifier:
    params: Params
    cfg: ViTConfig
    scheme: str  # "sup_imnet" | "ssl_imnet" | "ssl_colon" | "random"

    def apply(self, params: Params, images: jax.Array) -> jax.Array:
        return vit_forward(params, images, self.cfg)


@dataclass(frozen=True)
class DenseClassifier:
    """ViT encoder taps {2,5,8,11} → DPT decoder → dense logits.

    The reference's ``dense=True`` composition (``models.py:117-130``:
    ``forward_features`` collects the tapped blocks, ``self.decoder`` is the
    DPT from ``DPT_decoder.py``).  ``params`` holds ``{"encoder": ...,
    "dpt": ...}`` so freeze regimes can scale the two subtrees separately.
    """

    params: Params
    cfg: ViTConfig
    dpt_cfg: DPTConfig
    scheme: str

    def apply(self, params: Params, images: jax.Array) -> jax.Array:
        taps = vit_tap_features(params["encoder"], images, self.cfg,
                                taps=TAP_BLOCKS)
        return dpt_forward(params["dpt"], taps, self.dpt_cfg).astype(jnp.float32)


def _as_dense(classifier: "Classifier", key: jax.Array, num_classes: int,
              readout: str = "ignore") -> DenseClassifier:
    """Wrap a pooled classifier's encoder with a fresh DPT decoder.

    ``readout`` selects the cls-token readout operator — ignore/add/project,
    matching the reference's ``get_readout_oper`` (``DPT_decoder.py:52-60``).
    """
    encoder = {k: v for k, v in classifier.params.items() if k != "head"}
    dpt_cfg = DPTConfig(
        embed_dim=classifier.cfg.embed_dim,
        num_classes=num_classes,
        grid_size=classifier.cfg.grid_size,
        readout=readout,
    )
    return DenseClassifier(
        params={"encoder": encoder, "dpt": init_dpt(key, dpt_cfg)},
        cfg=classifier.cfg,
        dpt_cfg=dpt_cfg,
        scheme=classifier.scheme,
    )


def _as_jax(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), tree)


def _vit_b(num_classes: Optional[int], out_token: str, pos_embed: str, **overrides) -> ViTConfig:
    kwargs = dict(
        embed_dim=768,
        depth=12,
        num_heads=12,
        pos_embed=pos_embed,
        num_classes=num_classes,
        out_token=out_token,
    )
    # Overrides (tests, eval-time rebuilds from checkpoint meta) win over the
    # scheme defaults, including pos_embed/out_token.
    kwargs.update(overrides)
    kwargs.setdefault("num_classes", num_classes)
    cfg = ViTConfig(**kwargs)
    # Sublane-align the token sequence when the Pallas kernels are on so
    # the flattened-stream bitcast condition holds (197 → 200 for B/16;
    # masked and numerically exact — see layers.run_blocks).  Explicit
    # pad_tokens_to=0 opts out.
    if cfg.use_pallas_attention and cfg.pad_tokens_to is None:
        n_tokens = cfg.num_patches + 1
        if n_tokens % 8:
            cfg = replace(cfg, pad_tokens_to=-(-n_tokens // 8) * 8)
    return cfg


def get_mae_backbone(
    key: jax.Array,
    weight_path: Optional[str | Path] = None,
    num_classes: Optional[int] = 2,
    out_token: str = "cls",
    scheme: str = "ssl_colon",
    **overrides,
) -> Classifier:
    """ViT-B encoder from an MAE checkpoint (decoder discarded) + fresh head.

    Accepts both checkpoint families: native ``.ckpt`` msgpack pytrees
    written by :mod:`ssl4polyp_tpu.training.pretrain` and reference-format
    torch ``.pth`` files (``ckpt["model"]`` state dicts).
    """
    overrides = dict(overrides)
    pos_embed = overrides.pop("pos_embed", "sincos")
    out_token = overrides.pop("out_token", out_token)
    cfg = _vit_b(num_classes, out_token, pos_embed=pos_embed, **overrides)
    params = init_vit(key, cfg)
    if weight_path is not None:
        imported = _load_mae_encoder(weight_path, cfg)
        head = params.get("head")
        params = imported
        if head is not None:
            params["head"] = head
    return Classifier(params=params, cfg=cfg, scheme=scheme)


def _load_mae_encoder(weight_path: str | Path, cfg: ViTConfig) -> Params:
    """Load an MAE encoder pytree from a native or torch checkpoint."""
    path = Path(weight_path)
    if path.suffix == ".ckpt" or path.name.endswith(".ckpt.json"):
        from ssl4polyp_tpu.models.mae import encoder_only
        from ssl4polyp_tpu.utils.checkpoint import load_checkpoint

        restored = load_checkpoint(path)
        mae_params = restored["payload"].get("params")
        if mae_params is None:
            raise ValueError(f"Native checkpoint {path} lacks a 'params' payload")
        return _as_jax(encoder_only(mae_params))
    # Try native msgpack first even without the suffix, then torch pickle.
    try:
        from ssl4polyp_tpu.models.mae import encoder_only
        from ssl4polyp_tpu.utils.checkpoint import load_checkpoint

        restored = load_checkpoint(path)
        mae_params = restored.get("payload", {}).get("params")
        if mae_params is not None:
            return _as_jax(encoder_only(mae_params))
    except Exception:
        pass
    state = load_torch_state_dict(path, key="model")
    return _as_jax(mae_params_from_torch(state, cfg, include_decoder=False))


def get_imagenet_or_random_vit(
    key: jax.Array,
    pretrained_npz: Optional[str | Path] = None,
    num_classes: Optional[int] = 2,
    out_token: str = "cls",
    **overrides,
) -> Classifier:
    """timm-lineage ViT-B: AugReg weights when a local ``.npz`` is given, else random."""
    overrides = dict(overrides)
    pos_embed = overrides.pop("pos_embed", "learned")
    out_token = overrides.pop("out_token", out_token)
    cfg = _vit_b(num_classes, out_token, pos_embed=pos_embed, **overrides)
    params = init_vit(key, cfg)
    scheme = "random"
    if pretrained_npz == "auto":
        # Conventional cache location filled by scripts/fetch_augreg.py on
        # an internet-connected host (the offline half of the reference's
        # fetch-and-cache flow, models.py:52-55,225).
        from .augreg_cache import default_path

        pretrained_npz = default_path()
    if pretrained_npz is not None:
        npz = Path(pretrained_npz)
        if not npz.exists():
            raise FileNotFoundError(
                f"AugReg checkpoint not found at {npz}. This environment has no "
                "network egress; run scripts/fetch_augreg.py on an internet "
                "host, ship the npz, and point the model config checkpoint "
                "field (or SSL4POLYP_TPU_CACHE) at it."
            )
        imported = _as_jax(vit_params_from_augreg_npz(npz, cfg))
        head = params.get("head")
        params = imported
        if head is not None:
            params["head"] = head
        scheme = "sup_imnet"
    return Classifier(params=params, cfg=cfg, scheme=scheme)


def build_classifier(
    key: jax.Array,
    model_cfg: Dict[str, Any],
    num_classes: int = 2,
    checkpoint_root: Optional[Path] = None,
    **overrides,
) -> Classifier:
    """Build a classifier from a ``model:`` config section.

    Dispatch mirrors the reference's scheme table (``config/model/*.yaml`` +
    ``train_classification.py`` model selection): ``ss_framework: mae`` →
    MAE backbone; ``pretraining: ImageNet_class`` → AugReg ViT; otherwise
    random init.  ``dense: true`` (config key or kwarg) wires the encoder
    taps {2,5,8,11} into the DPT decoder (reference ``models.py:124``) and
    returns a :class:`DenseClassifier` emitting (B, H/2, W/2, num_classes)
    logits instead of pooled ones.
    """
    dense = bool(overrides.pop("dense", model_cfg.get("dense", False)))
    dense_readout = str(
        overrides.pop("dense_readout", model_cfg.get("dense_readout", "ignore"))
    )
    if dense:
        key, dense_key = jax.random.split(key)
    pretraining = str(model_cfg.get("pretraining", "random")).lower()
    ss_framework = str(model_cfg.get("ss_framework", "")).lower()
    checkpoint = model_cfg.get("checkpoint")
    if checkpoint is not None and checkpoint_root is not None:
        candidate = Path(checkpoint)
        if not candidate.is_absolute():
            checkpoint = checkpoint_root / candidate

    if ss_framework == "mae" or pretraining in {"hyperkvasir", "imagenet_self"}:
        scheme = str(model_cfg.get("key", "ssl"))
        weight = checkpoint if checkpoint and Path(checkpoint).exists() else None
        classifier = get_mae_backbone(
            key, weight_path=weight, num_classes=num_classes, scheme=scheme, **overrides
        )
    elif pretraining == "imagenet_class":
        npz = checkpoint if checkpoint and Path(checkpoint).exists() else None
        classifier = get_imagenet_or_random_vit(
            key, pretrained_npz=npz, num_classes=num_classes, **overrides
        )
    else:
        classifier = get_imagenet_or_random_vit(
            key, None, num_classes=num_classes, **overrides
        )
    if dense:
        return _as_dense(classifier, dense_key, num_classes, readout=dense_readout)
    return classifier
