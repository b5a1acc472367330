"""Functional model cores: ViT encoder, MAE, classifier wrappers.

All models are pure functions over explicit parameter pytrees:

* ``init_*`` builds the parameter pytree from a PRNG key;
* ``*_forward`` applies the model (no hidden state, no modules).

Transformer blocks are *stacked*: every per-block tensor carries a leading
``depth`` axis and the forward pass runs ``jax.lax.scan`` over it.  One block
is compiled once regardless of depth, and rematerialisation policy can wrap
the scanned body — the TPU-idiomatic replacement for the reference's Python
loop over ``timm`` blocks (``src/ssl4polyp/models/mae/models_mae.py:39-41``).
"""

from .vit import ViTConfig, init_vit, vit_forward, vit_features
from .mae import MAEConfig, init_mae, mae_forward, patchify, unpatchify
from .factory import (
    get_mae_backbone,
    get_imagenet_or_random_vit,
    build_classifier,
    Classifier,
)

__all__ = [
    "ViTConfig",
    "init_vit",
    "vit_forward",
    "vit_features",
    "MAEConfig",
    "init_mae",
    "mae_forward",
    "patchify",
    "unpatchify",
    "get_mae_backbone",
    "get_imagenet_or_random_vit",
    "build_classifier",
    "Classifier",
]
