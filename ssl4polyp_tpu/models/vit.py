"""ViT-B/16 encoder as a pure function over a parameter pytree.

Capability parity with the reference classifier backbones
(``src/ssl4polyp/models/models.py:26-141`` for the timm-style ViT and
``:143-222`` for the MAE-derived encoder) in a TPU-native shape:

* images are NHWC (the TPU-preferred layout);
* patch embedding is a reshape + one (P²·3, D) matmul — identical math to a
  stride-P conv but expressed as the MXU-shaped GEMM it really is;
* the 12 blocks are stacked and scanned (see :mod:`.layers`);
* positional embeddings are either fixed sin-cos (MAE lineage) or learned
  (timm lineage), selected by config.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import layers
from .pos_embed import sincos_2d

Params = Dict[str, Any]


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    pos_embed: str = "sincos"  # "sincos" (fixed, MAE lineage) | "learned" (timm lineage)
    num_classes: Optional[int] = None  # None → no classification head
    out_token: str = "cls"  # "cls" | "spatial" (mean of patch tokens)
    compute_dtype: Any = jnp.bfloat16
    use_pallas_attention: bool = False
    # None → follow use_pallas_attention.  Separately togglable because the
    # LN custom calls pin {2,1,0} layouts at 4 points per block: at large
    # batches XLA prefers a batch-major residual-stream layout and the pins
    # cost relayout copies (PERF_NOTES.md round 2).
    fused_layernorm: Optional[bool] = None
    remat: bool = False
    unroll_blocks: bool = False
    attention_softmax_f32: bool = True
    # Pad the token sequence (1+N, 197 for ViT-B/16) to this length through
    # the blocks: with N % 8 == 0 the flattened residual stream's kernel
    # views are bitcasts (layers.run_blocks auto-flatten) — the same
    # masked, numerically-exact padding as MAEConfig.decoder_pad_to.
    # None → the factory picks the next sublane multiple when the Pallas
    # kernels are on; 0 → explicitly off.
    pad_tokens_to: Optional[int] = None
    # MLP kernel policy on the flattened stream: None → "fc1" (the measured
    # default), "full" fuses fc1+GELU+fc2 into one Pallas kernel, "full_ln"
    # additionally folds the pre-MLP LayerNorm into it, "off" forces plain
    # XLA dots.  Ignored for 3-D (unflattened) streams.
    mlp_fusion: Optional[str] = None
    # Fold each block's pre-attention LayerNorm into the QKV projection
    # kernel (ops/ln_linear.py; flattened stream only).  A/B candidate.
    qkv_ln_fusion: bool = False

    @property
    def fused_ln(self) -> Optional[bool]:
        """Tri-state: explicit bool, or None → batch-aware auto in run_blocks."""
        if self.fused_layernorm is None:
            return None if self.use_pallas_attention else False
        return self.fused_layernorm

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.in_chans


VIT_B16 = ViTConfig()


def init_vit(key: jax.Array, cfg: ViTConfig = VIT_B16) -> Params:
    """Build the full parameter pytree for a ViT encoder (+ optional head)."""
    k_patch, k_blocks, k_cls, k_pos, k_head = jax.random.split(key, 5)
    params: Params = {
        "patch_embed": layers.init_linear(k_patch, cfg.patch_dim, cfg.embed_dim),
        "cls_token": layers.trunc_normal(k_cls, (1, 1, cfg.embed_dim)),
        "blocks": layers.init_blocks(k_blocks, cfg.depth, cfg.embed_dim, cfg.mlp_ratio),
        "norm": layers.init_layernorm(cfg.embed_dim),
    }
    if cfg.pos_embed == "sincos":
        table = sincos_2d(cfg.embed_dim, cfg.grid_size, cls_token=True)
        params["pos_embed"] = jnp.asarray(table)[None]  # (1, N+1, D), fixed
    elif cfg.pos_embed == "learned":
        params["pos_embed"] = layers.trunc_normal(k_pos, (1, cfg.num_patches + 1, cfg.embed_dim))
    else:
        raise ValueError(f"Unknown pos_embed mode {cfg.pos_embed!r}")
    if cfg.num_classes is not None:
        params["head"] = layers.init_linear(k_head, cfg.embed_dim, cfg.num_classes)
    return params


def embed_patches(params: Params, images: jax.Array, cfg: ViTConfig) -> jax.Array:
    """NHWC images → (B, num_patches, D) via reshape + matmul."""
    B, H, W, C = images.shape
    p = cfg.patch_size
    g = H // p
    x = images.reshape(B, g, p, g, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * C)
    x = x.astype(cfg.compute_dtype)
    return layers.linear(x, params["patch_embed"])


def vit_features(params: Params, images: jax.Array, cfg: ViTConfig = VIT_B16) -> jax.Array:
    """Run the encoder; returns normalised token sequence (B, N+1, D)."""
    params = layers.cast_params_for_compute(params, cfg.compute_dtype)
    x = embed_patches(params, images, cfg)
    pos = params["pos_embed"].astype(cfg.compute_dtype)
    x = x + pos[:, 1:, :]
    cls = (params["cls_token"].astype(cfg.compute_dtype) + pos[:, :1, :])
    cls = jnp.broadcast_to(cls, (x.shape[0], 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    n_tokens = x.shape[1]
    pad_to = cfg.pad_tokens_to
    padded = bool(pad_to) and pad_to > n_tokens
    if padded:
        x = jnp.pad(x, ((0, 0), (0, pad_to - n_tokens), (0, 0)))
    x = layers.run_blocks(
        x,
        params["blocks"],
        cfg.num_heads,
        ln_eps=cfg.ln_eps,
        use_pallas=cfg.use_pallas_attention,
        remat=cfg.remat,
        unroll=cfg.unroll_blocks,
        softmax_f32=cfg.attention_softmax_f32,
        fused_ln=cfg.fused_ln,
        valid_len=n_tokens if padded else None,
        mlp_fusion=cfg.mlp_fusion,
        qkv_ln_fusion=cfg.qkv_ln_fusion,
    )
    if padded:
        x = x[:, :n_tokens, :]
    return layers.layernorm(x, params["norm"]["scale"], params["norm"]["bias"],
                            cfg.ln_eps, fused=cfg.fused_ln)


def vit_tap_features(
    params: Params,
    images: jax.Array,
    cfg: ViTConfig = VIT_B16,
    taps: tuple[int, ...] = (2, 5, 8, 11),
) -> list[jax.Array]:
    """Run the encoder collecting intermediate block outputs.

    Dense mode taps the *pre-norm* outputs of blocks ``taps`` (reference
    ``models.py:117-127``: ``forward_features`` appends ``blk(x)`` for
    i in {2, 5, 8, 11} and skips the final norm when ``dense``).
    Returns the tapped (B, N+1, D) token tensors, shallowest first.
    """
    params = layers.cast_params_for_compute(params, cfg.compute_dtype)
    x = embed_patches(params, images, cfg)
    pos = params["pos_embed"].astype(cfg.compute_dtype)
    x = x + pos[:, 1:, :]
    cls = (params["cls_token"].astype(cfg.compute_dtype) + pos[:, :1, :])
    cls = jnp.broadcast_to(cls, (x.shape[0], 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    _, collected = layers.run_blocks_collect(
        x,
        params["blocks"],
        cfg.num_heads,
        ln_eps=cfg.ln_eps,
        use_pallas=cfg.use_pallas_attention,
    )
    return [collected[i] for i in taps]


def pool_tokens(tokens: jax.Array, out_token: str) -> jax.Array:
    """cls-token or spatial-mean pooling (reference ``models.py:134-137``)."""
    if out_token == "cls":
        return tokens[:, 0]
    if out_token == "spatial":
        return tokens[:, 1:].mean(axis=1)
    raise ValueError(f"Unknown out_token {out_token!r}")


def vit_forward(params: Params, images: jax.Array, cfg: ViTConfig = VIT_B16) -> jax.Array:
    """Full forward: logits when the config has a head, pooled features otherwise."""
    tokens = vit_features(params, images, cfg)
    pooled = pool_tokens(tokens, cfg.out_token)
    if cfg.num_classes is not None and "head" in params:
        logits = layers.linear(pooled, params["head"])
        return logits.astype(jnp.float32)
    return pooled.astype(jnp.float32)


def with_head(params: Params, key: jax.Array, cfg: ViTConfig, num_classes: int) -> tuple[Params, ViTConfig]:
    """Attach a fresh classification head to an existing backbone."""
    new_cfg = replace(cfg, num_classes=num_classes)
    new_params = dict(params)
    new_params["head"] = layers.init_linear(key, cfg.embed_dim, num_classes)
    return new_params, new_cfg
