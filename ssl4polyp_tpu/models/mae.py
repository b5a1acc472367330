"""Masked Autoencoder (MAE) over the functional ViT encoder.

Behavioural parity with the reference MAE
(``src/ssl4polyp/models/mae/models_mae.py``):

* per-sample random masking by argsort of uniform noise (``:123-148``) — here
  driven by an explicit JAX PRNG key;
* encoder sees only kept patches + cls token, with fixed sin-cos positional
  embeddings added *before* masking (``:150-170``);
* decoder embeds to 512, splices learned mask tokens back via the restore
  permutation, runs 8 blocks, predicts per-patch pixels (``:172-196``);
* MSE on masked patches only, optionally on per-patch-normalised pixels
  (``:198-214``).

TPU-first differences: NHWC images, static shapes throughout (the number of
kept patches is a compile-time constant derived from the mask ratio), gathers
via ``take_along_axis``, and stacked/scanned blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import layers
from .pos_embed import sincos_2d
from .vit import ViTConfig, embed_patches

Params = Dict[str, Any]


@dataclass(frozen=True)
class MAEConfig:
    encoder: ViTConfig = ViTConfig(pos_embed="sincos")
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mask_ratio: float = 0.75
    norm_pix_loss: bool = False
    # Pad the decoder token sequence (1+L, e.g. 197 for ViT-B/16) up to this
    # length before the blocks: with N % 8 == 0 the flattened residual
    # stream's kernel views are bitcasts (layers.run_blocks auto-flatten).
    # Padding keys are masked out of the softmax (``valid_len``) and padded
    # rows carry zero upstream grads, so the computation is exact.
    # None = no padding.
    decoder_pad_to: "Optional[int]" = None
    # Same for the encoder's kept-token sequence (1+len_keep, e.g. 50 for
    # ViT-B/16 at mask_ratio 0.75 → pad to 56).  Trades +12% encoder-block
    # FLOPs for the flattened-stream kernels; masked, numerically exact.
    encoder_pad_to: "Optional[int]" = None

    @property
    def len_keep(self) -> int:
        return int(self.encoder.num_patches * (1.0 - self.mask_ratio))


MAE_VIT_B16 = MAEConfig()
MAE_VIT_L16 = MAEConfig(encoder=ViTConfig(embed_dim=1024, depth=24, num_heads=16))
MAE_VIT_H14 = MAEConfig(encoder=ViTConfig(patch_size=14, embed_dim=1280, depth=32, num_heads=16))


def init_mae(key: jax.Array, cfg: MAEConfig = MAE_VIT_B16) -> Params:
    """Initialise encoder + decoder parameter pytrees."""
    enc = cfg.encoder
    (k_patch, k_blocks, k_cls, k_dec_embed, k_dec_blocks,
     k_mask, k_pred) = jax.random.split(key, 7)

    params: Params = {
        "patch_embed": layers.init_linear(k_patch, enc.patch_dim, enc.embed_dim),
        "cls_token": layers.trunc_normal(k_cls, (1, 1, enc.embed_dim)),
        "pos_embed": jnp.asarray(sincos_2d(enc.embed_dim, enc.grid_size, cls_token=True))[None],
        "blocks": layers.init_blocks(k_blocks, enc.depth, enc.embed_dim, enc.mlp_ratio),
        "norm": layers.init_layernorm(enc.embed_dim),
        "decoder": {
            "embed": layers.init_linear(k_dec_embed, enc.embed_dim, cfg.decoder_embed_dim),
            "mask_token": layers.trunc_normal(k_mask, (1, 1, cfg.decoder_embed_dim)),
            "pos_embed": jnp.asarray(
                sincos_2d(cfg.decoder_embed_dim, enc.grid_size, cls_token=True)
            )[None],
            "blocks": layers.init_blocks(
                k_dec_blocks, cfg.decoder_depth, cfg.decoder_embed_dim, enc.mlp_ratio
            ),
            "norm": layers.init_layernorm(cfg.decoder_embed_dim),
            "pred": layers.init_linear(k_pred, cfg.decoder_embed_dim, enc.patch_dim),
        },
    }
    return params


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) → (B, L, P²·C), channel-last within each patch.

    Channel ordering inside a patch follows (p, q, c) — pixel position fastest
    in rows, channels last — matching the reference einsum ``nchpwq→nhwpqc``
    (``models_mae.py:95-107``) so imported decoders predict identical layouts.
    """
    B, H, W, C = images.shape
    p = patch_size
    g = H // p
    x = images.reshape(B, g, p, g, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, p, q, C
    return x.reshape(B, g * g, p * p * C)


def unpatchify(patches: jax.Array, patch_size: int) -> jax.Array:
    """Inverse of :func:`patchify`: (B, L, P²·C) → (B, H, W, C)."""
    B, L, F = patches.shape
    p = patch_size
    g = int(round(L ** 0.5))
    C = F // (p * p)
    x = patches.reshape(B, g, g, p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, g * p, g * p, C)


class MaskingResult(NamedTuple):
    kept: jax.Array          # (B, len_keep, D) kept patch embeddings
    mask: jax.Array          # (B, L) binary, 1 = masked/removed
    ids_restore: jax.Array   # (B, L) permutation restoring original order


def random_masking(x: jax.Array, rng: jax.Array, len_keep: int) -> MaskingResult:
    """Per-sample random masking via argsort of uniform noise.

    Static output shapes: ``len_keep`` is a Python int, so XLA sees fixed
    shapes — the tracing-friendly equivalent of ``models_mae.py:123-148``.
    """
    B, L, D = x.shape
    noise = jax.random.uniform(rng, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    kept = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((B, L), dtype=x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return MaskingResult(kept=kept, mask=mask, ids_restore=ids_restore)


def mae_encode(
    params: Params,
    images: jax.Array,
    rng: jax.Array,
    cfg: MAEConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encoder over kept patches; returns (latent, mask, ids_restore)."""
    enc = cfg.encoder
    x = embed_patches(params, images, enc)
    pos = params["pos_embed"].astype(x.dtype)
    x = x + pos[:, 1:, :]
    kept, mask, ids_restore = random_masking(x, rng, cfg.len_keep)
    cls = params["cls_token"].astype(x.dtype) + pos[:, :1, :]
    cls = jnp.broadcast_to(cls, (x.shape[0], 1, enc.embed_dim))
    h = jnp.concatenate([cls, kept], axis=1)
    n_tokens = h.shape[1]
    pad_to = cfg.encoder_pad_to
    padded = pad_to is not None and pad_to > n_tokens
    if padded:
        h = jnp.pad(h, ((0, 0), (0, pad_to - n_tokens), (0, 0)))
    h = layers.run_blocks(
        h, params["blocks"], enc.num_heads, ln_eps=enc.ln_eps,
        use_pallas=enc.use_pallas_attention, remat=enc.remat,
        unroll=enc.unroll_blocks, softmax_f32=enc.attention_softmax_f32,
        fused_ln=enc.fused_ln,
        valid_len=n_tokens if padded else None,
        mlp_fusion=enc.mlp_fusion,
        qkv_ln_fusion=enc.qkv_ln_fusion,
    )
    if padded:
        h = h[:, :n_tokens, :]
    h = layers.layernorm(h, params["norm"]["scale"], params["norm"]["bias"],
                         enc.ln_eps, fused=enc.fused_ln)
    return h, mask, ids_restore


def mae_decode(
    params: Params,
    latent: jax.Array,
    ids_restore: jax.Array,
    cfg: MAEConfig,
) -> jax.Array:
    """Decoder: splice mask tokens, unshuffle, 8 blocks, per-patch pixel head."""
    dec = params["decoder"]
    enc = cfg.encoder
    x = layers.linear(latent, dec["embed"])  # (B, 1+keep, Dd)
    B = x.shape[0]
    L = ids_restore.shape[1]
    n_masked = L + 1 - x.shape[1]
    mask_tokens = jnp.broadcast_to(
        dec["mask_token"].astype(x.dtype), (B, n_masked, cfg.decoder_embed_dim)
    )
    body = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)  # (B, L, Dd)
    body = jnp.take_along_axis(body, ids_restore[:, :, None], axis=1)
    x = jnp.concatenate([x[:, :1, :], body], axis=1)
    x = x + dec["pos_embed"].astype(x.dtype)
    n_tokens = x.shape[1]
    pad_to = cfg.decoder_pad_to
    if pad_to is not None and pad_to > n_tokens:
        x = jnp.pad(x, ((0, 0), (0, pad_to - n_tokens), (0, 0)))
    x = layers.run_blocks(
        x, dec["blocks"], cfg.decoder_num_heads, ln_eps=enc.ln_eps,
        use_pallas=enc.use_pallas_attention, remat=enc.remat,
        unroll=enc.unroll_blocks, softmax_f32=enc.attention_softmax_f32,
        fused_ln=enc.fused_ln,
        valid_len=n_tokens if (pad_to is not None and pad_to > n_tokens) else None,
        mlp_fusion=enc.mlp_fusion,
        qkv_ln_fusion=enc.qkv_ln_fusion,
    )
    if pad_to is not None and pad_to > n_tokens:
        x = x[:, :n_tokens, :]
    x = layers.layernorm(x, dec["norm"]["scale"], dec["norm"]["bias"],
                         enc.ln_eps, fused=enc.fused_ln)
    x = layers.linear(x, dec["pred"])
    return x[:, 1:, :]  # drop cls


def mae_loss(
    images: jax.Array,
    pred: jax.Array,
    mask: jax.Array,
    cfg: MAEConfig,
) -> jax.Array:
    """MSE over masked patches only, fp32 accumulation."""
    target = patchify(images.astype(jnp.float32), cfg.encoder.patch_size)
    pred = pred.astype(jnp.float32)
    if cfg.norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    per_patch = jnp.mean(jnp.square(pred - target), axis=-1)  # (B, L)
    mask = mask.astype(jnp.float32)
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mae_forward(
    params: Params,
    images: jax.Array,
    rng: jax.Array,
    cfg: MAEConfig = MAE_VIT_B16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full MAE step: returns (loss, pred_patches, mask)."""
    params = layers.cast_params_for_compute(params, cfg.encoder.compute_dtype)
    latent, mask, ids_restore = mae_encode(params, images, rng, cfg)
    pred = mae_decode(params, latent, ids_restore, cfg)
    loss = mae_loss(images, pred, mask, cfg)
    return loss, pred, mask


def encoder_only(params: Params) -> Params:
    """Strip the decoder (reference deletes it when building classifiers —
    ``models.py:171-175``); keeps the encoder pytree for fine-tuning."""
    return {k: v for k, v in params.items() if k != "decoder"}
