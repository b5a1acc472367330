"""DPT dense-prediction decoder over ViT feature taps (functional JAX).

Capability parity with the reference's ``models/DPT_decoder.py`` (used when
``dense=True``; classification experiments never enable it but it is part of
the model-zoo surface — SURVEY §2.3).  Structure:

* taps: block outputs {2, 5, 8, 11} of the 12-block encoder;
* readout: what to do with the cls token before reassembly — ``"ignore"``
  (drop it), ``"add"`` (broadcast-add it to every spatial token), or
  ``"project"`` (concat it to every spatial token and project 2D→D with a
  GELU linear), matching the reference's three readout operators
  (``DPT_decoder.py:21-60`` Slice/AddReadout/ProjectReadout);
* reassemble: per-tap 1×1 projection to [96, 192, 384, 768] channels and
  spatial rescale to {4×, 2×, 1×, ½×} of the patch grid;
* scratch: 3×3 convs onto a common 256-channel pyramid;
* fusion: residual conv units merging coarse→fine with 2× upsampling;
* head: 3×3 conv → ReLU → 1×1 conv to ``num_classes`` logits at input/2.

All convs are NHWC ``lax.conv_general_dilated`` (XLA maps them onto the MXU);
upsampling is bilinear ``jax.image.resize``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

__all__ = ["DPTConfig", "init_dpt", "dpt_forward", "TAP_BLOCKS"]

TAP_BLOCKS = (2, 5, 8, 11)


@dataclass(frozen=True)
class DPTConfig:
    embed_dim: int = 768
    num_classes: int = 2
    features: int = 256
    reassemble_channels: Tuple[int, int, int, int] = (96, 192, 384, 768)
    grid_size: int = 14  # 224 / 16
    readout: str = "ignore"  # "ignore" | "add" | "project"


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    limit = math.sqrt(6.0 / (fan_in + cout))
    kernel = jax.random.uniform(key, (kh, kw, cin, cout), minval=-limit, maxval=limit)
    return {"kernel": kernel, "bias": jnp.zeros((cout,))}


def _conv(x, p, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"].astype(x.dtype)


def _linear_init(key, fan_in, fan_out):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    kernel = jax.random.uniform(key, (fan_in, fan_out), minval=-limit, maxval=limit)
    return {"kernel": kernel, "bias": jnp.zeros((fan_out,))}


def init_dpt(key: jax.Array, cfg: DPTConfig = DPTConfig()) -> Params:
    if cfg.readout not in ("ignore", "add", "project"):
        raise ValueError(
            f"readout must be 'ignore', 'add', or 'project', got {cfg.readout!r}"
        )
    keys = iter(jax.random.split(key, 40))
    params: Params = {"reassemble": [], "scratch": [], "fusion": [], "head": {}}
    for channels in cfg.reassemble_channels:
        reassemble: Params = {
            "project": _conv_init(next(keys), 1, 1, cfg.embed_dim, channels)
        }
        if cfg.readout == "project":
            # Per-tap 2D -> D GELU projection of [spatial ; cls]
            # (reference ProjectReadout is one instance per tap).
            reassemble["readout_project"] = _linear_init(
                next(keys), 2 * cfg.embed_dim, cfg.embed_dim
            )
        params["reassemble"].append(reassemble)
        params["scratch"].append(_conv_init(next(keys), 3, 3, channels, cfg.features))
    for _ in cfg.reassemble_channels:
        params["fusion"].append({
            "res1": {
                "conv1": _conv_init(next(keys), 3, 3, cfg.features, cfg.features),
                "conv2": _conv_init(next(keys), 3, 3, cfg.features, cfg.features),
            },
            "res2": {
                "conv1": _conv_init(next(keys), 3, 3, cfg.features, cfg.features),
                "conv2": _conv_init(next(keys), 3, 3, cfg.features, cfg.features),
            },
            "project": _conv_init(next(keys), 1, 1, cfg.features, cfg.features),
        })
    params["head"] = {
        "conv1": _conv_init(next(keys), 3, 3, cfg.features, cfg.features // 2),
        "conv2": _conv_init(next(keys), 1, 1, cfg.features // 2, cfg.num_classes),
    }
    return params


def _residual_unit(x, p):
    h = jax.nn.relu(x)
    h = _conv(h, p["conv1"])
    h = jax.nn.relu(h)
    h = _conv(h, p["conv2"])
    return x + h


def _resize(x, factor: float):
    B, H, W, C = x.shape
    new_h = max(1, int(round(H * factor)))
    new_w = max(1, int(round(W * factor)))
    return jax.image.resize(x, (B, new_h, new_w, C), method="bilinear")


def dpt_forward(
    params: Params,
    taps: Sequence[jax.Array],
    cfg: DPTConfig = DPTConfig(),
) -> jax.Array:
    """Decode four tapped token sequences into dense logits.

    ``taps``: four (B, 1+N, D) token tensors from encoder blocks
    ``TAP_BLOCKS`` (shallowest first).  Returns (B, H/2, W/2, num_classes)
    relative to the encoder input resolution.
    """
    if len(taps) != 4:
        raise ValueError("DPT expects exactly four feature taps")
    grid = cfg.grid_size
    scales = (4.0, 2.0, 1.0, 0.5)

    pyramid: List[jax.Array] = []
    for i, tokens in enumerate(taps):
        spatial = tokens[:, 1:, :]
        if cfg.readout == "add":
            # Broadcast-add the cls token (reference AddReadout).
            spatial = spatial + tokens[:, :1, :]
        elif cfg.readout == "project":
            # Concat cls to every spatial token, project 2D->D, GELU
            # (reference ProjectReadout).  One fat GEMM per tap: the
            # (B·N, 2D)x(2D, D) contraction keeps the MXU fed.
            readout = jnp.broadcast_to(tokens[:, :1, :], spatial.shape)
            stacked = jnp.concatenate([spatial, readout], axis=-1)
            p_ro = params["reassemble"][i]["readout_project"]
            projected = (
                stacked @ p_ro["kernel"].astype(stacked.dtype)
                + p_ro["bias"].astype(stacked.dtype)
            )
            spatial = jax.nn.gelu(projected, approximate=False)
        B, N, D = spatial.shape
        feature = spatial.reshape(B, grid, grid, D)
        feature = _conv(feature, params["reassemble"][i]["project"])
        feature = _resize(feature, scales[i])
        feature = _conv(feature, params["scratch"][i])
        pyramid.append(feature)

    # fusion: start from the deepest (coarsest) tap
    x = _residual_unit(pyramid[3], params["fusion"][3]["res2"])
    x = _resize(x, 2.0)
    x = _conv(x, params["fusion"][3]["project"])
    for i in (2, 1, 0):
        skip = _residual_unit(pyramid[i], params["fusion"][i]["res1"])
        x = x + skip
        x = _residual_unit(x, params["fusion"][i]["res2"])
        x = _resize(x, 2.0)
        x = _conv(x, params["fusion"][i]["project"])

    x = _conv(x, params["head"]["conv1"])
    x = jax.nn.relu(x)
    x = _conv(x, params["head"]["conv2"])
    return x
