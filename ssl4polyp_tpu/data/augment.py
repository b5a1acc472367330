"""On-device batched training augmentations (jit-friendly, PRNG-keyed).

Replicates the reference train-time chain
(``src/ssl4polyp/classification/data/transforms.py:233-245``)::

    ColorJitter(0.4, 0.5, 0.25, 0.01) → GaussianBlur(k=25, σ∈[0.001,2])
    → RandomHorizontalFlip → RandomVerticalFlip → RandomRotation(180)
    → Normalize(ImageNet)

as pure JAX ops over a uint8 NHWC batch, so the whole chain fuses into the
training step.  Randomness comes from an explicit PRNG key; every sample in
the batch draws independent parameters.

Known deliberate divergences from torchvision (statistical, not semantic):
the four colour-jitter sub-ops apply in a fixed order rather than a random
permutation, rotation resamples bilinearly rather than nearest-neighbour,
and the separable Gaussian blur pads with ``edge`` mode where torchvision
pads ``reflect`` (differs only in a kernel-radius border band).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .transforms import IMAGENET_MEAN, IMAGENET_STD

_BLUR_TAPS = 25  # torchvision GaussianBlur kernel_size=(25, 25)

__all__ = [
    "augment_batch",
    "normalize_batch",
    "smooth_one_hot",
    "mixup_cutmix_batch",
    "random_erasing",
]


def _grayscale(x: jax.Array) -> jax.Array:
    """ITU-R 601 luma, matching torchvision's rgb_to_grayscale."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _adjust_brightness(x: jax.Array, factor: jax.Array) -> jax.Array:
    return jnp.clip(x * factor[:, None, None, None], 0.0, 1.0)


def _adjust_contrast(x: jax.Array, factor: jax.Array) -> jax.Array:
    mean = jnp.mean(_grayscale(x), axis=(1, 2), keepdims=True)[..., None]
    f = factor[:, None, None, None]
    return jnp.clip(x * f + mean * (1.0 - f), 0.0, 1.0)


def _adjust_saturation(x: jax.Array, factor: jax.Array) -> jax.Array:
    gray = _grayscale(x)[..., None]
    f = factor[:, None, None, None]
    return jnp.clip(x * f + gray * (1.0 - f), 0.0, 1.0)


def _rgb_to_hsv(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    value = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    hue = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    hue = jnp.where(delta == 0, 0.0, hue / 6.0) % 1.0
    sat = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    return hue, sat, value


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(x: jax.Array, shift: jax.Array) -> jax.Array:
    h, s, v = _rgb_to_hsv(x)
    h = (h + shift[:, None, None]) % 1.0
    return _hsv_to_rgb(h, s, v)


def _gaussian_kernels(sigma: jax.Array, taps: int = _BLUR_TAPS) -> jax.Array:
    """(B, taps) normalised 1D gaussian kernels, one per sample."""
    half = (taps - 1) / 2.0
    positions = jnp.arange(taps, dtype=jnp.float32) - half
    logits = -0.5 * jnp.square(positions[None, :] / sigma[:, None])
    kernels = jnp.exp(logits)
    return kernels / jnp.sum(kernels, axis=1, keepdims=True)


def _separable_blur(x: jax.Array, sigma: jax.Array) -> jax.Array:
    """Depthwise separable gaussian blur with per-sample kernels.

    Expressed as ``taps`` shifted adds per axis — XLA fuses this into a tight
    vectorised loop; no per-sample conv weights needed.
    """
    taps = _BLUR_TAPS
    pad = taps // 2
    kernels = _gaussian_kernels(sigma, taps)  # (B, taps)
    B, H, W, C = x.shape

    padded = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for t in range(taps):
        out = out + kernels[:, t, None, None, None] * jax.lax.dynamic_slice_in_dim(padded, t, H, axis=1)
    padded = jnp.pad(out, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for t in range(taps):
        out = out + kernels[:, t, None, None, None] * jax.lax.dynamic_slice_in_dim(padded, t, W, axis=2)
    return out


def _rotate_bilinear(x: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate each sample by its angle (radians), zero fill outside."""
    B, H, W, C = x.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cos = jnp.cos(angle)[:, None, None]
    sin = jnp.sin(angle)[:, None, None]
    dy = (yy - cy)[None]
    dx = (xx - cx)[None]
    src_y = cos * dy - sin * dx + cy
    src_x = sin * dy + cos * dx + cx

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = x.reshape(B, H * W, C)
        idx = (yc * W + xc).reshape(B, H * W)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def normalize_batch(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC → normalised float NHWC (ImageNet statistics)."""
    x = images_u8.astype(dtype) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype=dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=dtype)
    return (x - mean) / std


@functools.partial(jax.jit, static_argnames=("dtype",))
def augment_batch(images_u8: jax.Array, key: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Full train augmentation chain on a uint8 NHWC batch."""
    B = images_u8.shape[0]
    x = images_u8.astype(jnp.float32) / 255.0
    (k_bright, k_contrast, k_sat, k_hue, k_sigma,
     k_hflip, k_vflip, k_angle) = jax.random.split(key, 8)

    x = _adjust_brightness(x, jax.random.uniform(k_bright, (B,), minval=0.6, maxval=1.4))
    x = _adjust_contrast(x, jax.random.uniform(k_contrast, (B,), minval=0.5, maxval=1.5))
    x = _adjust_saturation(x, jax.random.uniform(k_sat, (B,), minval=0.75, maxval=1.25))
    x = _adjust_hue(x, jax.random.uniform(k_hue, (B,), minval=-0.01, maxval=0.01))

    sigma = jax.random.uniform(k_sigma, (B,), minval=0.001, maxval=2.0)
    x = _separable_blur(x, sigma)

    do_h = jax.random.bernoulli(k_hflip, 0.5, (B,))
    x = jnp.where(do_h[:, None, None, None], jnp.flip(x, axis=2), x)
    do_v = jax.random.bernoulli(k_vflip, 0.5, (B,))
    x = jnp.where(do_v[:, None, None, None], jnp.flip(x, axis=1), x)

    angle = jax.random.uniform(k_angle, (B,), minval=-jnp.pi, maxval=jnp.pi)
    x = _rotate_bilinear(x, angle)

    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# Batch-level regularizers for the vendored MAE finetune path
# (reference ``models/mae/main_finetune.py:91-112`` — timm Mixup/CutMix and
# RandomErasing knobs; re-expressed as fully jittable on-device transforms:
# static shapes, iota-built box masks, ``jnp.where`` selection instead of
# data-dependent Python control flow.)
# ---------------------------------------------------------------------------

def smooth_one_hot(labels: jax.Array, num_classes: int, smoothing: float) -> jax.Array:
    """Label-smoothed one-hot targets (timm ``Mixup`` applies smoothing
    inside the label transform; reference ``main_finetune.py:87-88``)."""
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _box_mask(key: jax.Array, height: int, width: int, lam: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(mask[H,W], corrected λ): a random box with area ratio ≈ (1−λ),
    clipped at the borders (timm ``rand_bbox`` semantics)."""
    k_y, k_x = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (height * ratio).astype(jnp.int32)
    cut_w = (width * ratio).astype(jnp.int32)
    cy = jax.random.randint(k_y, (), 0, height)
    cx = jax.random.randint(k_x, (), 0, width)
    y0 = jnp.clip(cy - cut_h // 2, 0, height)
    y1 = jnp.clip(cy + cut_h // 2, 0, height)
    x0 = jnp.clip(cx - cut_w // 2, 0, width)
    x1 = jnp.clip(cx + cut_w // 2, 0, width)
    rows = jnp.arange(height)[:, None]
    cols = jnp.arange(width)[None, :]
    mask = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    corrected = 1.0 - (y1 - y0) * (x1 - x0) / float(height * width)
    return mask, corrected


def mixup_cutmix_batch(
    images: jax.Array,
    targets: jax.Array,
    key: jax.Array,
    *,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-mode Mixup/CutMix: one λ per batch, each row paired with its
    reversed-batch partner (timm ``Mixup(mode="batch")``).

    ``targets`` are soft (already one-hot/smoothed).  Rows whose partner is
    masked invalid keep their original pixels and targets — padded rows must
    not bleed into real ones (a TPU-mesh concern timm doesn't have).
    """
    if mixup_alpha <= 0.0 and cutmix_alpha <= 0.0:
        return images, targets
    k_apply, k_switch, k_lam_mix, k_lam_cut, k_box = jax.random.split(key, 5)
    b, h, w = images.shape[0], images.shape[1], images.shape[2]

    use_cutmix = (
        jax.random.bernoulli(k_switch, switch_prob)
        if (mixup_alpha > 0.0 and cutmix_alpha > 0.0)
        else jnp.asarray(cutmix_alpha > 0.0)
    )
    lam_mix = (
        jax.random.beta(k_lam_mix, mixup_alpha, mixup_alpha)
        if mixup_alpha > 0.0
        else jnp.float32(1.0)
    )
    lam_cut = (
        jax.random.beta(k_lam_cut, cutmix_alpha, cutmix_alpha)
        if cutmix_alpha > 0.0
        else jnp.float32(1.0)
    )

    flipped_images = jnp.flip(images, axis=0)
    flipped_targets = jnp.flip(targets, axis=0)

    box, lam_cut_corrected = _box_mask(k_box, int(h), int(w), lam_cut)
    cut_images = jnp.where(box[None, :, :, None], flipped_images, images)
    mix_images = lam_mix * images + (1.0 - lam_mix) * flipped_images

    lam = jnp.where(use_cutmix, lam_cut_corrected, lam_mix)
    mixed_images = jnp.where(use_cutmix, cut_images, mix_images)
    mixed_targets = lam * targets + (1.0 - lam) * flipped_targets

    apply = jax.random.bernoulli(k_apply, prob)
    out_images = jnp.where(apply, mixed_images, images)
    out_targets = jnp.where(apply, mixed_targets, targets)
    if valid is not None:
        pair_ok = (valid & jnp.flip(valid, axis=0))[:, None]
        out_targets = jnp.where(pair_ok, out_targets, targets)
        out_images = jnp.where(pair_ok[:, :, None, None] > 0, out_images, images)
    return out_images, out_targets


def random_erasing(
    images: jax.Array,
    key: jax.Array,
    *,
    prob: float = 0.25,
    scale: Tuple[float, float] = (0.02, 1.0 / 3.0),
    ratio: Tuple[float, float] = (0.3, 10.0 / 3.0),
    count: int = 1,
) -> jax.Array:
    """Per-sample RandomErasing in ``pixel`` mode: each selected image gets
    ``count`` random boxes filled with unit-normal noise (applied on the
    normalized tensor, like timm's transform; reference
    ``main_finetune.py:91-96``).  timm rejection-samples a feasible box up
    to 10 times; here the box is clipped at the borders instead — same
    distribution family, no data-dependent loop under ``jit``."""
    if prob <= 0.0 or count <= 0:
        return images
    b, h, w = images.shape[0], images.shape[1], images.shape[2]

    def erase_one(image: jax.Array, key: jax.Array) -> jax.Array:
        keys = jax.random.split(key, count + 1)
        do = jax.random.bernoulli(keys[0], prob)

        def one_box(image, kb):
            k_area, k_ratio, k_y, k_x, k_fill = jax.random.split(kb, 5)
            area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1]) * h * w
            log_r = jax.random.uniform(
                k_ratio, (), minval=math.log(ratio[0]), maxval=math.log(ratio[1])
            )
            aspect = jnp.exp(log_r)
            eh = jnp.clip(jnp.sqrt(area * aspect).astype(jnp.int32), 1, h)
            ew = jnp.clip(jnp.sqrt(area / aspect).astype(jnp.int32), 1, w)
            y0 = jax.random.randint(k_y, (), 0, h)
            x0 = jax.random.randint(k_x, (), 0, w)
            rows = jnp.arange(h)[:, None]
            cols = jnp.arange(w)[None, :]
            box = (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
            noise = jax.random.normal(k_fill, image.shape, dtype=image.dtype)
            return jnp.where(box[:, :, None], noise, image)

        erased = image
        for i in range(count):
            erased = one_box(erased, keys[i + 1])
        return jnp.where(do, erased, image)

    return jax.vmap(erase_one)(images, jax.random.split(key, b))
