"""On-device augmentation ops vs independent numerical oracles.

SURVEY §7 ranks augmentation parity as the top risk: AUROC-parity needs the
JAX re-implementations to match torchvision's *semantics* (not
bit-exactness).  torchvision itself is not in this image, so each op is
checked against an independent implementation of the documented semantics:
scipy.ndimage for blur/rotation, matplotlib's colour conversions for hue,
and the documented blend formulas (ITU-R 601 luma) for the photometric ops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssl4polyp_tpu.data import augment


@pytest.fixture
def image_batch():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)


def jx(images):
    return jnp.asarray(images.astype(np.float32) / 255.0)


def luma(x):
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def test_brightness_semantics(image_batch):
    x = image_batch.astype(np.float32) / 255.0
    ours = np.asarray(augment._adjust_brightness(jx(image_batch), jnp.full((2,), 1.3)))
    np.testing.assert_allclose(ours, np.clip(x * 1.3, 0, 1), atol=1e-6)


def test_contrast_semantics(image_batch):
    # torchvision adjust_contrast: blend towards the mean of the grayscale
    x = image_batch.astype(np.float32) / 255.0
    factor = 0.7
    mean = luma(x).mean(axis=(1, 2))[:, None, None, None]
    expected = np.clip(x * factor + mean * (1 - factor), 0, 1)
    ours = np.asarray(augment._adjust_contrast(jx(image_batch), jnp.full((2,), factor)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_saturation_semantics(image_batch):
    x = image_batch.astype(np.float32) / 255.0
    factor = 1.2
    gray = luma(x)[..., None]
    expected = np.clip(x * factor + gray * (1 - factor), 0, 1)
    ours = np.asarray(augment._adjust_saturation(jx(image_batch), jnp.full((2,), factor)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_hue_matches_matplotlib(image_batch):
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    shift = 0.04
    x = image_batch.astype(np.float32) / 255.0
    hsv = rgb_to_hsv(x)
    hsv[..., 0] = (hsv[..., 0] + shift) % 1.0
    expected = hsv_to_rgb(hsv)
    ours = np.asarray(augment._adjust_hue(jx(image_batch), jnp.full((2,), shift)))
    np.testing.assert_allclose(ours, expected, atol=2e-3)


def test_hue_roundtrip_identity(image_batch):
    ours = np.asarray(augment._adjust_hue(jx(image_batch), jnp.zeros((2,))))
    np.testing.assert_allclose(ours, image_batch.astype(np.float32) / 255.0, atol=1e-5)


def test_gaussian_blur_matches_scipy(image_batch):
    from scipy import ndimage

    sigma = 1.5
    x = image_batch.astype(np.float32) / 255.0
    expected = np.stack([
        np.stack([
            ndimage.gaussian_filter(x[b, :, :, c], sigma, mode="nearest",
                                    truncate=12.0 / sigma)
            for c in range(3)
        ], axis=-1)
        for b in range(2)
    ])
    ours = np.asarray(augment._separable_blur(jx(image_batch), jnp.full((2,), sigma)))
    # interiors match closely; border handling differs slightly in the last
    # partial tap, so inset by the kernel radius
    np.testing.assert_allclose(
        ours[:, 12:-12, 12:-12], expected[:, 12:-12, 12:-12], atol=2e-3
    )


def test_blur_tiny_sigma_is_identity(image_batch):
    ours = np.asarray(augment._separable_blur(jx(image_batch), jnp.full((2,), 0.001)))
    np.testing.assert_allclose(ours, image_batch.astype(np.float32) / 255.0, atol=1e-4)


def test_rotation_matches_scipy(image_batch):
    from scipy import ndimage

    # NB: our angle convention is opposite-signed to scipy's (irrelevant to
    # the augmentation, whose angles are drawn symmetrically from ±180°).
    angle_deg = 30.0
    x = image_batch.astype(np.float32) / 255.0
    expected = np.stack([
        ndimage.rotate(
            x[b], -angle_deg, axes=(1, 0), reshape=False, order=1,
            mode="constant", cval=0.0,
        )
        for b in range(2)
    ])
    ours = np.asarray(
        augment._rotate_bilinear(jx(image_batch), jnp.full((2,), np.deg2rad(angle_deg)))
    )
    close = np.isclose(ours, expected, atol=0.05)
    assert close.mean() > 0.95, f"only {close.mean():.2%} of pixels agree"


def test_rotation_zero_identity(image_batch):
    ours = np.asarray(augment._rotate_bilinear(jx(image_batch), jnp.zeros((2,))))
    np.testing.assert_allclose(ours, image_batch.astype(np.float32) / 255.0, atol=1e-5)


def test_full_chain_statistics():
    """The complete augmented distribution stays centred on the input."""
    rng = np.random.default_rng(1)
    images = rng.integers(60, 200, (16, 32, 32, 3), dtype=np.uint8)
    out = augment.augment_batch(jnp.asarray(images), jax.random.PRNGKey(0))
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    mean = np.array(augment.IMAGENET_MEAN)
    std = np.array(augment.IMAGENET_STD)
    restored = arr * std + mean
    # rotation zero-fill lowers the mean somewhat; bounded sanity interval
    assert 0.1 < restored.mean() < 0.9
