"""Native JPEG loader: build, correctness vs PIL, threading, fallbacks."""

import time

import numpy as np
import pytest

from ssl4polyp_tpu import native


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate([(640, 560), (224, 224), (1024, 768), (96, 128)]):
        # smooth-ish image so codec loss is small
        base = rng.integers(40, 210, (8, 8, 3), dtype=np.uint8)
        array = np.kron(base, np.ones((size[1] // 8 + 1, size[0] // 8 + 1, 1), np.uint8))
        array = array[: size[1], : size[0]]
        path = root / f"img_{i}.jpg"
        Image.fromarray(array).save(path, quality=95)
        paths.append(path)
    return paths


def test_library_builds():
    assert native.build_library() is not None
    assert native.native_available()


def test_single_decode_matches_pil(jpeg_files):
    from PIL import Image

    for path in jpeg_files:
        ours = native.decode_resize(path, 224, 224)
        assert ours is not None and ours.shape == (224, 224, 3)
        with Image.open(path) as img:
            ref = np.asarray(img.convert("RGB").resize((224, 224), Image.BILINEAR))
        # Different decode scale + resampling chain: require close agreement,
        # not bit-exactness.
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff) < 6.0, f"mean abs diff {np.mean(diff):.2f} for {path}"
        assert np.quantile(diff, 0.95) < 30


def test_exact_size_passthrough(jpeg_files):
    from PIL import Image

    path = jpeg_files[1]  # already 224x224
    ours = native.decode_resize(path, 224, 224)
    with Image.open(path) as img:
        ref = np.asarray(img.convert("RGB"))
    np.testing.assert_allclose(ours.astype(int), ref.astype(int), atol=1)


def test_batch_decode_and_threading(jpeg_files):
    paths = list(jpeg_files) * 8  # 32 decodes
    batch = native.decode_resize_batch(paths, 128, 128, n_threads=8)
    assert batch is not None and batch.shape == (32, 128, 128, 3)
    # every frame decoded (no zero-filled failures)
    assert (batch.reshape(32, -1).max(axis=1) > 0).all()
    # threaded result identical to single-threaded
    single = native.decode_resize_batch(paths, 128, 128, n_threads=1)
    np.testing.assert_array_equal(batch, single)


def test_missing_file_zero_filled(jpeg_files, tmp_path):
    paths = [jpeg_files[0], tmp_path / "nope.jpg"]
    batch = native.decode_resize_batch(paths, 64, 64, n_threads=2)
    assert batch is not None
    assert batch[0].max() > 0
    assert batch[1].max() == 0
