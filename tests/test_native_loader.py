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


def test_jpeg_dims(jpeg_files):
    from PIL import Image

    for path in jpeg_files:
        with Image.open(path) as img:
            assert native.jpeg_dims(path) == img.size


def test_crop_resize_matches_pil(jpeg_files):
    from PIL import Image

    for path in jpeg_files:
        out = native.decode_crop_resize(path, 64, 64, (0.1, 0.25, 0.6, 0.5))
        assert out is not None and out.shape == (64, 64, 3)
        with Image.open(path) as img:
            rgb = img.convert("RGB")
            w, h = rgb.size
            y0, x0 = int(0.1 * h + 0.5), int(0.25 * w + 0.5)
            ch, cw = int(0.6 * h + 0.5), int(0.5 * w + 0.5)
            ref = np.asarray(
                rgb.crop((x0, y0, x0 + cw, y0 + ch)).resize((64, 64), Image.BICUBIC),
                dtype=np.int16,
            )
        # DCT-scaled decode + independent cubic implementation: a few
        # intensity levels of difference, not structural divergence.
        assert np.abs(ref - out.astype(np.int16)).mean() < 4.0


def test_crop_resize_hflip(jpeg_files):
    plain = native.decode_crop_resize(jpeg_files[0], 48, 48, (0.0, 0.0, 1.0, 1.0))
    flipped = native.decode_crop_resize(
        jpeg_files[0], 48, 48, (0.0, 0.0, 1.0, 1.0), hflip=True
    )
    assert np.array_equal(flipped, plain[:, ::-1])


def test_crop_resize_batch(jpeg_files, tmp_path):
    paths = list(jpeg_files) + [tmp_path / "missing.jpg"]
    n = len(paths)
    crops = np.tile([0.0, 0.0, 1.0, 1.0], (n, 1))
    flips = np.zeros((n,), dtype=np.uint8)
    images, ok = native.decode_crop_resize_batch_status(
        paths, 32, 32, crops, flips, n_threads=4
    )
    assert images.shape == (n, 32, 32, 3)
    assert ok[:-1].all() and not ok[-1]
    assert images[-1].sum() == 0


def test_pretrain_loader_native_matches_pil(tmp_path):
    """The native PretrainLoader path yields the SAME augmentation stream
    as the PIL path (identical crop boxes/flips from the shared rng), with
    only resample-arithmetic pixel differences."""
    from PIL import Image

    from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader

    rng = np.random.default_rng(5)
    for i in range(8):
        low = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
        img = Image.fromarray(low).resize((320, 260), Image.BILINEAR)
        img.save(tmp_path / f"f{i}.jpg", quality=92)
    index = ImageFolderIndex(tmp_path, no_train_dir=True)

    def collect(use_native):
        loader = PretrainLoader(
            index, 4, image_size=64, seed=3, num_workers=2,
            use_native=use_native,
        )
        loader.set_epoch(1)
        return np.concatenate(list(loader))

    pil = collect(False)
    nat = collect(True)
    assert pil.shape == nat.shape
    # Synthetic noise images maximise the DCT-scaled-decode vs full-decode
    # aliasing difference; the bound is loose for that reason (real frames
    # measure ~1 level) and the correlation check below is the real guard.
    diff = np.abs(pil.astype(np.int16) - nat.astype(np.int16))
    assert diff.mean() < 8.0, diff.mean()
    # flips/crops identical: per-frame correlation stays near 1, which a
    # mismatched flip or crop box would destroy
    for a, b in zip(pil.reshape(pil.shape[0], -1), nat.reshape(nat.shape[0], -1)):
        corr = np.corrcoef(a.astype(np.float32), b.astype(np.float32))[0, 1]
        # a wrong flip or crop box drives corr toward 0; resample aliasing
        # on noise images costs at most a point or two
        assert corr > 0.95, corr


def test_pretrain_loader_mixed_formats(tmp_path):
    """PNG frames inside an otherwise-JPEG corpus are routed straight to
    PIL (never through the native decoder) while keeping batch row order:
    PNG rows must be BIT-identical between the native and PIL paths (both
    decode via _decode with the same per-position rng), and JPEG rows stay
    aligned (correlation check as in the all-JPEG test)."""
    from PIL import Image

    from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader

    rng = np.random.default_rng(11)
    png_names = set()
    for i in range(8):
        low = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
        img = Image.fromarray(low).resize((320, 260), Image.BILINEAR)
        if i % 3 == 1:  # files 1,4,7 are PNG
            img.save(tmp_path / f"f{i}.png")
            png_names.add(f"f{i}.png")
        else:
            img.save(tmp_path / f"f{i}.jpg", quality=92)
    index = ImageFolderIndex(tmp_path, no_train_dir=True)
    # Output row r holds index position order[r] (the loader's (seed,
    # epoch)-keyed permutation, identical across both collects below).
    order = np.random.default_rng(7 + 1).permutation(len(index))
    png_rows = [
        r for r, pos in enumerate(order)
        if index.paths[pos].rsplit("/", 1)[-1] in png_names
    ]
    assert png_rows, "fixture must include PNG frames"

    def collect(use_native):
        loader = PretrainLoader(
            index, 4, image_size=64, seed=7, num_workers=2,
            use_native=use_native,
        )
        loader.set_epoch(1)
        return np.concatenate(list(loader))

    pil = collect(False)
    nat = collect(True)
    assert pil.shape == nat.shape
    for i in png_rows:
        np.testing.assert_array_equal(pil[i], nat[i])
    for i in range(pil.shape[0]):
        a = pil[i].reshape(-1).astype(np.float32)
        b = nat[i].reshape(-1).astype(np.float32)
        assert np.corrcoef(a, b)[0, 1] > 0.95


def test_pretrain_loader_all_png_batch(tmp_path):
    """A batch with zero JPEG frames returns through the plain PIL path
    (native _native_batch yields None) and matches the PIL loader exactly."""
    from PIL import Image

    from ssl4polyp_tpu.data.folder import ImageFolderIndex, PretrainLoader

    rng = np.random.default_rng(13)
    for i in range(4):
        arr = rng.integers(0, 255, (130, 170, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"p{i}.png")
    index = ImageFolderIndex(tmp_path, no_train_dir=True)

    def collect(use_native):
        loader = PretrainLoader(
            index, 4, image_size=48, seed=9, num_workers=2,
            use_native=use_native,
        )
        loader.set_epoch(0)
        return np.concatenate(list(loader))

    np.testing.assert_array_equal(collect(False), collect(True))
