"""Data-engine tests: pack indexing, loader determinism, perturbations."""

import numpy as np
import pytest

from ssl4polyp_tpu.data import (
    HostDataLoader,
    PerRowPerturber,
    create_classification_datasets,
    decode_frame,
)
from tests.conftest import make_image_pack


def test_create_datasets_roundtrip(image_pack):
    datasets = create_classification_datasets(
        train_spec=image_pack, val_spec=image_pack, test_spec=image_pack,
        image_size=32,
    )
    assert set(datasets) == {"train", "val", "test"}
    train = datasets["train"]
    assert len(train) == 8
    assert train.stage == "train"
    assert train.labels is not None and set(train.labels.tolist()) == {0, 1}
    assert train.provenance["csv_sha256"]
    assert train.meta[0]["case_id"].startswith("case_")


def test_csv_only_spec(image_pack):
    csv_path = image_pack / "test.csv"
    datasets = create_classification_datasets(test_spec=csv_path, check_exists=False)
    # roots map comes from nowhere for a bare CSV; paths resolve raw
    assert len(datasets["test"]) == 8


def test_loader_shapes_and_padding(image_pack):
    datasets = create_classification_datasets(test_spec=image_pack, image_size=32)
    loader = HostDataLoader(datasets["test"], batch_size=5, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for batch in batches:
        assert batch["image"].shape == (5, 32, 32, 3)
        assert batch["image"].dtype == np.uint8
        assert batch["label"].shape == (5,)
        assert batch["valid"].shape == (5,)
    assert batches[0]["valid"].all()
    # last batch: 3 valid, 2 padded
    assert batches[1]["valid"].sum() == 3
    assert (batches[1]["index"][3:] == -1).all()


def test_loader_epoch_determinism(image_pack):
    datasets = create_classification_datasets(train_spec=image_pack, image_size=32)
    loader = HostDataLoader(datasets["train"], batch_size=4, seed=13, num_workers=2)
    loader.set_epoch(0)
    order_a = np.concatenate([b["index"] for b in loader])
    loader.set_epoch(0)
    order_b = np.concatenate([b["index"] for b in loader])
    np.testing.assert_array_equal(order_a, order_b)
    loader.set_epoch(1)
    order_c = np.concatenate([b["index"] for b in loader])
    assert not np.array_equal(order_a, order_c)


def test_loader_process_sharding(image_pack):
    datasets = create_classification_datasets(train_spec=image_pack, image_size=32)
    seen = []
    for rank in range(2):
        loader = HostDataLoader(
            datasets["train"], batch_size=4, seed=7, num_workers=1,
            process_index=rank, process_count=2, drop_last=False,
        )
        loader.set_epoch(3)
        seen.append(np.concatenate([b["index"][b["valid"]] for b in loader]))
    union = np.concatenate(seen)
    assert len(union) == 8
    assert len(np.unique(union)) == 8


def test_drop_last_safety(image_pack):
    datasets = create_classification_datasets(train_spec=image_pack, image_size=32)
    # batch_size > dataset: drop_last must auto-disable
    loader = HostDataLoader(datasets["train"], batch_size=32, num_workers=1)
    assert loader.drop_last is False
    assert len(loader) == 1


def test_perturbations_deterministic(tmp_path):
    pack = make_image_pack(tmp_path, variant_rows=True, frames_per_split=10)
    datasets = create_classification_datasets(
        test_spec=pack, image_size=32, perturbation_splits=["test"],
    )
    index = datasets["test"]
    assert index.perturbations_enabled
    loader_a = HostDataLoader(index, batch_size=10, num_workers=2)
    loader_b = HostDataLoader(index, batch_size=10, num_workers=2)
    image_a = next(iter(loader_a))["image"]
    image_b = next(iter(loader_b))["image"]
    np.testing.assert_array_equal(image_a, image_b)


def test_perturbations_modify_pixels(tmp_path):
    pack = make_image_pack(tmp_path, variant_rows=True, frames_per_split=10)
    clean_sets = create_classification_datasets(test_spec=pack, image_size=32)
    pert_sets = create_classification_datasets(
        test_spec=pack, image_size=32, perturbation_splits=["test"],
    )
    # Force the PIL path for the clean loader so both loaders share a decode
    # chain (perturbation loaders always use PIL; the native decoder differs
    # from PIL by a few grey levels).
    clean = next(iter(HostDataLoader(
        clean_sets["test"], batch_size=10, num_workers=1, use_native=False,
    )))
    pert = next(iter(HostDataLoader(pert_sets["test"], batch_size=10, num_workers=1)))
    meta = pert_sets["test"].meta
    for i in range(10):
        variant = meta[i]["variant"]
        same = np.array_equal(clean["image"][i], pert["image"][i])
        if variant in ("", "clean"):
            assert same, f"clean frame {i} must be untouched"
        else:
            assert not same, f"variant {variant} must alter frame {i}"


def test_occlusion_uses_hmac_seed(tmp_path):
    """occ variants with rng_seed=-1 derive placement from row HMAC."""
    from PIL import Image

    rng = np.random.default_rng(0)
    array = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    img = Image.fromarray(array)
    perturber = PerRowPerturber()
    row1 = {"frame_path": "a.jpg", "variant": "occ_a0p3", "rng_seed": "-1"}
    row2 = {"frame_path": "b.jpg", "variant": "occ_a0p3", "rng_seed": "-1"}
    out1a = np.asarray(perturber(img, row1))
    out1b = np.asarray(perturber(img, row1))
    out2 = np.asarray(perturber(img, row2))
    np.testing.assert_array_equal(out1a, out1b)
    assert not np.array_equal(out1a, out2)  # different rows → different boxes


def test_augment_batch_properties(rng_key):
    import jax
    import jax.numpy as jnp

    from ssl4polyp_tpu.data.augment import augment_batch, normalize_batch

    images = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    out = augment_batch(jnp.asarray(images), rng_key)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())
    # deterministic under the same key
    out2 = augment_batch(jnp.asarray(images), rng_key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different under a different key
    out3 = augment_batch(jnp.asarray(images), jax.random.PRNGKey(99))
    assert not np.array_equal(np.asarray(out), np.asarray(out3))

    norm = normalize_batch(jnp.asarray(images))
    manual = (images.astype(np.float32) / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(np.asarray(norm), manual, rtol=1e-5, atol=1e-5)


def test_uneven_process_sharding_lockstep(image_pack):
    # 8 frames over 3 processes: every process must yield the SAME number of
    # batches (wrap-around padding, DistributedSampler contract) with the
    # padded duplicates masked valid=False so nothing is double-counted.
    datasets = create_classification_datasets(train_spec=image_pack, image_size=32)
    lengths, valid_indices = [], []
    for rank in range(3):
        loader = HostDataLoader(
            datasets["train"], batch_size=2, seed=7, num_workers=1,
            process_index=rank, process_count=3, drop_last=False,
        )
        loader.set_epoch(0)
        batches = list(loader)
        lengths.append(len(batches))
        assert len(batches) == len(loader)
        valid_indices.append(
            np.concatenate([b["index"][b["valid"]] for b in batches])
        )
    assert len(set(lengths)) == 1  # lockstep dispatch counts
    union = np.concatenate(valid_indices)
    assert len(union) == 8
    assert len(np.unique(union)) == 8


def test_corrupt_frame_marked_invalid(image_pack, tmp_path):
    datasets = create_classification_datasets(train_spec=image_pack, image_size=32)
    index = datasets["train"]
    # Corrupt one underlying file: both decode paths must flag the slot
    # valid=False instead of training on a silent black frame.
    victim = index.paths[0]
    with open(victim, "wb") as handle:
        handle.write(b"not a jpeg at all")
    for use_native in (False, True):
        loader = HostDataLoader(
            index, batch_size=8, shuffle=False, num_workers=1,
            drop_last=False, use_native=use_native,
        )
        batch = next(iter(loader))
        assert not batch["valid"][0]
        assert batch["valid"][1:].all()
