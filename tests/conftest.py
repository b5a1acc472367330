"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX must see these environment variables before first import, so they are set
here at conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers the remote-TPU (axon) backend and
# pins jax_platforms to it before conftest runs; override back to CPU so the
# suite runs on the virtual 8-device host mesh, deterministically and in fp32.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    import jax

    return jax.random.PRNGKey(0)


def make_image_pack(
    root,
    *,
    name="tinypack",
    splits=("train", "val", "test"),
    frames_per_split=8,
    image_size=64,
    variant_rows=False,
    seed=0,
):
    """Create a synthetic data pack: JPEG frames + split CSVs + manifest."""
    import csv as csv_mod

    import numpy as np
    import yaml
    from PIL import Image

    pack_dir = root / name
    images_dir = root / f"{name}_images"
    pack_dir.mkdir(parents=True, exist_ok=True)
    images_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    columns = [
        "frame_path", "label", "case_id", "frame_id", "morphology",
        "variant", "perturbation_id", "rng_seed", "render_in_pipeline",
        "blur_sigma", "jpeg_q", "brightness", "contrast", "bbox_area_frac",
    ]
    manifest = {"name": name, "roots": {"store": str(images_dir)}}
    for split in splits:
        rows = []
        for i in range(frames_per_split):
            rel = f"{split}_{i:03d}.jpg"
            array = rng.integers(0, 255, size=(image_size, image_size, 3), dtype=np.uint8)
            Image.fromarray(array).save(images_dir / rel, quality=95)
            label = i % 2
            case = f"case_{i % 4}"
            variant = ""
            if variant_rows:
                variant = ["clean", "blur_1p5", "jpeg_30", "bc_b0p7_c0p7", "occ_a0p2"][i % 5]
            rows.append({
                "frame_path": f"store/{rel}",
                "label": str(label),
                "case_id": case,
                "frame_id": f"{split}_{i}",
                "morphology": "polypoid" if label else "flat",
                "variant": variant,
                "perturbation_id": variant,
                "rng_seed": "-1",
                "render_in_pipeline": "True" if variant_rows else "False",
                "blur_sigma": "-1.0",
                "jpeg_q": "-1",
                "brightness": "-1.0",
                "contrast": "-1.0",
                "bbox_area_frac": "-1.0",
            })
        csv_path = pack_dir / f"{split}.csv"
        with open(csv_path, "w", newline="") as handle:
            writer = csv_mod.DictWriter(handle, fieldnames=columns)
            writer.writeheader()
            writer.writerows(rows)
        manifest[split] = {"csv": f"{split}.csv"}
    (pack_dir / "manifest.yaml").write_text(yaml.safe_dump(manifest))
    return pack_dir


@pytest.fixture
def image_pack(tmp_path):
    return make_image_pack(tmp_path)
