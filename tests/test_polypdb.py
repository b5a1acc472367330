"""polypdb corruption builder tests."""

import csv
import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from ssl4polyp_tpu.polypdb.cli import check_csv_paths, main as polypdb_main
from ssl4polyp_tpu.polypdb.robustness import build_sun_test_corruptions


@pytest.fixture
def source_pack(tmp_path):
    from PIL import Image

    images = tmp_path / "images"
    (images / "frames").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        rel = f"frames/img_{i}.png"
        Image.fromarray(
            rng.integers(30, 220, (40, 40, 3), dtype=np.uint8)
        ).save(images / rel)
        rows.append({"frame_path": f"sun/{rel}", "label": str(i % 2), "case_id": f"c{i}"})
    pack = tmp_path / "pack"
    pack.mkdir()
    with open(pack / "test.csv", "w", newline="") as handle:
        writer = csv.DictWriter(handle, fieldnames=["frame_path", "label", "case_id"])
        writer.writeheader()
        writer.writerows(rows)
    return pack, {"sun": str(images)}


def test_build_corruptions(source_pack, tmp_path):
    pack, roots = source_pack
    spec = {
        "blur": {"sigma": [1.0, 2.0]},
        "jpeg": {"quality": [30]},
        "brightness": {"factor": [0.7]},
        "contrast": {"factor": [1.5]},
        "occlusion": {"area": [0.2]},
    }
    out = tmp_path / "out"
    build_sun_test_corruptions(pack, spec, roots, out)

    dirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert dirs == ["blur_1.0", "blur_2.0", "brightness_0.7", "contrast_1.5",
                    "jpeg_30", "occlusion_0.2"]
    manifest = yaml.safe_load((out / "manifest.yaml").read_text())
    assert manifest["policy"]["robustness_rng"] == 12345

    with open(out / "blur_1.0" / "test.csv") as handle:
        rows = list(csv.DictReader(handle))
    assert rows[0]["variant"] == "blur"
    assert rows[0]["severity"] == "1.0"
    # corrupted copies exist and differ from the originals
    corrupted = out / "blur_2.0" / "sun" / "frames" / "img_0.png"
    assert corrupted.exists()
    from PIL import Image

    original = np.asarray(Image.open(Path(roots["sun"]) / "frames" / "img_0.png"))
    blurred = np.asarray(Image.open(corrupted))
    assert not np.array_equal(original, blurred)


def test_occlusion_determinism(source_pack, tmp_path):
    pack, roots = source_pack
    spec = {"occlusion": {"area": [0.3]}}
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    build_sun_test_corruptions(pack, spec, roots, out_a)
    build_sun_test_corruptions(pack, spec, roots, out_b)
    from PIL import Image

    img_a = np.asarray(Image.open(out_a / "occlusion_0.3" / "sun" / "frames" / "img_1.png"))
    img_b = np.asarray(Image.open(out_b / "occlusion_0.3" / "sun" / "frames" / "img_1.png"))
    np.testing.assert_array_equal(img_a, img_b)
    assert (img_a == 0).all(axis=-1).sum() > 0  # a black box exists


def test_check_csv_paths(source_pack, tmp_path):
    pack, roots = source_pack
    assert check_csv_paths(pack / "test.csv", roots) == []
    missing = check_csv_paths(pack / "test.csv", {"sun": str(tmp_path / "nope")})
    assert len(missing) == 4


def test_cli_end_to_end(source_pack, tmp_path):
    pack, roots = source_pack
    spec_path = tmp_path / "spec.yaml"
    spec_path.write_text(yaml.safe_dump({"jpeg": {"quality": [40]}}))
    roots_path = tmp_path / "roots.json"
    roots_path.write_text(json.dumps(roots))
    out = tmp_path / "cli_out"
    polypdb_main([
        "sun", "corrupt",
        "--pack", str(pack),
        "--spec", str(spec_path),
        "--roots", str(roots_path),
        "--out", str(out),
    ])
    assert (out / "jpeg_40" / "test.csv").exists()
