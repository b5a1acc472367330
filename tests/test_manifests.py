"""Tests for data-pack manifest loading: hashes, counts, roots, snapshots."""

import hashlib

import pytest
import yaml

from ssl4polyp_tpu.configs import manifests


def make_pack(tmp_path, *, with_hash=True, counts=None, extra_manifest=None):
    pack = tmp_path / "pack"
    images = tmp_path / "images"
    images.mkdir(parents=True)
    pack.mkdir(parents=True)
    rows = [
        ("sun/a.jpg", "1", "case1"),
        ("sun/b.jpg", "0", "case2"),
        ("sun/c.jpg", "1", "case1"),
    ]
    for rel, _, _ in rows:
        target = images / rel.split("/", 1)[1]
        target.write_bytes(b"fakejpg")
    csv_lines = ["frame_path,label,case_id"]
    csv_lines += [",".join(r) for r in rows]
    train_csv = pack / "train.csv"
    train_csv.write_text("\n".join(csv_lines) + "\n")
    manifest = {
        "name": "tiny",
        "roots": {"sun": str(images)},
        "train": {"csv": "train.csv"},
    }
    if with_hash:
        manifest["train"]["sha256"] = hashlib.sha256(train_csv.read_bytes()).hexdigest()
    if counts:
        manifest["counts"] = counts
    if extra_manifest:
        manifest.update(extra_manifest)
    manifest_yaml = pack / "manifest.yaml"
    manifest_yaml.write_text(yaml.safe_dump(manifest))
    return pack, manifest_yaml, train_csv


def test_load_pack_roundtrip(tmp_path):
    pack, manifest_yaml, _ = make_pack(tmp_path)
    result = manifests.load_pack(manifest_yaml=manifest_yaml)
    assert set(result) == {"train"}
    paths, labels, rows = result["train"]
    assert labels == ["1", "0", "1"]
    assert all(p.exists() for p in paths)
    assert rows[0]["case_id"] == "case1"


def test_hash_mismatch_raises(tmp_path):
    pack, manifest_yaml, train_csv = make_pack(tmp_path)
    train_csv.write_text(train_csv.read_text() + "# tampered\n")
    with pytest.raises(ValueError, match="SHA256 mismatch"):
        manifests.load_pack(manifest_yaml=manifest_yaml)


def test_count_assertions(tmp_path):
    counts = {"train": {"frames": 3, "label_counts": {"pos": 2, "neg": 1}}}
    pack, manifest_yaml, _ = make_pack(tmp_path, counts=counts)
    manifests.load_pack(manifest_yaml=manifest_yaml)  # passes

    bad = {"train": {"frames": 4}}
    pack2 = tmp_path / "p2"
    pack2.mkdir()
    _, manifest_yaml2, _ = make_pack(pack2, counts=bad)
    with pytest.raises(ValueError, match="expected 4 rows"):
        manifests.load_pack(manifest_yaml=manifest_yaml2)


def test_label_count_mismatch(tmp_path):
    counts = {"train": {"frames": 3, "label_counts": {"pos": 1, "neg": 2}}}
    _, manifest_yaml, _ = make_pack(tmp_path, counts=counts)
    with pytest.raises(ValueError, match="label"):
        manifests.load_pack(manifest_yaml=manifest_yaml)


def test_eval_split_rejected(tmp_path):
    _, manifest_yaml, _ = make_pack(tmp_path, extra_manifest={"eval": {"csv": "train.csv"}})
    with pytest.raises(ValueError, match="eval"):
        manifests.load_pack(manifest_yaml=manifest_yaml)


def test_missing_file_detected(tmp_path):
    pack, manifest_yaml, _ = make_pack(tmp_path)
    manifest = yaml.safe_load(manifest_yaml.read_text())
    manifest["roots"] = {"sun": str(tmp_path / "nonexistent")}
    manifest_yaml.write_text(yaml.safe_dump(manifest))
    with pytest.raises(FileNotFoundError):
        manifests.load_pack(manifest_yaml=manifest_yaml)


def test_missing_columns(tmp_path):
    csv_path = tmp_path / "bad.csv"
    csv_path.write_text("frame_path\nx.jpg\n")
    with pytest.raises(ValueError, match="label"):
        manifests.load_split(csv_path)


def test_split_column_enforced(tmp_path):
    pack, manifest_yaml, train_csv = make_pack(
        tmp_path,
        with_hash=False,
        extra_manifest={"split_column": "split"},
    )
    train_csv.write_text(
        "frame_path,label,split\nsun/a.jpg,1,val\n"
    )
    with pytest.raises(ValueError, match="Split mismatch"):
        manifests.load_pack(manifest_yaml=manifest_yaml)


def test_store_id_root_fallback(tmp_path):
    images = tmp_path / "imgs"
    images.mkdir()
    (images / "rel").mkdir()
    (images / "rel" / "x.jpg").write_bytes(b"j")
    rows = [{"frame_path": "rel/x.jpg", "label": "1", "store_id": "mystore"}]
    paths = manifests.resolve_paths(rows, roots_map={"mystore": str(images)})
    assert paths[0].exists()


def test_snapshot_provenance(tmp_path):
    pack, manifest_yaml, train_csv = make_pack(tmp_path)
    snap = tmp_path / "snap"
    manifests.load_pack(manifest_yaml=manifest_yaml, snapshot_dir=snap)
    assert (snap / "manifest_snapshot" / "train.csv").exists()
    assert (snap / "manifest_snapshot" / "manifest.yaml").exists()
    assert (snap / "roots.json").exists()
    assert (snap / "git-commit.txt").exists()
    assert (snap / "accelerator.json").exists()


def test_canonical_label():
    assert manifests.canonical_label("pos") == "1"
    assert manifests.canonical_label("NEG") == "0"
    assert manifests.canonical_label("1.0") == "1"
    assert manifests.canonical_label(" 2 ") == "2"
    assert manifests.canonical_label("flat") == "flat"
