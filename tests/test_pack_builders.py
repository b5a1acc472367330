"""Pack-builder tests: schema, sampling policies, manifest verification.

The builders regenerate the reference's shipped pack assets
(``/root/reference/data_packs/*``) from a dataset root; these tests pin the
28-column schema, the HMAC selection policies, disjointness invariants, and
that the emitted manifests round-trip through the strict pack loader with
hash verification on.
"""

from __future__ import annotations

import csv
import hashlib
import hmac
from pathlib import Path

import pytest
import yaml

from ssl4polyp_tpu.polypdb.builders import (
    FULL_COLUMNS,
    PERTURBATION_GRID,
    build_polypgen_fewshot,
    build_polypgen_pack,
    build_sun_morphology_pack,
    build_sun_pack,
    build_sun_perturbations,
    build_sun_subsets,
)
from ssl4polyp_tpu.polypdb.synth import (
    build_synthetic_polypgen_root,
    build_synthetic_sun_root,
)


def _rows(path: Path):
    with open(path, newline="", encoding="utf-8") as handle:
        reader = csv.DictReader(handle)
        return reader.fieldnames, list(reader)


@pytest.fixture(scope="module")
def sun_root(tmp_path_factory):
    return build_synthetic_sun_root(
        tmp_path_factory.mktemp("sun_root"),
        pos_cases=14, frames_per_case=10, neg_sources=3,
        frames_per_source=80, image_size=32, seed=7,
    )


@pytest.fixture(scope="module")
def sun_pack(sun_root, tmp_path_factory):
    return build_sun_pack(
        sun_root, tmp_path_factory.mktemp("packs") / "sun_full",
        seed=47, frames_per_case=8, cases_per_split=(8, 3, 3),
    )


class TestSunBuild:
    def test_schema_is_the_28_column_reference_header(self, sun_pack):
        header, rows = _rows(sun_pack / "train.csv")
        assert header == FULL_COLUMNS
        assert len(FULL_COLUMNS) == 28
        assert rows, "train split must not be empty"

    def test_case_disjointness_and_balance(self, sun_pack):
        seen = {}
        for split in ("train", "val", "test"):
            _, rows = _rows(sun_pack / f"{split}.csv")
            cases = {r["case_id"] for r in rows}
            for case in cases:
                assert case not in seen, f"case {case} leaks {seen.get(case)}->{split}"
                seen[case] = split
            pos = {r["case_id"] for r in rows if r["label"] == "1"}
            neg = cases - pos
            assert len(pos) == len(neg)
            # every case contributes exactly frames_per_case rows
            per_case = {}
            for r in rows:
                per_case[r["case_id"]] = per_case.get(r["case_id"], 0) + 1
            assert set(per_case.values()) == {8}

    def test_negative_rows_are_synthetic_chunks(self, sun_pack):
        _, rows = _rows(sun_pack / "train.csv")
        negatives = [r for r in rows if r["label"] == "0"]
        assert negatives
        for row in negatives:
            assert row["synthetic_case"] == "True"
            assert row["case_id"].startswith("NEG_SUN_case")
            assert "_v" in row["case_id"]
            assert int(row["chunk_start"]) <= int(row["frame_index"]) <= int(row["chunk_end"])
            assert row["source_case_id"] == row["case_id"].rsplit("_v", 1)[0]

    def test_negative_sources_are_split_disjoint(self, sun_pack):
        source_split = {}
        for split in ("train", "val", "test"):
            _, rows = _rows(sun_pack / f"{split}.csv")
            for row in rows:
                if row["label"] == "0":
                    previous = source_split.setdefault(row["source_case_id"], split)
                    assert previous == split

    def test_manifest_hashes_and_counts_verify(self, sun_pack):
        manifest = yaml.safe_load((sun_pack / "manifest.yaml").read_text())
        for split in ("train", "val", "test"):
            digest = hashlib.sha256((sun_pack / f"{split}.csv").read_bytes()).hexdigest()
            assert manifest["hashes"][split] == digest
            _, rows = _rows(sun_pack / f"{split}.csv")
            counts = manifest["counts"][split]
            assert counts["frames"] == len(rows)
            assert counts["pos"] == sum(1 for r in rows if r["label"] == "1")
        assert manifest["policy"]["selection"] == "hmac_sha256(case_id,seed)"
        assert manifest["frame_sampling"]["salt_id"] == "seed-47"

    def test_pack_loads_through_strict_loader(self, sun_pack, sun_root, tmp_path):
        from ssl4polyp_tpu.data.packs import create_classification_datasets

        datasets = create_classification_datasets(
            train_spec=sun_pack, val_spec=sun_pack, test_spec=sun_pack,
            roots_map={"sun": str(sun_root)},
            snapshot_dir=tmp_path / "snap",
            check_exists=True,
        )
        assert set(datasets) == {"train", "val", "test"}
        assert len(datasets["train"]) == 16 * 8  # (8 pos + 8 neg cases) x 8 frames
        assert Path(datasets["train"].paths[0]).exists()

    def test_deterministic_rebuild(self, sun_root, tmp_path):
        first = build_sun_pack(sun_root, tmp_path / "a", seed=47,
                               frames_per_case=8, cases_per_split=(8, 3, 3))
        second = build_sun_pack(sun_root, tmp_path / "b", seed=47,
                                frames_per_case=8, cases_per_split=(8, 3, 3))
        for split in ("train", "val", "test"):
            assert (first / f"{split}.csv").read_bytes() == (second / f"{split}.csv").read_bytes()


class TestSunMorphology:
    def test_splits_are_morphology_stratified(self, sun_root, tmp_path):
        pack = build_sun_morphology_pack(
            sun_root, tmp_path / "sun_morphology", seed=47,
            frames_per_case=8, cases_per_split=(8, 3, 3),
        )
        for split in ("train", "val"):
            _, rows = _rows(pack / f"{split}.csv")
            morphs = {r["morphology"] for r in rows if r["label"] == "1"}
            assert morphs == {"flat", "polypoid"}, f"{split} lost a stratum"
        manifest = yaml.safe_load((pack / "manifest.yaml").read_text())
        assert "stratify=morphology" in manifest["policy"]["balance"]


class TestSunSubsets:
    def test_canonical_nesting_and_manifests(self, sun_pack, tmp_path):
        subsets = build_sun_subsets(sun_pack, tmp_path / "sun_subsets",
                                    percents=(25, 50, 100), seed=13)
        cases = {}
        for subset in subsets:
            _, rows = _rows(subset / "train.csv")
            cases[subset.name] = {r["case_id"] for r in rows}
            manifest = yaml.safe_load((subset / "manifest.yaml").read_text())
            digest = hashlib.sha256((subset / "train.csv").read_bytes()).hexdigest()
            assert manifest["hashes"]["train"] == digest
        assert cases["sun_p25"] < cases["sun_p50"] < cases["sun_p100"]
        _, full_rows = _rows(sun_pack / "train.csv")
        assert cases["sun_p100"] == {r["case_id"] for r in full_rows}


class TestSunPerturbations:
    def test_grid_shape_and_seed_rule(self, sun_pack, tmp_path):
        grid = build_sun_perturbations(sun_pack, tmp_path / "perturb", master_seed=47)
        _, clean_rows = _rows(sun_pack / "test.csv")
        header, rows = _rows(grid / "test.csv")
        assert header == FULL_COLUMNS
        assert len(rows) == len(clean_rows) * len(PERTURBATION_GRID)
        assert len(PERTURBATION_GRID) == 16
        by_id = {}
        for row in rows:
            by_id.setdefault(row["perturbation_id"], []).append(row)
        assert set(by_id) == {str(s["id"]) for s in PERTURBATION_GRID}
        probe = by_id["blur_sigma_1p0"][0]
        expected = int.from_bytes(
            hmac.new(b"47", f"{probe['orig_frame_id']}:blur_sigma_1p0".encode(),
                     hashlib.sha256).digest()[:4], "big")
        assert int(probe["rng_seed"]) == expected
        assert probe["render_in_pipeline"] == "True"
        assert probe["blur_sigma"] == "1.0"
        clean = by_id["clean"][0]
        assert clean["blur_sigma"] == "-1.0" and clean["jpeg_q"] == "-1"

    def test_renderer_consumes_generated_rows(self, sun_pack, tmp_path):
        from ssl4polyp_tpu.data.transforms import PerRowPerturber
        import numpy as np
        from PIL import Image

        grid = build_sun_perturbations(sun_pack, tmp_path / "perturb2", master_seed=47)
        _, rows = _rows(grid / "test.csv")
        perturber = PerRowPerturber()
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        outputs = {}
        for wanted in ("clean", "blur_sigma_2p0", "occ_a0p20", "bc_b0p6_c0p6"):
            row = next(r for r in rows if r["perturbation_id"] == wanted)
            outputs[wanted] = np.asarray(perturber(Image.fromarray(frame), row))
        assert np.array_equal(outputs["clean"], frame)
        for name in ("blur_sigma_2p0", "occ_a0p20", "bc_b0p6_c0p6"):
            assert not np.array_equal(outputs[name], frame), name


@pytest.fixture(scope="module")
def polypgen_root(tmp_path_factory):
    return build_synthetic_polypgen_root(
        tmp_path_factory.mktemp("pg_root"),
        centres=3, pos_per_centre=14, neg_per_centre=4,
        sequences=5, frames_per_sequence=12, image_size=32, seed=3,
    )


@pytest.fixture(scope="module")
def polypgen_extended(polypgen_root, tmp_path_factory):
    return build_polypgen_pack(
        polypgen_root,
        tmp_path_factory.mktemp("pg_packs") / "polypgen_clean_test_extended",
        include_negative_sequences=True,
    )


class TestPolypgenBuild:
    def test_clean_pack_excludes_sequences(self, polypgen_root, tmp_path):
        pack = build_polypgen_pack(polypgen_root, tmp_path / "clean")
        _, rows = _rows(pack / "test.csv")
        assert all(not r["frame_id"].startswith("NEGSEQ.") for r in rows)
        assert {r["case_id"] for r in rows} == {"C1", "C2", "C3"}
        assert sum(1 for r in rows if r["label"] == "1") == 3 * 14
        assert sum(1 for r in rows if r["label"] == "0") == 3 * 4

    def test_extended_pack_appends_sequences(self, polypgen_extended):
        _, rows = _rows(polypgen_extended / "test.csv")
        seq_rows = [r for r in rows if r["frame_id"].startswith("NEGSEQ.")]
        assert len(seq_rows) == 5 * 12
        assert all(r["case_id"] == "None" and r["label"] == "0" for r in seq_rows)
        manifest = yaml.safe_load((polypgen_extended / "manifest.yaml").read_text())
        assert manifest["counts"]["test"]["neg"] == 3 * 4 + 5 * 12

    def test_pack_loads_through_strict_loader(self, polypgen_extended, polypgen_root):
        from ssl4polyp_tpu.configs.manifests import load_pack

        pack = load_pack(
            test=polypgen_extended / "test.csv",
            manifest_yaml=polypgen_extended / "manifest.yaml",
            roots_map={"polypgen_clean": str(polypgen_root)},
        )
        assert len(pack["test"].rows) == 3 * (14 + 4) + 5 * 12


class TestPolypgenFewshot:
    def test_budgets_and_val_fraction_rule(self, polypgen_extended, tmp_path):
        packs = build_polypgen_fewshot(
            polypgen_extended, tmp_path / "fewshot", budgets=(20, 40), seed=13,
        )
        for pack, budget in zip(packs, (20, 40)):
            manifest = yaml.safe_load((pack / "manifest.yaml").read_text())
            policy = manifest["policy"]
            assert policy["fewshot_budget_S"] == budget
            assert policy["val_fraction_target"] == 0.1  # budget < 100
            counts = manifest["counts"]
            realized = counts["train"]["frames"] + counts["val"]["frames"]
            assert realized == min(budget, realized)
            assert counts["train"]["pos"] + counts["val"]["pos"] == budget // 2

    def test_sequence_disjointness_across_splits(self, polypgen_extended, tmp_path):
        # budget 60 > 2*pool(12) forces the sequence phase
        (pack,) = build_polypgen_fewshot(
            polypgen_extended, tmp_path / "fs", budgets=(60,), seed=13,
        )
        seqs = {}
        for split in ("train", "val", "test"):
            _, rows = _rows(pack / f"{split}.csv")
            for row in rows:
                if row["frame_id"].startswith("NEGSEQ."):
                    seq = row["frame_id"].split(".")[1]
                    previous = seqs.setdefault(seq, split)
                    assert previous == split, f"sequence {seq} spans splits"

    def test_pool_first_and_sequence_cap(self, polypgen_extended, tmp_path):
        (pack,) = build_polypgen_fewshot(
            polypgen_extended, tmp_path / "fs2", budgets=(60,), seed=13,
            max_frames_per_sequence=5,
        )
        _, train_rows = _rows(pack / "train.csv")
        _, val_rows = _rows(pack / "val.csv")
        picked = [r for r in train_rows + val_rows if r["label"] == "0"]
        pool = [r for r in picked if not r["frame_id"].startswith("NEGSEQ.")]
        assert len(pool) == 3 * 4  # entire pool consumed before sequences
        per_seq = {}
        for row in picked:
            if row["frame_id"].startswith("NEGSEQ."):
                seq = row["frame_id"].split(".")[1]
                per_seq[seq] = per_seq.get(seq, 0) + 1
        assert per_seq and max(per_seq.values()) <= 5

    def test_test_split_is_complement_minus_touched_sequences(
            self, polypgen_extended, tmp_path):
        (pack,) = build_polypgen_fewshot(
            polypgen_extended, tmp_path / "fs3", budgets=(60,), seed=13,
        )
        _, parent_rows = _rows(polypgen_extended / "test.csv")
        split_ids = {}
        for split in ("train", "val", "test"):
            _, rows = _rows(pack / f"{split}.csv")
            split_ids[split] = {r["frame_id"] for r in rows}
        assert not (split_ids["train"] & split_ids["test"])
        assert not (split_ids["val"] & split_ids["test"])
        touched = {fid.split(".")[1] for fid in (split_ids["train"] | split_ids["val"])
                   if fid.startswith("NEGSEQ.")}
        for fid in {r["frame_id"] for r in parent_rows} - set().union(*split_ids.values()):
            assert fid.startswith("NEGSEQ.") and fid.split(".")[1] in touched


class TestEnginePipeline:
    def test_generated_pack_trains_with_hash_verification(self, tmp_path):
        """run_exp1-equivalent: a builder-generated sun pack drives the real
        classification engine (strict manifest/hash checks on)."""
        from ssl4polyp_tpu.training import protocol as proto
        from ssl4polyp_tpu.training.classification import (
            build_run,
            run_classification_training,
        )
        from tests.test_classification_engine import TINY_MODEL, tiny_cfg

        root = build_synthetic_sun_root(
            tmp_path / "sun_root", pos_cases=4, frames_per_case=6,
            neg_sources=3, frames_per_source=16, image_size=32, seed=5,
        )
        packs_dir = tmp_path / "data_packs"
        build_sun_pack(root, packs_dir / "sun_full", seed=47,
                       frames_per_case=4, cases_per_split=(2, 1, 1))
        cfg = tiny_cfg()
        cfg["epochs"] = 1
        plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
        ctx = build_run(plan, output_dir=tmp_path / "out", pack_root=packs_dir,
                        model_overrides=TINY_MODEL)
        summary = run_classification_training(ctx)
        metrics_path = Path(summary["metrics_path"])
        assert metrics_path.exists()
