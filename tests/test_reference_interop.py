"""Wire-compat proof: the REFERENCE's own analysis stack consumes this
framework's artifacts unmodified.

VERDICT r4 item 1 (the framework's central interop promise): a full 2-model
× 3-seed exp1 run tree is produced by this repo's engine, then validated and
reported by the reference's ``ResultLoader``
(``/root/reference/src/ssl4polyp/classification/analysis/result_loader.py:159``)
and ``exp1_report`` (discover → guardrail-validate → frame recompute from our
CSVs → seed checks → paired bootstrap → markdown/CSV/manifest), imported
read-only from ``/root/reference``.  Any schema drift in metrics.json, the
outputs CSV, curve exports, or threshold records fails here first.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.training import protocol as proto
from ssl4polyp_tpu.training.classification import build_run, run_classification_training
from tests.conftest import make_image_pack
from tests.test_classification_engine import TINY_MODEL, tiny_cfg

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src" / "ssl4polyp").is_dir(),
    reason="reference tree not mounted",
)

EXPECTED_SEEDS = (13, 29, 47)
EXPECTED_MODELS = ("sup_imnet", "ssl_imnet")


@pytest.fixture(scope="module")
def ref_analysis():
    added = []
    for entry in (str(REFERENCE / "src"), str(REFERENCE)):
        if entry not in sys.path:
            sys.path.insert(0, entry)
            added.append(entry)
    try:
        from ssl4polyp.classification.analysis import exp1_report
        from ssl4polyp.classification.analysis.result_loader import ResultLoader

        yield {"exp1": exp1_report, "ResultLoader": ResultLoader}
    finally:
        for entry in added:
            if entry in sys.path:
                sys.path.remove(entry)


@pytest.fixture(scope="module")
def run_tree(tmp_path_factory):
    """A full exp1 condition grid (2 models × seed trio) from the engine."""
    root = tmp_path_factory.mktemp("interop")
    packs = root / "data_packs"
    packs.mkdir()
    make_image_pack(packs, name="sun_full", frames_per_split=12, image_size=32)
    out = root / "runs"

    cfg = tiny_cfg()
    cfg["epochs"] = 1
    cfg["models"] = [
        {"model": {"key": key, "arch": "vit_b", "pretraining": "random"}}
        for key in EXPECTED_MODELS
    ]
    for model in EXPECTED_MODELS:
        for seed in EXPECTED_SEEDS:
            plan = proto.resolve_run_plan(cfg, model_key=model, seed=seed)
            ctx = build_run(
                plan, output_dir=out, pack_root=packs, model_overrides=TINY_MODEL
            )
            run_classification_training(ctx)
    return out


def test_reference_result_loader_validates_every_artifact(run_tree, ref_analysis):
    """Every metrics.json (best AND _last) passes the reference guardrails
    verbatim, and the reference frame reader parses our outputs CSV."""
    exp1 = ref_analysis["exp1"]
    metrics_files = sorted(run_tree.rglob("*.metrics.json"))
    assert len(metrics_files) == 12  # 6 runs × {best, _last}
    for metrics_path in metrics_files:
        loader = ref_analysis["ResultLoader"](exp_id="exp1", strict=True)
        payload = json.loads(metrics_path.read_text())
        normalised = loader.validate(metrics_path, payload)
        assert "test_primary" in normalised and "thresholds" in normalised
        run = exp1.load_run(metrics_path, loader=loader)
        assert run.model in EXPECTED_MODELS
        assert run.seed in EXPECTED_SEEDS
        assert run.frames, "reference reader found no frames in our CSV"
        assert "test" in run.curves, "curve export entry did not resolve"


def test_reference_frame_recompute_matches_declared_metrics(run_tree, ref_analysis):
    """The reference recomputes test metrics from OUR per-frame CSV at OUR τ
    (its `_metrics_from_frames`); they must agree with the metrics.json
    declaration — the cross-framework semantic check, not just schema."""
    exp1 = ref_analysis["exp1"]
    for metrics_path in sorted(run_tree.rglob("*_last.metrics.json")):
        run = exp1.load_run(metrics_path)
        payload = json.loads(metrics_path.read_text())
        declared = payload["test_primary"]
        recomputed = exp1._metrics_from_frames(run.frames, run.tau_primary)
        for key in ("recall", "precision", "f1", "auroc", "balanced_accuracy"):
            if key not in recomputed or key not in declared:
                continue
            a, b = float(declared[key]), float(recomputed[key])
            if math.isnan(b):
                assert math.isnan(a), key
            else:
                assert a == pytest.approx(b, abs=1e-9), (metrics_path.name, key)


def test_reference_exp1_report_end_to_end(run_tree, ref_analysis, tmp_path):
    """discover → summarize (seed trio + composition + paired bootstrap) →
    markdown + CSV tables + manifest, all by the reference's code."""
    exp1 = ref_analysis["exp1"]
    runs, loader = exp1.discover_runs(run_tree, return_loader=True)
    assert {model: sorted(seeds) for model, seeds in runs.items()} == {
        "sup_imnet": [13, 29, 47],
        "ssl_imnet": [13, 29, 47],
    }
    summary = exp1.summarize_runs(runs, bootstrap=100, rng_seed=12345)
    assert summary.composition.n_pos + summary.composition.n_neg == 12
    # primary metric aggregates exist for both models
    for model in EXPECTED_MODELS:
        assert summary.primary_metrics[model], model
    markdown = exp1.render_markdown(summary)
    assert "SUP-ImNet" in markdown or "sup_imnet" in markdown

    report_dir = tmp_path / "report"
    report_dir.mkdir()
    csv_paths = exp1.write_csv_tables(summary, report_dir)
    assert csv_paths and all(p.exists() for p in csv_paths)
    manifest = exp1.build_manifest(
        summary,
        loader=loader,
        manifest_path=report_dir / "manifest.json",
        rng_seed=12345,
        bootstrap=100,
    )
    assert (report_dir / "manifest.json").exists()
    # build_report_manifest flattens the metadata dict into the manifest
    # (result_loader.py:773-774)
    assert manifest["experiment"] == "exp1"
    assert manifest["validated_seeds"] == list(EXPECTED_SEEDS)
    # the manifest records every validated run the loader saw
    assert len(loader.loaded_runs) == 12
    assert len(manifest["runs"]) == 12


def test_logits_pt_round_trips_reference_loader(run_tree, tmp_path):
    """`--export-outputs` artifacts: the reference loads logits.pt with plain
    torch.load (eval_outputs.py:28) — ours is written torch-free."""
    torch = pytest.importorskip("torch")
    from ssl4polyp_tpu.evaluation.eval_classification import evaluate

    checkpoint = sorted(run_tree.rglob("SupImnet_SUNFull_s13.ckpt"))[0]
    eval_dir = tmp_path / "eval"
    result = evaluate(
        checkpoint,
        run_tree.parent / "data_packs" / "sun_full",
        batch_size=6,
        image_size=32,
        output_dir=eval_dir,
        export_outputs=True,
        num_workers=1,
    )
    loaded = torch.load(eval_dir / "logits.pt", weights_only=True)
    assert isinstance(loaded, torch.Tensor)
    assert loaded.shape[0] == result["n_frames"]
    stored = np.load(eval_dir / "logits.npz")
    np.testing.assert_array_equal(loaded.numpy(), stored["logits"].astype(np.float32))
