"""Analysis layer tests: guardrails, bootstrap, seed checks, reports."""

import csv
import json
import math
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.analysis import (
    Bootstrapper,
    GuardrailViolation,
    ResultLoader,
    SeedCheckError,
    compute_binary_metrics,
    ensure_expected_seeds,
    load_common_run,
)
from ssl4polyp_tpu.analysis.exp_reports import run_report
from ssl4polyp_tpu.analysis.guardrails import compute_file_sha256


def synth_run(
    directory: Path,
    *,
    model="SupImnet",
    seed=13,
    auroc=0.9,
    exp="exp1",
    n_frames=60,
    subset_percent=100.0,
    fewshot_budget=None,
    perturbations=False,
    morphology=False,
    zero_shot=False,
    skill=2.0,
):
    """Write a guardrail-valid metrics.json + outputs CSV pair."""
    directory.mkdir(parents=True, exist_ok=True)
    stem = f"{model}_SUNFull_s{seed}"
    rng = np.random.default_rng(seed * 7 + int(auroc * 100))
    labels = rng.integers(0, 2, n_frames)
    probs = np.clip(rng.normal(0.5 + (labels - 0.5) * skill * 0.3, 0.18), 0.001, 0.999)
    tau = 0.5
    preds = (probs >= tau).astype(int)

    outputs_path = directory / f"{stem}_test_outputs.csv"
    with open(outputs_path, "w", newline="") as handle:
        writer = csv.DictWriter(handle, fieldnames=[
            "frame_id", "prob", "label", "pred", "case_id",
            "origin", "center_id", "sequence_id", "morphology",
        ])
        writer.writeheader()
        for i in range(n_frames):
            writer.writerow({
                "frame_id": f"f{i}",
                "prob": float(probs[i]),
                "label": int(labels[i]),
                "pred": int(preds[i]),
                "case_id": f"case{i % 6}",
                "origin": "sun",
                "center_id": "",
                "sequence_id": f"case{i % 6}",
                "morphology": "flat" if i % 3 == 0 else "polypoid",
            })

    # The declared block must agree with the frames — reporters now recompute
    # and audit it (report_core.recompute_primary_metrics); `auroc`/`skill`
    # steer the generator rather than pinning the stored number.
    block = compute_binary_metrics(probs, labels, tau)
    thresholds = {
        "primary": {
            "policy": "f1_opt_on_val", "tau": tau, "split": "sun_full/val", "epoch": 3,
        },
        "sensitivity": {
            "policy": "youden_on_val", "tau": tau, "split": "sun_full/val", "epoch": 3,
        },
        "policy": "f1_opt_on_val",
    }
    if exp in ("exp5a", "exp5b", "exp5c"):
        thresholds["primary"] = {
            "policy": "sun_val_frozen", "tau": tau, "source_split": "sun_full/val",
            "notes": {
                "source_checkpoint": "checkpoints/sun_parent.ckpt",
                "source_checkpoint_sha256": "d" * 64,
                "source_policy": "f1_opt_on_val",
                "source_split_path": "sun_full/val",
            },
        }
        thresholds["policy"] = "sun_val_frozen"
        if exp == "exp5c":
            thresholds["sensitivity"] = {
                "policy": "val_opt_youden", "tau": tau, "split": "sun_full/val", "epoch": 3,
            }
        else:
            thresholds.pop("sensitivity")

    payload = {
        "seed": seed,
        "epoch": 5,
        "run": {"model": model, "seed": seed, "mode": "train"},
        "provenance": {
            "model": model,
            "train_seed": seed,
            "subset_percent": subset_percent,
            "test_outputs_csv": outputs_path.name,
            "test_outputs_csv_sha256": compute_file_sha256(outputs_path),
            **({"fewshot_budget": fewshot_budget} if fewshot_budget else {}),
        },
        "data": {
            "train": {"path": "sun_full/train", "sha256": "a" * 64},
            "val": {"path": "sun_full/val", "sha256": "b" * 64},
            "test": {"path": "sun_full/test", "sha256": "c" * 64},
        },
        "val": {"loss": 0.4, "auroc": auroc - 0.01},
        "test_primary": block,
        "thresholds": thresholds,
    }
    if exp == "exp1" or exp == "exp2" or exp == "exp4":
        payload["test_sensitivity"] = dict(block)
    if exp == "exp5c":
        payload["test_sensitivity"] = dict(block)
    if morphology:
        payload["test_morphology"] = {
            "flat": {"recall": 0.8, "f1": 0.75, "auroc": auroc - 0.05, "balanced_accuracy": 0.8},
            "polypoid": {"recall": 0.9, "f1": 0.88, "auroc": auroc, "balanced_accuracy": 0.9},
        }
    if perturbations:
        cases = [f"case{i}" for i in range(6)]
        rng_p = np.random.default_rng(seed)

        def per_case(center):
            return {
                c: {"f1": float(np.clip(rng_p.normal(center, 0.05), 0, 1)), "count": 4.0}
                for c in cases
            }

        payload["test_perturbations"] = {
            "per_tag": {
                "clean": {"f1": 0.9, "count": 24},
                "blur_sigma=1.5": {"f1": 0.7, "count": 24},
                "jpeg_q=30": {"f1": 0.8, "count": 24},
            },
            "per_case": {
                "clean": per_case(0.9),
                "blur_sigma=1.5": per_case(0.7),
                "jpeg_q=30": per_case(0.8),
            },
        }
    if zero_shot:
        zs_probs = np.clip(rng.normal(0.5 + (labels - 0.5) * 0.2, 0.2), 0.001, 0.999)
        zs_path = directory / f"{stem}_zeroshot_outputs.csv"
        with open(zs_path, "w", newline="") as handle:
            writer = csv.DictWriter(handle, fieldnames=["frame_id", "prob", "label", "case_id"])
            writer.writeheader()
            for i in range(n_frames):
                writer.writerow({
                    "frame_id": f"f{i}", "prob": float(zs_probs[i]),
                    "label": int(labels[i]), "case_id": f"case{i % 6}",
                })
        payload["zero_shot"] = {
            "tau": tau,
            "metrics": {"auroc": auroc - 0.1},
            "outputs_csv": zs_path.name,
        }
    (directory / f"{stem}.metrics.json").write_text(json.dumps(payload, indent=2))
    return payload


def test_guardrails_accept_valid(tmp_path):
    payload = synth_run(tmp_path)
    loader = ResultLoader("exp1")
    result = loader.load(next(tmp_path.glob("*.metrics.json")))
    assert 0.5 < result.primary_metrics["auroc"] <= 1.0
    assert loader.loaded_runs[0]["model"] == "SupImnet"


def test_guardrails_reject_confusion_mismatch(tmp_path):
    payload = synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    broken = json.loads(path.read_text())
    broken["test_primary"]["tp"] += 5
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="confusion totals"):
        ResultLoader("exp1").load(path)


def test_guardrails_reject_wrong_policy(tmp_path):
    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    broken = json.loads(path.read_text())
    broken["thresholds"]["primary"]["policy"] = "youden_on_val"
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="policy"):
        ResultLoader("exp1").load(path)


def test_guardrails_reject_missing_blocks(tmp_path):
    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    broken = json.loads(path.read_text())
    del broken["val"]
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="missing block 'val'"):
        ResultLoader("exp1").load(path)


def test_guardrails_split_binding(tmp_path):
    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    broken = json.loads(path.read_text())
    broken["thresholds"]["primary"]["split"] = "other/val"
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="split"):
        ResultLoader("exp1").load(path)


def test_guardrails_rehash_outputs_csv(tmp_path):
    """Declared outputs-CSV sha256 is verified against the file on disk.

    The reference authored this check (``result_loader.py:558``) but shipped it
    disabled (``:189``); here tampering with the CSV after the run is caught.
    """
    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    csv_path = next(tmp_path.glob("*_test_outputs.csv"))
    with open(csv_path, "a") as handle:
        handle.write("tampered,0.5,1,1,case0,sun,,case0,flat\n")
    with pytest.raises(GuardrailViolation, match="sha256 mismatch"):
        ResultLoader("exp1").load(path)


def test_guardrails_missing_outputs_csv(tmp_path):
    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    next(tmp_path.glob("*_test_outputs.csv")).unlink()
    with pytest.raises(GuardrailViolation, match="missing on disk"):
        ResultLoader("exp1").load(path)
    # opt-out mirrors the reference's (dormant) behaviour
    ResultLoader("exp1", enforce_csv_hashes=False).load(path)


def test_guardrails_cross_run_digest_registry(tmp_path):
    """The same dataset path must hash identically across every loaded run."""
    synth_run(tmp_path / "a", seed=13)
    synth_run(tmp_path / "b", seed=29)
    path_b = next((tmp_path / "b").glob("*.metrics.json"))
    broken = json.loads(path_b.read_text())
    broken["data"]["test"]["sha256"] = "e" * 64
    path_b.write_text(json.dumps(broken))
    loader = ResultLoader("exp1")
    loader.load(next((tmp_path / "a").glob("*.metrics.json")))
    with pytest.raises(GuardrailViolation, match="dataset digest mismatch"):
        loader.load(path_b)


def test_guardrails_frozen_source_checkpoint(tmp_path):
    """Frozen-τ records must carry auditable checkpoint provenance."""
    synth_run(tmp_path, exp="exp5a")
    path = next(tmp_path.glob("*.metrics.json"))
    valid = json.loads(path.read_text())
    ResultLoader("exp5a").load(path)

    broken = json.loads(json.dumps(valid))
    del broken["thresholds"]["primary"]["notes"]["source_checkpoint"]
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="source_checkpoint is required"):
        ResultLoader("exp5a").load(path)

    broken = json.loads(json.dumps(valid))
    broken["thresholds"]["primary"]["notes"]["source_split_path"] = "polypgen/val"
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="does not contain"):
        ResultLoader("exp5a").load(path)

    broken = json.loads(json.dumps(valid))
    broken["thresholds"]["primary"]["notes"]["source_checkpoint_sha256"] = "nothex"
    path.write_text(json.dumps(broken))
    with pytest.raises(GuardrailViolation, match="64-hex"):
        ResultLoader("exp5a").load(path)


def test_common_run_loading(tmp_path):
    synth_run(tmp_path, n_frames=30)
    run = load_common_run(next(tmp_path.glob("*.metrics.json")), require_outputs=True)
    assert len(run.frames) == 30
    assert run.seed == 13
    assert run.primary_tau == 0.5
    assert run.model == "SupImnet"


def test_bootstrapper_deterministic_and_signed():
    rng = np.random.default_rng(0)
    low = {13: rng.normal(0.7, 0.05, 100), 29: rng.normal(0.7, 0.05, 100)}
    high = {13: low[13] + 0.1, 29: low[29] + 0.1}
    cases = {13: [f"c{i % 10}" for i in range(100)], 29: [f"c{i % 10}" for i in range(100)]}
    metrics = {"A": low, "B": high}
    clusters = {"A": cases, "B": cases}
    r1 = Bootstrapper(metrics, clusters=clusters, n_resamples=200).paired_delta("A", "B")
    r2 = Bootstrapper(metrics, clusters=clusters, n_resamples=200).paired_delta("A", "B")
    assert r1.mean == pytest.approx(0.1, abs=1e-9)
    assert r1.samples == r2.samples  # seeded rng 1337 → identical draws
    assert r1.ci_lower > 0.09 and r1.ci_upper < 0.11


def test_seed_checks():
    good = {"m": {13: 1, 29: 1, 47: 1}}
    ensure_expected_seeds(good)
    with pytest.raises(SeedCheckError, match="missing seeds"):
        ensure_expected_seeds({"m": {13: 1}})
    with pytest.raises(SeedCheckError, match="unexpected"):
        ensure_expected_seeds({"m": {13: 1, 29: 1, 47: 1, 99: 1}})


def test_exp1_report_end_to_end(tmp_path):
    runs = tmp_path / "runs"
    for model, auroc in (("SupImnet", 0.85), ("SslImnet", 0.91)):
        for seed in (13, 29, 47):
            synth_run(runs / model / f"seed{seed}", model=model, seed=seed,
                      auroc=auroc, skill=2.0 if model == "SslImnet" else 1.2)
    out = tmp_path / "report"
    result = run_report("exp1", runs, out, n_resamples=100)
    markdown = result["markdown"].read_text()
    assert "SupImnet" in markdown and "SslImnet" in markdown
    # aggregates are now recomputed from the outputs CSVs; the higher-skill
    # generator must come out ahead
    assert (
        result["aggregates"]["SslImnet"]["auroc"]["mean"]
        > result["aggregates"]["SupImnet"]["auroc"]["mean"]
    )
    assert ("SupImnet", "SslImnet") in result["deltas"]
    deltas = result["deltas"][("SupImnet", "SslImnet")]["metrics"]
    assert deltas["auroc"]["mean"] > 0  # true AUROC delta, not a proxy
    assert deltas["auroc"]["ci_lower"] is not None
    assert "f1" in deltas
    manifest = json.loads(result["manifest"].read_text())
    assert manifest["n_runs"] == 6


def test_exp1_report_seed_enforcement(tmp_path):
    runs = tmp_path / "runs"
    synth_run(runs, model="SupImnet", seed=13)
    with pytest.raises(SeedCheckError):
        run_report("exp1", runs, tmp_path / "r", n_resamples=10)


def test_exp4_learning_curve(tmp_path):
    runs = tmp_path / "runs"
    for percent, auroc in ((10, 0.8), (50, 0.88), (100, 0.92)):
        for seed in (13, 29, 47):
            synth_run(
                runs / f"p{percent}" / f"s{seed}", model="SslColon", seed=seed,
                auroc=auroc, exp="exp4", subset_percent=float(percent),
            )
    for percent, auroc in ((10, 0.75), (50, 0.85), (100, 0.9)):
        for seed in (13, 29, 47):
            synth_run(
                runs / "sup" / f"p{percent}" / f"s{seed}", model="SupImnet", seed=seed,
                auroc=auroc, exp="exp4", subset_percent=float(percent), skill=1.2,
            )
    result = run_report("exp4", runs, tmp_path / "r", n_resamples=20)
    markdown = result["markdown"].read_text()
    assert "Learning curves" in markdown
    assert "AULC [95% CI]" in markdown  # AULC carries a bootstrap CI
    assert "Pairwise deltas by percent" in markdown
    assert "AULC deltas" in markdown
    assert "SslColon@p10" in result["aggregates"]
    # curve points carry CI brackets
    assert markdown.count("[") > 10


def test_exp5b_retention(tmp_path):
    runs = tmp_path / "runs"
    for seed in (13, 29, 47):
        synth_run(
            runs / f"s{seed}", model="SslColon", seed=seed, exp="exp5b",
            perturbations=True,
        )
    result = run_report("exp5b", runs, tmp_path / "r", n_resamples=50)
    markdown = result["markdown"].read_text()
    assert "Perturbation retention" in markdown
    assert "blur_sigma=1.5" in markdown
    # per-severity axis and paired case-level CI vs clean
    assert "| blur_sigma | 1.500 |" in markdown
    blur_row = next(l for l in markdown.splitlines() if "blur_sigma=1.5" in l)
    assert "[" in blur_row and "]" in blur_row  # bootstrap CI rendered
    assert "-0.2" in blur_row  # ~0.7 − 0.9 per-case delta


def test_exp5c_zero_shot_anchor(tmp_path):
    runs = tmp_path / "runs"
    for seed in (13, 29, 47):
        synth_run(
            runs / f"s{seed}", model="SslColon", seed=seed, exp="exp5c",
            fewshot_budget=50, zero_shot=True,
        )
    result = run_report("exp5c", runs, tmp_path / "r", n_resamples=20)
    markdown = result["markdown"].read_text()
    assert "Zero-shot anchor" in markdown
    assert "SslColon@s50" in result["aggregates"]
    # the zero-shot anchor is a curve point at budget 0 next to s50
    assert "Few-shot curves" in markdown
    curve_header = next(l for l in markdown.splitlines() if l.startswith("| model |"))
    assert "s0" in curve_header and "s50" in curve_header


def test_report_audit_rejects_tampered_primary(tmp_path):
    """Aggregation recomputes from frames and rejects a doctored block."""
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation as GV

    synth_run(tmp_path / "SupImnet" / "s13", model="SupImnet", seed=13)
    path = next((tmp_path / "SupImnet" / "s13").glob("*.metrics.json"))
    doctored = json.loads(path.read_text())
    doctored["test_primary"]["auroc"] = min(1.0, doctored["test_primary"]["auroc"] + 0.05)
    path.write_text(json.dumps(doctored))
    with pytest.raises(GV, match="disagrees"):
        run_report("exp1", tmp_path, tmp_path / "r", check_seed_protocol=False, n_resamples=10)


def test_frame_bootstrap_true_auroc():
    """FrameBootstrapper recomputes rank AUROC per replicate."""
    from sklearn.metrics import roc_auc_score

    from ssl4polyp_tpu.analysis.frame_bootstrap import FrameBootstrapper, FrameSample

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 400)
    weak = np.clip(rng.normal(0.5 + (labels - 0.5) * 0.2, 0.25), 0, 1)
    strong = np.clip(rng.normal(0.5 + (labels - 0.5) * 0.6, 0.25), 0, 1)
    cases = [f"c{i % 40}" for i in range(400)]
    samples = {
        "weak": {13: FrameSample.build(weak, labels, cases, 0.5)},
        "strong": {13: FrameSample.build(strong, labels, cases, 0.5)},
    }
    boot = FrameBootstrapper(samples, n_resamples=300)
    # full-sample metric matches sklearn exactly
    assert samples["weak"][13].metric("auroc") == pytest.approx(
        roc_auc_score(labels, weak), abs=1e-12
    )
    delta = boot.paired_delta("weak", "strong", metric="auroc")
    expected = roc_auc_score(labels, strong) - roc_auc_score(labels, weak)
    assert delta.mean == pytest.approx(expected, abs=1e-12)
    assert delta.ci_lower > 0  # clearly separated
    # determinism
    delta2 = FrameBootstrapper(samples, n_resamples=300).paired_delta(
        "weak", "strong", metric="auroc"
    )
    assert delta.samples == delta2.samples
