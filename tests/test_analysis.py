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
    centers=None,
    parent=None,
):
    """Write a guardrail-valid metrics.json + outputs CSV pair."""
    directory.mkdir(parents=True, exist_ok=True)
    stem = f"{model}_SUNFull_s{seed}"
    rng = np.random.default_rng(seed * 7 + int(auroc * 100))
    # The test-set composition is a property of the pack, not the run: labels
    # come from a fixed rng so every synthetic run shares one composition
    # (report_core.validate_composition hard-fails otherwise).
    labels = np.random.default_rng(2024).integers(0, 2, n_frames)
    probs = np.clip(rng.normal(0.5 + (labels - 0.5) * skill * 0.3, 0.18), 0.001, 0.999)
    tau = 0.5
    preds = (probs >= tau).astype(int)

    tags = ["clean", "blur_sigma=1.5", "jpeg_q=30"]
    outputs_path = directory / f"{stem}_test_outputs.csv"
    fieldnames = [
        "frame_id", "prob", "label", "pred", "case_id",
        "origin", "center_id", "sequence_id", "morphology",
    ]
    if perturbations:
        fieldnames.append("perturbation_tag")
    with open(outputs_path, "w", newline="") as handle:
        writer = csv.DictWriter(handle, fieldnames=fieldnames)
        writer.writeheader()
        for i in range(n_frames):
            center = centers[i % len(centers)] if centers else ""
            row = {
                "frame_id": f"f{i}",
                "prob": float(probs[i]),
                "label": int(labels[i]),
                "pred": int(preds[i]),
                # PolypGen-style runs have centre ids but no case ids
                "case_id": "" if centers else f"case{i % 6}",
                "origin": "polypgen" if centers else "sun",
                "center_id": center,
                "sequence_id": "" if centers else f"case{i % 6}",
                "morphology": "flat" if i % 3 == 0 else "polypoid",
            }
            if perturbations:
                # every case sees every tag (a corruption pack perturbs the
                # same underlying frames), so tag-vs-clean case pairing works
                row["perturbation_tag"] = tags[(i // 6) % 3]
            writer.writerow(row)

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
            **(
                {
                    "parent_run": {
                        "checkpoint": "checkpoints/sun_parent.ckpt",
                        "checkpoint_sha256": "d" * 64,
                        "metrics": {"path": parent},
                    }
                }
                if parent
                else {}
            ),
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
    if exp == "exp1":
        # exp1 guardrails require verified ROC/PR curve exports
        from ssl4polyp_tpu.evaluation.exports import export_curve_sets

        curve_meta = export_curve_sets(
            directory / stem, "test",
            probabilities=probs, targets=labels, grid_points=20,
        )
        payload["curve_exports"] = {
            "test": {"path": curve_meta["path"], "sha256": curve_meta["sha256"]}
        }
    if exp == "exp5c":
        payload["test_sensitivity"] = dict(block)
    if morphology:
        payload["test_morphology"] = {
            "flat": {"recall": 0.8, "f1": 0.75, "auroc": auroc - 0.05, "balanced_accuracy": 0.8},
            "polypoid": {"recall": 0.9, "f1": 0.88, "auroc": auroc, "balanced_accuracy": 0.9},
        }
    if perturbations:
        # Declared blocks are recomputed from the tagged frames so the
        # reporter's frame-recompute cross-check holds (it hard-fails on
        # declared-vs-frames disagreement).
        from sklearn.metrics import f1_score

        def f1_of(mask):
            if not mask.any():
                return 0.0
            return float(f1_score(labels[mask], preds[mask], zero_division=0))

        per_tag, per_case = {}, {}
        idx = np.arange(n_frames)
        for ti, tag in enumerate(tags):
            mask = (idx // 6 % 3) == ti
            per_tag[tag] = {"f1": f1_of(mask), "count": int(mask.sum())}
            per_case[tag] = {
                f"case{c}": {"f1": f1_of(mask & (idx % 6 == c)), "count": 1.0}
                for c in range(6)
                if (mask & (idx % 6 == c)).any()
            }
        payload["test_perturbations"] = {"per_tag": per_tag, "per_case": per_case}
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
    # the f1 cell is the frame-recomputed per-tag mean over seeds
    from ssl4polyp_tpu.analysis.exp_reports import _retention_from_frames

    means = []
    for seed in (13, 29, 47):
        run = load_common_run(runs / f"s{seed}" / f"SslColon_SUNFull_s{seed}.metrics.json")
        tag_f1, _ = _retention_from_frames(run)
        means.append(tag_f1["blur_sigma=1.5"])
    assert f"{float(np.mean(means)):.3f}" in blur_row


def test_exp5b_retention_survives_per_case_deletion(tmp_path):
    """Retention numbers are recomputed from the tagged outputs CSV: the
    table is identical after deleting the declared per_case block
    (VERDICT item 5 done-criterion; reference exp5b requires the outputs
    CSV to exist — ``exp5b_report.py:527-529``)."""
    runs = tmp_path / "runs"
    for seed in (13, 29, 47):
        synth_run(runs / f"s{seed}", model="SslColon", seed=seed, exp="exp5b",
                  perturbations=True)
    before = run_report("exp5b", runs, tmp_path / "r1", n_resamples=50)
    section = lambda text: text[text.index("## Perturbation retention"):]
    md_before = section(before["markdown"].read_text())
    for path in runs.glob("**/*.metrics.json"):
        payload = json.loads(path.read_text())
        del payload["test_perturbations"]["per_case"]
        path.write_text(json.dumps(payload))
    after = run_report("exp5b", runs, tmp_path / "r2", n_resamples=50)
    assert section(after["markdown"].read_text()) == md_before


def test_exp5b_declared_per_tag_tamper_rejected(tmp_path):
    """A declared per-tag F1 that disagrees with the tagged frames is a
    guardrail violation, not a silent preference."""
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation as GV

    runs = tmp_path / "runs"
    for seed in (13, 29, 47):
        synth_run(runs / f"s{seed}", model="SslColon", seed=seed, exp="exp5b",
                  perturbations=True)
    path = runs / "s13" / "SslColon_SUNFull_s13.metrics.json"
    payload = json.loads(path.read_text())
    payload["test_perturbations"]["per_tag"]["blur_sigma=1.5"]["f1"] += 0.05
    path.write_text(json.dumps(payload))
    with pytest.raises(GV, match="disagrees"):
        run_report("exp5b", runs, tmp_path / "r", n_resamples=10)


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
    doctored["test_primary"]["auroc"] = max(0.0, doctored["test_primary"]["auroc"] - 0.05)
    path.write_text(json.dumps(doctored))
    with pytest.raises(GV, match="disagrees"):
        run_report("exp1", tmp_path, tmp_path / "r", check_seed_protocol=False, n_resamples=10)


def test_composition_mismatch_rejected(tmp_path):
    """Two runs evaluated on differently composed test sets cannot be
    compared (reference ``exp1_report.py:392-410``, ``exp5a_report.py:343-412``)."""
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation as GV

    synth_run(tmp_path / "a", model="SupImnet", seed=13)
    synth_run(tmp_path / "b", model="SslImnet", seed=13)
    # flip one label in run b's outputs CSV (and keep its declared block and
    # sha consistent so only the composition check can fire)
    path_b = next((tmp_path / "b").glob("*.metrics.json"))
    csv_path = next((tmp_path / "b").glob("*_test_outputs.csv"))
    rows = csv_path.read_text().splitlines()
    header = rows[0].split(",")
    li, pi, ci = header.index("label"), header.index("prob"), header.index("pred")
    cells = rows[1].split(",")
    cells[li] = "1" if cells[li] == "0" else "0"
    rows[1] = ",".join(cells)
    csv_path.write_text("\n".join(rows) + "\n")
    payload = json.loads(path_b.read_text())
    frames = [r.split(",") for r in rows[1:]]
    probs = np.asarray([float(r[pi]) for r in frames])
    labels = np.asarray([int(r[li]) for r in frames])
    payload["test_primary"] = compute_binary_metrics(probs, labels, 0.5)
    payload["provenance"]["test_outputs_csv_sha256"] = compute_file_sha256(csv_path)
    path_b.write_text(json.dumps(payload))

    with pytest.raises(GV, match="composition mismatch"):
        run_report("exp1", tmp_path, tmp_path / "r", check_seed_protocol=False, n_resamples=10)


def test_composition_declared_vs_frames(tmp_path):
    """A declared n_pos that disagrees with the frames is itself a violation."""
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation as GV
    from ssl4polyp_tpu.analysis.common import load_common_run as load_run
    from ssl4polyp_tpu.analysis.report_core import composition_of

    synth_run(tmp_path)
    path = next(tmp_path.glob("*.metrics.json"))
    run = load_run(path)
    comp = composition_of(run)
    assert comp["n_pos"] + comp["n_neg"] == comp["total"] == 60
    run.payload["test_primary"]["n_pos"] = comp["n_pos"] + 1
    with pytest.raises(GV, match="composition"):
        composition_of(run)


def test_exp1_requires_curve_exports(tmp_path):
    """exp1 hard-fails on a run missing its ROC/PR exports (reference
    ``exp1_report.py:230-263``)."""
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation as GV

    synth_run(tmp_path / "SupImnet", model="SupImnet", seed=13)
    path = next((tmp_path / "SupImnet").glob("*.metrics.json"))
    payload = json.loads(path.read_text())
    del payload["curve_exports"]
    path.write_text(json.dumps(payload))
    with pytest.raises(GV, match="curve_exports"):
        run_report("exp1", tmp_path, tmp_path / "r", check_seed_protocol=False, n_resamples=10)


def test_exp2_t_interval_ci(tmp_path):
    runs = tmp_path / "runs"
    for model, auroc, skill in (("SslImnet", 0.85, 1.2), ("SslColon", 0.91, 2.0)):
        for seed in (13, 29, 47):
            synth_run(runs / model / f"s{seed}", model=model, seed=seed,
                      auroc=auroc, exp="exp2", skill=skill)
    result = run_report("exp2", runs, tmp_path / "r", n_resamples=50)
    markdown = result["markdown"].read_text()
    assert "t 95% CI" in markdown
    # the t interval is computed over the three per-seed deltas
    from ssl4polyp_tpu.analysis.report_core import t_confidence_interval

    per_seed = result["deltas"][("SslImnet", "SslColon")]["metrics"]["auroc"]["per_seed"]
    lo, hi = t_confidence_interval(list(per_seed.values()))
    assert f"[{lo:.3f}, {hi:.3f}]" in markdown


def test_t_confidence_interval_matches_reference_constant():
    # df=2, 95% two-sided → t = 4.302652729911275 (reference _T_CRITICAL_975)
    from ssl4polyp_tpu.analysis.report_core import t_confidence_interval

    values = [0.1, 0.2, 0.3]
    lo, hi = t_confidence_interval(values)
    std = np.std(values, ddof=1)
    margin = 4.302652729911275 * std / np.sqrt(3)
    assert lo == pytest.approx(0.2 - margin, abs=1e-9)
    assert hi == pytest.approx(0.2 + margin, abs=1e-9)
    assert t_confidence_interval([0.1]) is None
    assert t_confidence_interval([0.1, 0.1]) == (0.1, 0.1)


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


def _synth_exp5a_pair(tmp_path, *, models=("SupImnet", "SslImnet", "SslColon"),
                      seeds=(13, 29, 47), centers=None):
    """SUN parent runs + exp5a PolypGen runs wired via provenance.parent_run."""
    sun_root = tmp_path / "sun"
    exp_root = tmp_path / "exp5a"
    centers = centers or [f"C{k}" for k in range(1, 7)]
    for mi, model in enumerate(models):
        for seed in seeds:
            synth_run(sun_root, model=model, seed=seed, exp="exp2",
                      auroc=0.9 + 0.01 * mi, skill=2.0)
            synth_run(
                exp_root / model, model=model, seed=seed, exp="exp5a",
                auroc=0.7 + 0.05 * mi, skill=0.8 + 0.3 * mi,
                centers=centers,
                parent=f"sun/{model}_SUNFull_s{seed}.metrics.json",
            )
    return sun_root, exp_root


def test_exp5a_domain_shift_report(tmp_path):
    """exp5a report: parent-run loading, paired SUN→PolypGen deltas with
    centre/case cluster bootstrap CIs, per-centre rows, CSV artifacts
    (reference ``exp5a_report.py:712-808,809-864,1208-1268``)."""
    import csv as _csv

    from ssl4polyp_tpu.analysis.common import load_common_run as load_run
    from ssl4polyp_tpu.analysis.exp5a_domain_shift import _suite

    _sun_root, exp_root = _synth_exp5a_pair(tmp_path)
    report_dir = tmp_path / "report"
    result = run_report("exp5a", exp_root, report_dir, n_resamples=60)
    markdown = result["markdown"].read_text()
    assert "## Domain shift (SUN-test → PolypGen-test)" in markdown
    assert "### Per-centre performance" in markdown
    assert "### Pairwise deltas on PolypGen" in markdown
    assert "### Test-set composition" in markdown
    for name in ("exp5a_performance.csv", "exp5a_domain_shift.csv",
                 "exp5a_composition.csv"):
        assert (report_dir / name).exists(), name

    # The CSV's point delta must equal the hand-computed seed-mean of
    # metric(PolypGen @ τ) − metric(SUN parent @ τ_sun).
    with open(report_dir / "exp5a_domain_shift.csv", newline="") as handle:
        rows = {(r["model"], r["metric"]): r for r in _csv.DictReader(handle)}
    for metric in ("auroc", "f1", "loss"):
        expected = []
        for seed in (13, 29, 47):
            polyp = load_run(
                exp_root / "SupImnet" / f"SupImnet_SUNFull_s{seed}.metrics.json"
            )
            sun = load_run(tmp_path / "sun" / f"SupImnet_SUNFull_s{seed}.metrics.json")
            polyp_vals = _suite(
                np.asarray([f.prob for f in polyp.frames]),
                np.asarray([f.label for f in polyp.frames]),
                polyp.primary_tau,
            )
            sun_vals = _suite(
                np.asarray([f.prob for f in sun.frames]),
                np.asarray([f.label for f in sun.frames]),
                sun.primary_tau,
            )
            expected.append(polyp_vals[metric] - sun_vals[metric])
        row = rows[("SupImnet", metric)]
        assert float(row["mean"]) == pytest.approx(float(np.mean(expected)), abs=1e-9)
        assert int(row["n"]) == 3
        assert float(row["delta_seed13"]) == pytest.approx(expected[0], abs=1e-9)
        # bootstrap CI brackets the point estimate
        assert float(row["ci_lower"]) <= float(row["mean"]) <= float(row["ci_upper"])

    # composition CSV: overall + one row per centre
    with open(report_dir / "exp5a_composition.csv", newline="") as handle:
        comp_rows = list(_csv.DictReader(handle))
    scopes = [r["scope"] for r in comp_rows]
    assert scopes.count("overall") == 1
    assert scopes.count("center") == 6
    overall = next(r for r in comp_rows if r["scope"] == "overall")
    assert int(overall["total"]) == 60


def test_exp5a_center_mismatch_excluded(tmp_path):
    """Centre coverage/count mismatches disable the bootstrap with a
    warning instead of silently mixing clusters (reference
    ``_resolve_center_alignment``, ``exp5a_report.py:809-864``)."""
    models = ("SupImnet", "SslColon")
    _sun_root, exp_root = _synth_exp5a_pair(tmp_path, models=models)
    # regenerate one model's runs with a different centre grid
    import shutil

    shutil.rmtree(exp_root / "SslColon")
    for seed in (13, 29, 47):
        synth_run(
            exp_root / "SslColon", model="SslColon", seed=seed, exp="exp5a",
            auroc=0.75, skill=1.1,
            centers=[f"C{k}" for k in range(1, 6)],
            parent=f"sun/SslColon_SUNFull_s{seed}.metrics.json",
        )
    report_dir = tmp_path / "report"
    result = run_report("exp5a", exp_root, report_dir, n_resamples=20)
    markdown = result["markdown"].read_text()
    assert "### Warnings" in markdown
    assert ("excluding from bootstrap" in markdown
            or "bootstrap disabled" in markdown)


def test_exp5a_missing_parent_warns(tmp_path):
    """Runs whose parent SUN run cannot be resolved still report PolypGen
    performance but flag the missing domain-shift payload."""
    exp_root = tmp_path / "exp5a"
    for seed in (13, 29, 47):
        synth_run(
            exp_root, model="SslColon", seed=seed, exp="exp5a",
            centers=["C1", "C2", "C3"],
            parent="sun/does_not_exist.metrics.json",
        )
    report_dir = tmp_path / "report"
    result = run_report("exp5a", exp_root, report_dir, n_resamples=10)
    markdown = result["markdown"].read_text()
    assert "no parent SUN run resolvable" in markdown
    assert (report_dir / "exp5a_performance.csv").exists()
    # domain-shift rows exist but carry no deltas
    import csv as _csv

    with open(report_dir / "exp5a_domain_shift.csv", newline="") as handle:
        rows = list(_csv.DictReader(handle))
    assert all(int(r["n"]) == 0 for r in rows)


def test_paired_bootstrap_indices_order_independent():
    """indices_for maps an already-drawn case-id multiset into each run's
    OWN index arrays — pairing must not depend on CSV row order (advisor
    finding, round 3: positional reuse silently unpaired reordered runs)."""
    import numpy as np

    from ssl4polyp_tpu.analysis.exp_reports import _Exp3Run

    base = object.__new__(_Exp3Run)
    cont = object.__new__(_Exp3Run)
    # same cases, enumerated in different row orders
    base.cases = {"a": np.array([0, 1]), "b": np.array([2]), "c": np.array([3, 4])}
    cont.cases = {"a": np.array([3, 4]), "b": np.array([0]), "c": np.array([1, 2])}

    drawn = ["c", "a", "c"]
    idx_b = base.indices_for(drawn)
    idx_c = cont.indices_for(drawn)
    np.testing.assert_array_equal(idx_b, [3, 4, 0, 1, 3, 4])
    np.testing.assert_array_equal(idx_c, [1, 2, 3, 4, 1, 2])

    # exp5a centre variant behaves identically
    from ssl4polyp_tpu.analysis.exp5a_domain_shift import Exp5aView

    view = object.__new__(Exp5aView)
    view.centers = {"c1": np.array([5]), "c2": np.array([6, 7])}
    np.testing.assert_array_equal(
        view.indices_for_centers(["c2", "c2", "c1"]), [6, 7, 6, 7, 5]
    )


def test_exp5a_view_raises_guardrail_violation():
    from ssl4polyp_tpu.analysis.exp5a_domain_shift import Exp5aView
    from ssl4polyp_tpu.analysis.guardrails import GuardrailViolation

    class FakeRun:
        frames = ()
        metrics_path = "<fake>"
        primary_tau = None

    import pytest

    with pytest.raises(GuardrailViolation):
        Exp5aView(FakeRun(), model="m", seed=13)


def test_run_blocks_rejects_unknown_mlp_fusion(rng_key):
    import jax.numpy as jnp
    import pytest

    from ssl4polyp_tpu.models import layers

    blocks = layers.init_blocks(rng_key, 1, 16, 2.0)
    x = jnp.zeros((2, 8, 16))
    with pytest.raises(ValueError, match="mlp_fusion"):
        layers.run_blocks(x, blocks, 2, mlp_fusion="ful")


def test_frame_bootstrap_pairing_survives_row_reorder():
    """paired_delta draws shared cluster KEYS and maps them into each run's
    own index groups: a row-permuted copy of the same runs must produce the
    identical bootstrap distribution, and pairing must hold (near-zero CI
    width for identical prob vectors) even when one run enumerates frames
    in a different order (review finding, round 4)."""
    from ssl4polyp_tpu.analysis.frame_bootstrap import FrameBootstrapper, FrameSample

    rng = np.random.default_rng(3)
    n = 200
    labels = rng.integers(0, 2, n)
    probs = np.clip(rng.normal(0.5 + (labels - 0.5) * 0.4, 0.2), 0, 1)
    cases = [f"c{i % 20}" for i in range(n)]

    perm = rng.permutation(n)
    samples = {
        "a": {13: FrameSample.build(probs, labels, cases, 0.5)},
        # same run, rows permuted — cluster keys identical, row order not
        "b": {13: FrameSample.build(probs[perm], labels[perm],
                                    [cases[i] for i in perm], 0.5)},
    }
    delta = FrameBootstrapper(samples, n_resamples=200).paired_delta("a", "b")
    # identical underlying run => every paired replicate's delta is exactly 0
    assert delta.mean == 0.0
    assert all(abs(s) < 1e-12 for s in delta.samples)

    # partial coverage: replicates must estimate the SAME statistic as the
    # full-sample point delta (shared clusters drawn once/paired, each run's
    # exclusive clusters resampled independently over its full population),
    # so the CI brackets its own point estimate instead of describing a
    # shared-subset delta the point never measures (review finding, round 4)
    half_idx = [i for i in range(n) if int(cases[i][1:]) < 10]
    fa_full = FrameSample.build(probs, labels, cases, 0.5)
    fb_half = FrameSample.build(probs[half_idx], labels[half_idx],
                                [cases[i] for i in half_idx], 0.5)
    samples_partial = {"a": {13: fa_full}, "b": {13: fb_half}}
    delta_partial = FrameBootstrapper(samples_partial, n_resamples=200).paired_delta(
        "a", "b"
    )
    # point estimate is the full-population delta...
    expected_point = fb_half.metric("auroc") - fa_full.metric("auroc")
    assert delta_partial.mean == pytest.approx(expected_point, abs=1e-12)
    # ...and the bootstrap CI must bracket it (the old shared-only draws
    # produced a ~0-width CI excluding this nonzero point)
    assert delta_partial.ci_lower <= expected_point <= delta_partial.ci_upper
    # every seed contributes to every replicate — none silently dropped
    assert len(delta_partial.samples) == 200


def test_bootstrap_curves_deltas_are_paired():
    """Identical series must yield EXACTLY zero delta draws at every x and
    for AULC — only a shared-draw, key-paired bootstrap guarantees that
    (independent per-series draws would give nonzero spread; review
    finding, round 4)."""
    import numpy as np

    from ssl4polyp_tpu.analysis.frame_bootstrap import (
        FrameSample,
        bootstrap_curves,
    )

    rng = np.random.default_rng(11)
    data = {}
    for name in ("a", "b"):
        per_x = {}
        for x in (10.0, 25.0, 50.0):
            per_seed = {}
            for s in (13, 29):
                labels = rng.integers(0, 2, 120)
                probs = np.clip(
                    rng.normal(0.5 + (labels - 0.5) * 0.4, 0.2), 0, 1
                )
                cases = [f"c{i % 12}" for i in range(120)]
                per_seed[s] = FrameSample.build(probs, labels, cases, 0.5)
            per_x[x] = per_seed
        data[name] = per_x
    # make series b IDENTICAL to a (same FrameSample objects)
    data["b"] = data["a"]

    result = bootstrap_curves(data, metric="auroc", n_resamples=100,
                              pairs=[("a", "b")])
    per_x = result.per_x_deltas[("a", "b")]
    for x, delta in per_x.items():
        assert delta.mean == 0.0
        assert all(s == 0.0 for s in delta.samples), x
    lo, hi = result.aulc_deltas[("a", "b")][1:]
    assert lo == 0.0 and hi == 0.0
