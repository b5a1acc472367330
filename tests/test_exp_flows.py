"""Experiment-flow integration: exp5c schedules + zero-shot, exp5b perturbations."""

import json
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.training import protocol as proto
from ssl4polyp_tpu.training.classification import build_run, run_classification_training
from tests.conftest import make_image_pack
from tests.test_classification_engine import TINY_MODEL, tiny_cfg


@pytest.fixture
def packs(tmp_path):
    root = tmp_path / "data_packs"
    root.mkdir()
    make_image_pack(root, name="sun_full", frames_per_split=16, image_size=32)
    return root


def train_parent(packs, out_dir):
    plan = proto.resolve_run_plan(tiny_cfg(), model_key="sup_imnet", seed=13)
    ctx = build_run(plan, output_dir=out_dir, pack_root=packs, model_overrides=TINY_MODEL)
    summary = run_classification_training(ctx)
    return ctx, summary


def test_exp5c_schedule_and_zero_shot(packs, tmp_path):
    out_dir = tmp_path / "out"
    ctx, parent_summary = train_parent(packs, out_dir)

    # few-shot pack with train/val/test
    fs_dir = packs / "polypgen_fewshot"
    fs_dir.mkdir()
    make_image_pack(fs_dir, name="polypgen_fewshot_s50", frames_per_split=8, image_size=32)

    cfg = tiny_cfg("polypgen_fewshot")
    cfg["dataset"] = {
        "name": "polypgen_fewshot",
        "pack_pattern": "polypgen_fewshot/polypgen_fewshot_s{size}",
        "size": 50,
        "seeds": [13],
        "splits": {"train": "train", "val": "val", "test": "test"},
    }
    del cfg["epochs"]
    cfg["protocol"] = {
        "init_from": "canonical_sun_models",
        "eval_split": "test",
        "thresholds": {"primary": "sun_val_frozen", "sensitivity": "val_opt_youden"},
        "finetune_schedule": [
            {"name": "head_warmup", "mode": "none", "epochs": 1, "head_lr": 5e-4},
            {"name": "refine", "mode": "head+1", "epochs": 1, "head_lr": 5e-4, "backbone_lr": 5e-6},
        ],
    }
    cfg["threshold_policy"] = "sun_val_frozen"
    plan = proto.resolve_run_plan(
        cfg, model_key="sup_imnet", seed=13,
        parent_checkpoint=str(ctx.layout.checkpoint_path),
    )
    assert plan.epochs == 2
    import jax

    assert plan.batch_size == 4 * jax.device_count()  # per-device few-shot cap
    ctx2 = build_run(plan, output_dir=out_dir, pack_root=packs, model_overrides=TINY_MODEL)
    summary = run_classification_training(ctx2)

    payload = json.loads(Path(summary["metrics_path"]).read_text())
    # zero-shot anchor present with the frozen SUN tau
    assert "zero_shot" in payload
    assert payload["zero_shot"]["tau"] == pytest.approx(parent_summary["tau"])
    zs_csv = Path(summary["metrics_path"]).parent / f"{summary['stem']}_zeroshot_outputs.csv"
    assert zs_csv.exists()
    # frozen primary + val_opt_youden sensitivity
    assert payload["thresholds"]["primary"]["policy"] == "sun_val_frozen"
    assert payload["thresholds"]["sensitivity"]["policy"] == "val_opt_youden"
    assert "test_sensitivity" in payload
    # lineage qualifier in the stem
    assert "from" in summary["stem"]
    assert payload["provenance"]["fewshot_budget"] == 50
    assert "parent_run" in payload["provenance"]


def test_exp5b_perturbation_eval(packs, tmp_path):
    out_dir = tmp_path / "out"
    ctx, parent_summary = train_parent(packs, out_dir)

    make_image_pack(
        packs, name="sun_test_perturbations", frames_per_split=10,
        image_size=32, variant_rows=True,
    )
    cfg = tiny_cfg("sun_test_perturbations")
    cfg["dataset"] = {
        "name": "sun_test_perturbations",
        "pack": "sun_test_perturbations",
        "splits": {"test": "test"},
    }
    cfg["protocol"] = {
        "init_from": "canonical_sun_models",
        "finetune": "none",
        "eval_split": "test",
        "thresholds": {"primary": "sun_val_frozen", "sensitivity": "sun_val_frozen"},
    }
    cfg["threshold_policy"] = "sun_val_frozen"
    plan = proto.resolve_run_plan(
        cfg, model_key="sup_imnet", seed=13,
        parent_checkpoint=str(ctx.layout.checkpoint_path),
    )
    assert plan.perturbation_splits == ["test"]
    ctx2 = build_run(plan, output_dir=out_dir, pack_root=packs, model_overrides=TINY_MODEL)
    assert ctx2.eval_only
    assert ctx2.datasets["test"].perturbations_enabled
    summary = run_classification_training(ctx2)

    payload = json.loads(Path(summary["metrics_path"]).read_text())
    assert payload["eval_only"] is True
    per_tag = payload["test_perturbations"]["per_tag"]
    assert "clean" in per_tag
    assert "ALL-perturbed" in per_tag
    # variant tags from the pack rows (blur/jpeg/bc/occ)
    assert any(t.startswith("blur") for t in per_tag)
    assert "per_case" in payload["test_perturbations"]
    assert payload["thresholds"]["primary"]["tau"] == pytest.approx(parent_summary["tau"])


def test_exp3_morphology_strata(packs, tmp_path):
    out_dir = tmp_path / "out"
    cfg = tiny_cfg()
    cfg["protocol"]["morphology_eval"] = ["flat", "polypoid"]
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    assert plan.morphology_eval == ["flat", "polypoid"]
    ctx = build_run(plan, output_dir=out_dir, pack_root=packs, model_overrides=TINY_MODEL)
    summary = run_classification_training(ctx)
    payload = json.loads(Path(summary["metrics_path"]).read_text())
    strata = payload["test_morphology"]
    assert set(strata) == {"flat", "polypoid"}
    for block in strata.values():
        assert "recall" in block and "count" in block


def test_eval_cli_threshold_pack_recompute(packs, tmp_path):
    """--threshold-pack triggers a Youden recompute when no tau is stored."""
    out_dir = tmp_path / "out"
    ctx, summary = train_parent(packs, out_dir)
    from ssl4polyp_tpu.evaluation.eval_classification import evaluate
    from ssl4polyp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    # Strip stored thresholds by re-saving the checkpoint without meta
    restored = load_checkpoint(ctx.layout.checkpoint_path)
    bare = tmp_path / "bare.ckpt"
    save_checkpoint(bare, {"params": restored["payload"]["params"]},
                    {"model_cfg": restored["meta"]["model_cfg"]})
    result = evaluate(
        bare, packs / "sun_full", batch_size=8, image_size=32,
        threshold_pack=packs / "sun_full", num_workers=1,
    )
    assert result["tau"] is not None
    assert 0.0 <= result["tau"] <= 1.0


def test_exp4_subset_percent_flow(packs, tmp_path):
    """exp4 through the engine: dataset.percent selects the sun_p{NN}
    TRAIN pack while val/test stay on the full base pack; provenance records
    the percent and the run passes exp4 guardrails (VERDICT r4 item 7)."""
    subsets = packs / "sun_subsets"
    subsets.mkdir()
    make_image_pack(subsets, name="sun_p10", frames_per_split=8, image_size=32)

    cfg = tiny_cfg("sun_subsets")
    cfg["dataset"] = {
        "name": "sun_subsets",
        "base_pack": "sun_full",
        "available_percents": [5, 10, 25, 50, 100],
        "train_pattern": "sun_subsets/sun_p{percent:02d}",
        "seeds": [13],
        "splits": {"train": "train", "val": "val", "test": "test"},
        "percent": 10,  # the --override dataset.percent=10 path
    }
    cfg["protocol"]["subset_percents"] = [5, 10, 25, 50, 100]
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    assert plan.dataset_resolved["percent"] == 10
    ctx = build_run(plan, output_dir=tmp_path / "out", pack_root=packs,
                    model_overrides=TINY_MODEL)
    # train comes from the subset pack; val/test from the base pack
    assert "sun_p10" in str(ctx.datasets["train"].provenance.get("csv_path"))
    assert "sun_full" in str(ctx.datasets["val"].provenance.get("csv_path"))
    assert "sun_full" in str(ctx.datasets["test"].provenance.get("csv_path"))
    summary = run_classification_training(ctx)

    metrics_path = Path(summary["metrics_path"])
    payload = json.loads(metrics_path.read_text())
    assert payload["provenance"]["subset_percent"] == 10.0
    assert payload["data"]["train"]["path"] == "sun_subsets/sun_p10/train"
    assert payload["data"]["val"]["path"] == "sun_full/val"
    # the stem carries the subset segment (reference run-layout
    # dataset segments, train_classification.py:3609-3701)
    assert "p10" in summary["stem"].lower()

    from ssl4polyp_tpu.analysis.guardrails import ResultLoader

    loader = ResultLoader(exp_id="exp4", strict=True)
    loader.validate(metrics_path, payload)


def test_exp2_protocol_flow(packs, tmp_path):
    """exp2 through the engine: the ssl_imnet vs ssl_colon comparison
    protocol (f1_opt primary + youden sensitivity) over one config, both
    models, artifacts passing exp2 guardrails."""
    cfg = tiny_cfg()
    cfg["models"] = [
        {"model": {"key": "ssl_imnet", "arch": "vit_b", "pretraining": "random"}},
        {"model": {"key": "ssl_colon", "arch": "vit_b", "pretraining": "random"}},
    ]
    cfg["protocol"]["comparison"] = "domain_vs_generic"
    cfg["reporting"] = {"inputs_subdir": "exp2_sun_baselines_sslcolon_vs_sslimnet"}

    from ssl4polyp_tpu.analysis.guardrails import ResultLoader

    stems = []
    for model in ("ssl_imnet", "ssl_colon"):
        plan = proto.resolve_run_plan(cfg, model_key=model, seed=13)
        assert plan.threshold_policy == "f1_opt_on_val"
        assert plan.sensitivity_threshold_policy == "youden_on_val"
        ctx = build_run(plan, output_dir=tmp_path / "out", pack_root=packs,
                        model_overrides=TINY_MODEL)
        summary = run_classification_training(ctx)
        stems.append(summary["stem"])
        metrics_path = Path(summary["metrics_path"])
        payload = json.loads(metrics_path.read_text())
        assert payload["provenance"]["model"] == model
        assert "test_sensitivity" in payload
        loader = ResultLoader(exp_id="exp2", strict=True)
        loader.validate(metrics_path, payload)
    assert stems[0] != stems[1]
