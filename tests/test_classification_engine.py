"""End-to-end fine-tune engine smoke tests on the 8-device CPU mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.training import protocol as proto
from ssl4polyp_tpu.training.classification import build_run, run_classification_training
from tests.conftest import make_image_pack

TINY_MODEL = {
    "embed_dim": 32,
    "depth": 2,
    "num_heads": 2,
    "patch_size": 8,
}


def tiny_cfg(pack_name="sun_full", **extra):
    cfg = {
        "lr": 1e-3,
        "weight_decay": 0.05,
        "batch_size": 8,
        "epochs": 2,
        "seeds": [13],
        "image_size": 32,
        "num_workers": 2,
        "log_interval": 1,
        "amp": False,
        "scheduler": {"name": "cosine", "warmup_epochs": 1},
        "early_stop": {"monitor": "val_loss", "patience": 8, "min_delta": 1e-4, "min_epochs": 1},
        "dataset": {
            "name": pack_name,
            "pack": pack_name,
            "splits": {"train": "train", "val": "val", "test": "test"},
        },
        "models": [{"model": {"key": "sup_imnet", "arch": "vit_b", "pretraining": "random"}}],
        "protocol": {
            "finetune": "full",
            "thresholds": {"primary": "f1_opt_on_val", "sensitivity": "youden_on_val"},
            "export_curves": {"splits": ["test"], "points": 50},
        },
        "threshold_policy": "f1_opt_on_val",
    }
    cfg.update(extra)
    return cfg


@pytest.fixture
def sun_pack(tmp_path):
    packs_dir = tmp_path / "data_packs"
    packs_dir.mkdir()
    make_image_pack(packs_dir, name="sun_full", frames_per_split=16, image_size=32)
    return packs_dir


def run_tiny(cfg, packs_dir, out_dir, **kwargs):
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    ctx = build_run(
        plan,
        output_dir=out_dir,
        pack_root=packs_dir,
        model_overrides=TINY_MODEL,
        exp_config_name="exp/test_exp.yaml",
        **kwargs,
    )
    return ctx, run_classification_training(ctx, thresholds_root=Path(out_dir) / "thresholds")


def test_full_finetune_run(sun_pack, tmp_path):
    out_dir = tmp_path / "out"
    ctx, summary = run_tiny(tiny_cfg(), sun_pack, out_dir)

    assert summary["epochs_run"] == 2
    assert summary["tau"] is not None

    run_dir = ctx.layout.output_dir
    stem = ctx.layout.stem
    assert stem == "SupImnet_SUNFull_s13"
    assert (run_dir / f"{stem}.metrics.json").exists()
    assert (run_dir / f"{stem}_test_outputs.csv").exists()
    assert (run_dir / f"{stem}.ckpt").exists()  # best pointer
    assert (run_dir / f"{stem}_last.ckpt").exists()
    assert (run_dir / f"{stem}_test_roc_curve.csv").exists()
    assert (run_dir / f"{stem}_test_pr_curve.csv").exists()

    payload = json.loads((run_dir / f"{stem}.metrics.json").read_text())
    # ResultLoader-required blocks
    for block in ("thresholds", "data", "test_primary", "val", "run", "provenance"):
        assert block in payload, f"missing {block}"
    assert payload["data"]["val"]["path"] == "sun_full/val"
    assert payload["thresholds"]["primary"]["policy"] == "f1_opt_on_val"
    assert payload["thresholds"]["primary"]["split"] == "sun_full/val"
    assert payload["thresholds"]["sensitivity"]["policy"] == "youden_on_val"
    assert "test_sensitivity" in payload
    tp = payload["test_primary"]
    assert tp["tp"] + tp["fp"] + tp["tn"] + tp["fn"] == tp["n_pos"] + tp["n_neg"]
    assert payload["curve_exports"]["test"]["path"].endswith("_roc_curve.csv")

    # outputs CSV schema
    header = (run_dir / f"{stem}_test_outputs.csv").read_text().splitlines()[0]
    assert header == "frame_id,prob,label,pred,case_id,origin,center_id,sequence_id,morphology"

    # thresholds persisted canonically
    stores = list((out_dir / "thresholds").rglob("policy-*.json"))
    assert stores, "no canonical threshold file written"


def test_frozen_tau_eval_only(sun_pack, tmp_path):
    out_dir = tmp_path / "out"
    # 1) parent run on SUN
    ctx, summary = run_tiny(tiny_cfg(), sun_pack, out_dir)
    parent_ckpt = ctx.layout.checkpoint_path

    # 2) exp5a-style eval-only on a test-only pack with frozen SUN tau
    make_image_pack(sun_pack, name="polypgen_clean_test", frames_per_split=12, image_size=32)
    cfg = tiny_cfg("polypgen_clean_test")
    cfg["dataset"]["splits"] = {"test": "test"}
    cfg["protocol"] = {
        "finetune": "none",
        "init_from": "canonical_sun_models",
        "thresholds": {"primary": "sun_val_frozen"},
    }
    cfg["threshold_policy"] = "sun_val_frozen"
    plan = proto.resolve_run_plan(
        cfg, model_key="sup_imnet", seed=13, parent_checkpoint=str(parent_ckpt)
    )
    assert plan.is_exp5a
    ctx2 = build_run(
        plan, output_dir=out_dir, pack_root=sun_pack, model_overrides=TINY_MODEL
    )
    assert ctx2.eval_only
    summary2 = run_classification_training(ctx2)

    payload = json.loads(Path(summary2["metrics_path"]).read_text())
    assert payload["eval_only"] is True
    assert payload["thresholds"]["primary"]["policy"] == "sun_val_frozen"
    assert payload["thresholds"]["primary"]["source_split"] == "sun_full/val"
    # frozen tau equals the parent's primary tau
    assert payload["thresholds"]["primary"]["tau"] == pytest.approx(summary["tau"])
    assert "test_primary" in payload
    assert "val" not in payload
    # parent provenance recorded
    assert "parent_run" in payload["provenance"]
    # polypgen CSV layout
    run_dir = Path(summary2["metrics_path"]).parent
    stem2 = summary2["stem"]
    header = (run_dir / f"{stem2}_test_outputs.csv").read_text().splitlines()[0]
    assert header == "frame_id,prob,label,pred,origin,center_id,sequence_id"


def test_head_only_freeze_keeps_backbone(sun_pack, tmp_path):
    cfg = tiny_cfg()
    cfg["protocol"]["finetune"] = "none"
    cfg["epochs"] = 1
    out_dir = tmp_path / "out"
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    ctx = build_run(plan, output_dir=out_dir, pack_root=sun_pack, model_overrides=TINY_MODEL)
    before = np.asarray(ctx.params["patch_embed"]["kernel"]).copy()
    head_before = np.asarray(ctx.params["head"]["kernel"]).copy()
    summary = run_classification_training(ctx)
    from ssl4polyp_tpu.utils.checkpoint import load_checkpoint

    restored = load_checkpoint(ctx.layout.checkpoint_path)
    after = restored["payload"]["params"]
    np.testing.assert_array_equal(np.asarray(after["patch_embed"]["kernel"]), before)
    assert not np.array_equal(np.asarray(after["head"]["kernel"]), head_before)


def test_resume_continues_training(sun_pack, tmp_path):
    """A second invocation with resume=True picks up at the next epoch."""
    out_dir = tmp_path / "out"
    cfg = tiny_cfg()
    cfg["epochs"] = 1
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    ctx = build_run(plan, output_dir=out_dir, pack_root=sun_pack, model_overrides=TINY_MODEL)
    first = run_classification_training(ctx)
    assert first["epochs_run"] == 1

    cfg2 = tiny_cfg()
    cfg2["epochs"] = 2
    plan2 = proto.resolve_run_plan(cfg2, model_key="sup_imnet", seed=13)
    ctx2 = build_run(plan2, output_dir=out_dir, pack_root=sun_pack, model_overrides=TINY_MODEL)
    second = run_classification_training(ctx2, resume=True)
    # only epoch 1 ran in the second invocation
    log_text = (ctx2.layout.output_dir / f"{ctx2.layout.stem}.log").read_text()
    assert "resumed from" in log_text
    assert second["epochs_run"] == 2  # epoch counter reaches the plan total


def test_steps_per_call_fusion_identical(sun_pack, tmp_path):
    """steps_per_call=2 runs the same math as sequential dispatches — same
    per-step keys, lrs, batches (classification.make_train_step).  XLA
    compiles the scanned body with its own fusion choices, so floats match
    to fp32 round-off, while decisions (tau, AUROC) must be identical."""
    ctx1, summary1 = run_tiny(
        tiny_cfg(epochs=1), sun_pack, tmp_path / "a",
    )
    cfg2 = tiny_cfg(epochs=1)
    cfg2["steps_per_call"] = 2
    ctx2, summary2 = run_tiny(cfg2, sun_pack, tmp_path / "b")

    assert summary1["epochs_run"] == summary2["epochs_run"]
    np.testing.assert_allclose(summary1["tau"], summary2["tau"], rtol=0, atol=0)

    m1 = json.loads(
        (ctx1.layout.output_dir / f"{ctx1.layout.stem}.metrics.json").read_text()
    )
    m2 = json.loads(
        (ctx2.layout.output_dir / f"{ctx2.layout.stem}.metrics.json").read_text()
    )
    assert m1["test_primary"]["auroc"] == m2["test_primary"]["auroc"]
    np.testing.assert_allclose(m1["val"]["loss"], m2["val"]["loss"], rtol=1e-5)


def test_steps_per_call_tail_handling(sun_pack, tmp_path):
    """16 frames / batch 8 = 2 steps/epoch with steps_per_call=3: the whole
    epoch is a tail chunk and must run through the single-step executable
    with no filler updates."""
    cfg = tiny_cfg(epochs=1)
    cfg["steps_per_call"] = 3
    ctx, summary = run_tiny(cfg, sun_pack, tmp_path / "t")
    base_ctx, base_summary = run_tiny(tiny_cfg(epochs=1), sun_pack, tmp_path / "u")
    m1 = json.loads(
        (ctx.layout.output_dir / f"{ctx.layout.stem}.metrics.json").read_text()
    )
    m2 = json.loads(
        (base_ctx.layout.output_dir / f"{base_ctx.layout.stem}.metrics.json").read_text()
    )
    assert m1["val"]["loss"] == m2["val"]["loss"]
    assert m1["test_primary"]["auroc"] == m2["test_primary"]["auroc"]
