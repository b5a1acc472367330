"""Protocol resolution tests: plans, policies, schedules, layouts."""

import pytest

from ssl4polyp_tpu.training import layout as lay
from ssl4polyp_tpu.training import protocol as proto


def exp_cfg(**extra):
    cfg = {
        "lr": 0.001,
        "weight_decay": 0.05,
        "batch_size": 128,
        "epochs": 100,
        "seeds": [13, 29, 47],
        "scheduler": {"name": "cosine", "warmup_epochs": 5},
        "early_stop": {"monitor": "val_loss", "patience": 8, "min_delta": 1e-4, "min_epochs": 3},
        "dataset": {
            "name": "sun_full",
            "pack": "sun_full",
            "splits": {"train": "train", "val": "val", "test": "test"},
        },
        "models": [{"model": {"key": "sup_imnet", "arch": "vit_b", "pretraining": "ImageNet_class"}}],
        "protocol": {
            "finetune": "full",
            "thresholds": {"primary": "f1_opt_on_val", "sensitivity": "youden_on_val"},
        },
        "threshold_policy": "f1_opt_on_val",
    }
    cfg.update(extra)
    return cfg


def test_basic_plan():
    plan = proto.resolve_run_plan(exp_cfg(), model_key="sup_imnet", seed=13)
    assert plan.seed == 13
    assert plan.training_seeds[0] == 13
    assert plan.model_tag == "SupImnet"
    assert plan.threshold_policy == "f1_opt_on_val"
    assert plan.sensitivity_threshold_policy == "youden_on_val"
    assert plan.finetune_mode == "full"
    assert plan.dataset_resolved["train_pack"] == "sun_full"
    assert plan.dataset_layout.data_tag == "SUNFull"
    assert plan.epochs == 100


def test_seed_rotation():
    plan = proto.resolve_run_plan(exp_cfg(), model_key="sup_imnet", seed=29)
    assert plan.training_seeds[0] == 29
    assert set(plan.training_seeds) == {13, 29, 47}


def test_subset_pattern_resolution():
    cfg = exp_cfg()
    cfg["dataset"] = {
        "name": "sun_subsets",
        "base_pack": "sun_full",
        "train_pattern": "sun_subsets/sun_p{percent:02d}",
        "seeds": [13],
        "percent": 10,
        "splits": {"train": "train", "val": "val", "test": "test"},
    }
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    assert plan.dataset_resolved["train_pack"] == "sun_subsets/sun_p10"
    assert plan.dataset_resolved["val_pack"] == "sun_full"
    assert plan.dataset_layout.data_tag == "SUNP10"
    assert plan.dataset_layout.segments == ("sun_subsets", "p10", "seed13")


def test_fewshot_pattern_and_batch():
    cfg = exp_cfg()
    cfg["dataset"] = {
        "name": "polypgen_fewshot",
        "pack_pattern": "polypgen_fewshot/polypgen_fewshot_s{size}",
        "sizes": [50, 100],
        "size": 50,
        "seeds": [13],
        "splits": {"train": "train", "val": "val", "test": "test"},
    }
    cfg["protocol"]["thresholds"] = {"primary": "sun_val_frozen", "sensitivity": "val_opt_youden"}
    cfg["threshold_policy"] = "sun_val_frozen"
    cfg["protocol"]["init_from"] = "canonical_sun_models"
    plan = proto.resolve_run_plan(
        cfg, model_key="sup_imnet", seed=13, output_dir="checkpoints/classification"
    )
    assert plan.dataset_resolved["train_pack"] == "polypgen_fewshot/polypgen_fewshot_s50"
    # few-shot recommendation is PER-DEVICE (reference per-rank batches
    # scaled by world size); the test mesh has 8 virtual devices
    import jax

    assert plan.batch_size == 4 * jax.device_count()
    assert plan.parent_checkpoint is not None
    assert "exp1_sup_imnet_seed13" in plan.parent_checkpoint
    assert plan.dataset_layout.data_tag == "PolypGenFew50"


def test_exp5a_detection():
    cfg = exp_cfg()
    cfg["dataset"] = {
        "name": "polypgen_clean_test",
        "pack": "polypgen_clean_test",
        "splits": {"test": "test"},
    }
    cfg["protocol"] = {
        "finetune": "none",
        "init_from": "canonical_sun_models",
        "thresholds": {"primary": "sun_val_frozen"},
    }
    cfg["threshold_policy"] = "sun_val_frozen"
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    assert plan.is_exp5a
    assert plan.dataset_resolved["train_pack"] is None
    assert plan.threshold_policy == "sun_val_frozen"


def test_policy_auto_table():
    resolve = proto.resolve_threshold_policies
    policy, _ = resolve(
        raw_policy="auto", expected_primary=None, sensitivity_policy=None,
        dataset_name="sun_full", binary_task=True, is_exp5a=False,
    )
    assert policy == "f1_opt_on_val"
    policy, _ = resolve(
        raw_policy="auto", expected_primary=None, sensitivity_policy=None,
        dataset_name="polypgen_fewshot", binary_task=True, is_exp5a=False,
    )
    assert policy == "val_opt_youden"
    policy, _ = resolve(
        raw_policy="auto", expected_primary=None, sensitivity_policy=None,
        dataset_name="x", binary_task=True, is_exp5a=True,
    )
    assert policy == "sun_val_frozen"
    policy, sens = resolve(
        raw_policy="youden", expected_primary=None, sensitivity_policy="f1",
        dataset_name="x", binary_task=True, is_exp5a=False,
    )
    assert policy == "youden_on_val" and sens == "f1_opt_on_val"
    with pytest.raises(ValueError, match="requires primary"):
        resolve(
            raw_policy="youden_on_val", expected_primary="f1_opt_on_val",
            sensitivity_policy=None, dataset_name="x", binary_task=True, is_exp5a=False,
        )


def test_finetune_schedule():
    cfg = exp_cfg()
    del cfg["epochs"]
    cfg["protocol"]["finetune_schedule"] = [
        {"name": "head_warmup", "mode": "none", "epochs": 10, "head_lr": 5e-4},
        {"name": "refine", "mode": "head+1", "epochs": 20, "head_lr": 5e-4, "backbone_lr": 5e-6},
    ]
    plan = proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)
    assert plan.epochs == 30
    assert plan.finetune_mode == "none"  # stage 0 mode
    assert plan.lr == 5e-4
    assert plan.finetune_schedule[1].backbone_lr == 5e-6

    cfg["epochs"] = 25  # disagreement must raise
    with pytest.raises(ValueError, match="disagree"):
        proto.resolve_run_plan(cfg, model_key="sup_imnet", seed=13)


def test_stem_and_layout():
    assert lay.compose_stem("SslColon", "SUNFull", (), 47) == "SslColon_SUNFull_s47"
    assert (
        lay.compose_stem("SupImnet", "PolypGenFew50", ("fromSUN_s13",), 13)
        == "SupImnet_PolypGenFew50_fromSUN_s13_s13"
    )
    assert lay.format_selection_tag("val_loss") == "valLoss"
    assert lay.format_selection_tag("val_auroc") == "valAUROC"
    tag, seed = lay.extract_parent_metadata("SupImnet_SUNFull_s13.ckpt")
    assert tag == "SUNFull" and seed == 13
    tag, seed = lay.extract_parent_metadata("SslColon_SUNFull_s47_e07_valLoss.ckpt")
    assert tag == "SUNFull"


def test_canonical_parent_path():
    path = lay.canonical_sun_parent_checkpoint(
        "ssl_colon", "SslColon", 47, output_dir="checkpoints/classification/exp2"
    )
    assert str(path).endswith(
        "classification/exp2_ssl_colon_seed47/sun_baselines/SslColon_SUNFull_s47.ckpt"
    )


def test_steps_per_call_auto_resolution():
    """"auto"/None → 0 sentinel (engine resolves per backend: 4 on
    accelerators, 1 on CPU — classification.py); explicit ints clamp ≥ 1."""
    plan = proto.resolve_run_plan(exp_cfg(), model_key="sup_imnet", seed=13)
    assert plan.steps_per_call == 0  # default is "auto"
    for raw, want in [("auto", 0), ("AUTO ", 0), (None, 0), (2, 2), ("7", 7), (0, 1), (-3, 1)]:
        plan = proto.resolve_run_plan(
            exp_cfg(steps_per_call=raw), model_key="sup_imnet", seed=13
        )
        assert plan.steps_per_call == want, (raw, plan.steps_per_call, want)
    with pytest.raises(ValueError):
        proto.resolve_run_plan(
            exp_cfg(steps_per_call="fast"), model_key="sup_imnet", seed=13
        )
