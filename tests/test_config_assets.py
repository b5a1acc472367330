"""The shipped config tree must compose and resolve into valid run plans."""

import pytest

from ssl4polyp_tpu.configs.layered import load_layered_config
from ssl4polyp_tpu.training.protocol import resolve_run_plan


@pytest.mark.parametrize("exp,model_key", [
    ("exp/exp1", "sup_imnet"),
    ("exp/exp1", "ssl_imnet"),
    ("exp/exp2", "ssl_colon"),
    ("exp/exp3", "ssl_imnet"),
    ("exp/exp4", "sup_imnet"),
    ("exp/exp5a", "ssl_colon"),
    ("exp/exp5b", "sup_imnet"),
    ("exp/exp5c", "ssl_imnet"),
])
def test_experiment_configs_resolve(exp, model_key):
    cfg = load_layered_config(exp)
    overrides = None
    if exp.endswith("exp4"):
        # exp4 sweeps dataset.percent per run (reference --override flag)
        overrides = {"dataset": {"percent": 10}}
    elif exp.endswith("exp5c"):
        # exp5c is parameterised by budget configs (exp5c/budgets/sN.yaml)
        overrides = {"dataset": {"size": 50}}
    plan = resolve_run_plan(cfg, model_key=model_key, seed=13, overrides=overrides)
    assert plan.model_key == model_key
    assert plan.seed == 13
    assert plan.training_seeds[:1] == [13]
    assert plan.epochs > 0


def test_exp1_policies():
    plan = resolve_run_plan(load_layered_config("exp/exp1"), model_key="sup_imnet", seed=13)
    assert plan.threshold_policy == "f1_opt_on_val"
    assert plan.sensitivity_threshold_policy == "youden_on_val"
    assert plan.curve_export_splits == {"test": {"points": 200}}
    assert plan.finetune_mode == "full"
    assert plan.reporting_inputs_subdir == "exp1_sun_baselines_sup_vs_ssl"


def test_exp1_smoke_limits():
    plan = resolve_run_plan(load_layered_config("exp/exp1_smoke"), model_key="sup_imnet", seed=13)
    assert plan.limit_train_batches == 8
    assert plan.batch_size == 32
    assert plan.epochs == 3
    assert plan.dataset_resolved["train_pack"] == "sun_subsets/sun_p10"
    assert plan.dataset_resolved["val_pack"] == "sun_full"


def test_exp3_morphology():
    plan = resolve_run_plan(load_layered_config("exp/exp3"), model_key="ssl_colon", seed=13)
    assert plan.morphology_eval == ["flat", "polypoid"]
    assert plan.dataset_layout.data_tag == "SUNMorph"


def test_exp5a_plan():
    plan = resolve_run_plan(
        load_layered_config("exp/exp5a"), model_key="ssl_colon", seed=47,
        output_dir="checkpoints/classification",
    )
    assert plan.is_exp5a
    assert plan.threshold_policy == "sun_val_frozen"
    assert "exp2_ssl_colon_seed47" in plan.parent_checkpoint


def test_exp5b_perturbations():
    plan = resolve_run_plan(load_layered_config("exp/exp5b"), model_key="sup_imnet", seed=13)
    assert plan.perturbation_splits == ["test"]
    assert plan.sensitivity_threshold_policy == "sun_val_frozen"


@pytest.mark.parametrize("size,epochs,stage1_mode", [
    (50, 30, "head+1"), (100, 40, "head+2"), (200, 50, "head+2"), (500, 50, "head+2"),
])
def test_exp5c_budgets(size, epochs, stage1_mode):
    plan = resolve_run_plan(
        load_layered_config(f"exp/exp5c/budgets/s{size}"),
        model_key="ssl_colon", seed=13, output_dir="checkpoints/classification",
    )
    assert plan.epochs == epochs
    assert plan.finetune_mode == "none"  # stage 0
    assert plan.finetune_schedule[1].mode == stage1_mode
    assert plan.dataset_resolved["train_pack"] == f"polypgen_fewshot/polypgen_fewshot_s{size}"
    # per-device recommendation x mesh size (reference: recommended *
    # world_size replaces the configured batch)
    import jax

    assert plan.batch_size <= 32 * jax.device_count()
    assert plan.batch_size % jax.device_count() == 0
    assert plan.weight_decay == 0.01
