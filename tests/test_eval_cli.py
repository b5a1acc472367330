"""Standalone eval CLI: checkpoint discovery, tau resolution, evaluation."""

import json
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.evaluation.eval_classification import (
    discover_checkpoints,
    evaluate,
    filter_candidates,
    parse_checkpoint_name,
    resolve_tau,
)
from tests.conftest import make_image_pack


def test_parse_checkpoint_names(tmp_path):
    cases = {
        "SupImnet_SUNFull_s13.ckpt": ("SupImnet", "SUNFull", 13, None, None, True),
        "SslColon_SUNFull_s47_e07_valLoss.ckpt": ("SslColon", "SUNFull", 47, 7, "valLoss", False),
        "SupImnet_PolypGenFew50_fromSUN_s13_s13.ckpt": ("SupImnet", "PolypGenFew50", 13, None, None, True),
    }
    for name, expected in cases.items():
        path = tmp_path / name
        path.touch()
        info = parse_checkpoint_name(path)
        assert info is not None, name
        assert (
            info.model_tag, info.data_tag, info.seed,
            info.epoch, info.selection_tag, info.is_pointer,
        ) == expected


def test_discovery_and_filters(tmp_path):
    for name in (
        "SupImnet_SUNFull_s13_e03_valLoss.ckpt",
        "SupImnet_SUNFull_s29_e05_valLoss.ckpt",
        "SslColon_SUNFull_s13_e02_valLoss.ckpt",
    ):
        (tmp_path / name).touch()
    found = discover_checkpoints(tmp_path)
    assert len(found) == 3
    only_sup = filter_candidates(found, model_tag="supimnet")
    assert len(only_sup) == 2
    one = filter_candidates(found, model_tag="SupImnet", seed=29)
    assert len(one) == 1 and one[0].epoch == 5


def test_eval_roundtrip_from_training(tmp_path):
    """Train a tiny model, then evaluate its checkpoint standalone."""
    from ssl4polyp_tpu.training import protocol as proto
    from ssl4polyp_tpu.training.classification import build_run, run_classification_training
    from tests.test_classification_engine import TINY_MODEL, tiny_cfg

    packs = tmp_path / "data_packs"
    packs.mkdir()
    make_image_pack(packs, name="sun_full", frames_per_split=12, image_size=32)
    plan = proto.resolve_run_plan(tiny_cfg(), model_key="sup_imnet", seed=13)
    ctx = build_run(
        plan, output_dir=tmp_path / "out", pack_root=packs, model_overrides=TINY_MODEL
    )
    summary = run_classification_training(ctx)

    checkpoint = ctx.layout.checkpoint_path
    # tau resolution from the stored thresholds
    tau = resolve_tau(checkpoint)
    assert tau == pytest.approx(summary["tau"])

    eval_dir = tmp_path / "eval"
    result = evaluate(
        checkpoint,
        packs / "sun_full",
        batch_size=6,
        image_size=32,
        output_dir=eval_dir,
        export_outputs=True,
        num_workers=1,
    )
    assert result["tau"] == pytest.approx(summary["tau"])
    assert result["n_frames"] == 12
    assert 0.0 <= result["f1"] <= 1.0
    assert (eval_dir / "eval_results.txt").exists()
    assert (eval_dir / "logits.npz").exists()
    assert (eval_dir / "metadata.jsonl").exists()
    # reference wire format: logits.pt is a bare torch tensor loadable with
    # the restricted (weights_only) unpickler (reference eval_outputs.py:28)
    torch = pytest.importorskip("torch")
    loaded = torch.load(eval_dir / "logits.pt", weights_only=True)
    stored = np.load(eval_dir / "logits.npz")
    np.testing.assert_array_equal(loaded.numpy(), stored["logits"].astype(np.float32))
    assert json.loads((eval_dir / "tau.json").read_text())["tau"] == pytest.approx(summary["tau"])
    # evaluation must reproduce the training-time test AUROC (same params/tau)
    assert result["auroc"] == pytest.approx(summary["test_auroc"], abs=1e-6)
