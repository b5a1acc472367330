"""Threshold policy tests: optimisation, tie-breaks, degenerate handling."""

import numpy as np
import pytest

from ssl4polyp_tpu.metrics import thresholds as th
from ssl4polyp_tpu.metrics.threshold_store import canonical_threshold_path


def test_f1_policy_finds_separator():
    scores = np.array([0.1, 0.2, 0.3, 0.7, 0.8, 0.9])
    labels = np.array([0, 0, 0, 1, 1, 1])
    result = th.compute_policy_threshold(
        scores, labels, policy="f1_opt_on_val", split_name="sun_full/val", epoch=4
    )
    assert 0.3 < result.tau <= 0.7
    assert result.metrics["f1"] == 1.0
    assert result.record["policy"] == "f1_opt_on_val"
    assert result.record["n_candidates"] == len(set(scores)) + 2
    assert result.record["degenerate_val"] is False


def test_tie_break_prefers_lower_tau():
    # Perfect separation: every tau in (0.3, 0.7] gives f1=1; the candidate
    # grid contains 0.7 (a score) and the winner must be the LOWEST tau with
    # max objective and max recall — 0.7 is the only candidate in that range,
    # but between 0.7 and 1.0 both appear; recall breaks toward 0.7.
    scores = np.array([0.3, 0.7])
    labels = np.array([0, 1])
    result = th.compute_policy_threshold(
        scores, labels, policy="youden_on_val", split_name="v", epoch=0
    )
    assert result.tau == pytest.approx(0.7)


def test_degenerate_val_carries_forward():
    scores = np.array([0.4, 0.6])
    labels = np.array([1, 1])
    result = th.compute_policy_threshold(
        scores, labels, policy="f1_opt_on_val", split_name="v", epoch=2, previous_tau=0.42
    )
    assert result.tau == 0.42
    assert result.record["degenerate_val"] is True
    assert result.record["notes"]["carried_forward"] is True
    # without previous tau → 0.5 default
    result2 = th.compute_policy_threshold(
        scores, labels, policy="f1_opt_on_val", split_name="v", epoch=2
    )
    assert result2.tau == 0.5
    assert result2.record["notes"]["default_tau"] == 0.5


def test_candidate_budget_capped():
    rng = np.random.default_rng(0)
    scores = rng.random(1000)
    labels = rng.integers(0, 2, 1000)
    result = th.compute_policy_threshold(
        scores, labels, policy="val_opt_youden", split_name="v", epoch=0
    )
    assert result.record["n_candidates"] <= th.MAX_CANDIDATES


def test_youden_threshold_matches_roc():
    scores = np.array([0.05, 0.2, 0.35, 0.6, 0.75, 0.95])
    labels = np.array([0, 0, 1, 0, 1, 1])
    tau = th.compute_youden_threshold(scores, labels)
    from sklearn.metrics import roc_curve

    fpr, tpr, taus = roc_curve(labels, scores)
    assert tau == pytest.approx(float(taus[np.argmax(tpr - fpr)]))


def test_persistence_roundtrip(tmp_path):
    key = th.format_threshold_key("SUN_full", "VAL", "F1_opt_on_val")
    assert key == "sun_full_val_f1_opt_on_val"
    th.save_thresholds(tmp_path / "t.json", {key: 0.37})
    loaded = th.load_thresholds(tmp_path / "t.json")
    assert loaded == {key: 0.37}
    assert th.resolve_threshold(loaded, key) == 0.37
    assert th.resolve_threshold(loaded, "missing") is None


def test_save_thresholds_primary_injection(tmp_path):
    """Explicit ``primary=`` bypasses the multihost check (VERDICT r4 weak #7).

    primary=False must not write; primary=True must write without ever
    consulting the parallel layer.
    """
    skipped = tmp_path / "skip.json"
    th.save_thresholds(skipped, {"k": 0.5}, primary=False)
    assert not skipped.exists()

    written = tmp_path / "write.json"
    th.save_thresholds(written, {"k": 0.5}, primary=True)
    assert th.load_thresholds(written) == {"k": 0.5}


def test_frozen_sun_resolution():
    block = {
        "primary": {
            "policy": "f1_opt_on_val",
            "tau": 0.44,
            "split": "sun_full/val",
            "epoch": 9,
        }
    }
    tau, record = th.resolve_frozen_sun_threshold(block)
    assert tau == 0.44
    assert record["policy"] == "sun_val_frozen"
    assert record["source_policy"] == "f1_opt_on_val"
    assert "unexpected_source_split" not in record["notes"]

    bad = {"primary": {"policy": "p", "tau": 0.3, "split": "other/val"}}
    _, record2 = th.resolve_frozen_sun_threshold(bad)
    assert record2["notes"]["unexpected_source_split"] == "other/val"

    with pytest.raises(KeyError):
        th.resolve_frozen_sun_threshold({"sensitivity": None}, source_key="sensitivity")


def test_canonical_threshold_path(tmp_path):
    path = canonical_threshold_path(
        tmp_path,
        val_pack="sun_full/val",
        model_tag="SSL-colon",
        arch="ViT-B",
        pretraining="Hyperkvasir",
        seed=13,
        policy="f1_opt_on_val",
    )
    assert path == tmp_path.joinpath(
        "val", "ssl-colon", "arch-vit-b", "pretrain-hyperkvasir",
        "trainpack-full", "subset-full", "seed-13", "policy-f1_opt_on_val.json",
    )
