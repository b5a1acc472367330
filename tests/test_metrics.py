"""Metric suite tests, including sklearn cross-checks."""

import numpy as np
import pytest

from ssl4polyp_tpu.metrics import performance as perf


def test_binary_scores_from_logits_and_probs():
    logits = np.array([-2.0, 0.0, 3.0])
    scores = perf.as_binary_scores(logits)
    np.testing.assert_allclose(scores, 1 / (1 + np.exp(-logits)))
    probs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(perf.as_binary_scores(probs), probs)
    two_col = np.array([[2.0, 1.0], [0.0, 4.0]])
    out = perf.as_binary_scores(two_col)
    expected = np.exp(two_col - two_col.max(1, keepdims=True))
    expected = (expected / expected.sum(1, keepdims=True))[:, 1]
    np.testing.assert_allclose(out, expected)


def test_label_predictions_respect_tau():
    probs = np.array([0.3, 0.55, 0.8])
    np.testing.assert_array_equal(perf.as_label_predictions(probs, 2), [0, 1, 1])
    np.testing.assert_array_equal(perf.as_label_predictions(probs, 2, tau=0.6), [0, 0, 1])


def test_macro_metrics_against_sklearn():
    from sklearn.metrics import f1_score, precision_score, recall_score

    rng = np.random.default_rng(0)
    targets = rng.integers(0, 2, 200)
    probs = np.clip(targets * 0.6 + rng.normal(0, 0.3, 200), 0, 1)
    preds = (probs >= 0.5).astype(int)
    assert perf.mean_f1(probs, targets) == pytest.approx(
        f1_score(targets, preds, average="macro"), abs=1e-6
    )
    assert perf.mean_precision(probs, targets) == pytest.approx(
        precision_score(targets, preds, average="macro"), abs=1e-6
    )
    assert perf.mean_recall(probs, targets) == pytest.approx(
        recall_score(targets, preds, average="macro"), abs=1e-6
    )


def test_auroc_nan_on_single_class():
    with pytest.warns(RuntimeWarning):
        value = perf.mean_auroc(np.array([0.2, 0.8]), np.array([1, 1]))
    assert np.isnan(value)


def test_binary_metrics_block():
    targets = np.array([0, 0, 1, 1, 1])
    probs = np.array([0.1, 0.6, 0.4, 0.8, 0.9])
    block = perf.binary_metrics_block(probs, targets, tau=0.5, loss=0.3)
    assert block["tp"] == 2 and block["fp"] == 1 and block["tn"] == 1 and block["fn"] == 1
    assert block["n_pos"] == 3 and block["n_neg"] == 2
    assert block["prevalence"] == pytest.approx(0.6)
    assert block["loss"] == pytest.approx(0.3)
    assert 0 <= block["auroc"] <= 1
    assert block["tau"] == 0.5
