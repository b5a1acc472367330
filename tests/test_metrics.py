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


def test_binary_block_matches_analysis_recompute():
    """The declared test_primary block and the analysis layer's frame
    recomputation (sklearn positive-class) must agree on ASYMMETRIC
    confusions — the active audit (report_core.recompute_primary_metrics,
    AUDIT_TOLERANCE=5e-3) hard-fails otherwise.  The reference tolerates a
    macro-vs-binary mismatch only because its audit is disabled
    (result_loader.py:189); ours is not."""
    import numpy as np

    from ssl4polyp_tpu.analysis.common import compute_binary_metrics
    from ssl4polyp_tpu.metrics.performance import binary_metrics_block

    probs = np.array([0.1, 0.6, 0.4, 0.8, 0.9, 0.2, 0.7, 0.3])
    targets = np.array([0, 0, 1, 1, 1, 1, 0, 0])
    block = binary_metrics_block(probs, targets, tau=0.5)
    recomputed = compute_binary_metrics(probs, targets, 0.5)
    for key in ("recall", "precision", "f1", "balanced_accuracy", "mcc",
                "auroc", "tp", "fp", "tn", "fn"):
        assert abs(float(block[key]) - float(recomputed[key])) < 1e-9, key


def test_mean_auroc_two_class_logits_rank_by_column1():
    """Reference meanAUROC feeds raw preds[:, 1] to roc_auc_score; the
    softmax p1 = sigmoid(x1 - x0) would reverse rankings when x0 varies."""
    import numpy as np

    from sklearn.metrics import roc_auc_score

    from ssl4polyp_tpu.metrics.performance import mean_auroc

    logits = np.array([[0.0, 0.5], [-5.0, 0.4]])
    targets = np.array([1, 0])
    assert mean_auroc(logits, targets, 2) == roc_auc_score(targets, logits[:, 1])


def test_mean_auprc_float_targets():
    import numpy as np

    from ssl4polyp_tpu.metrics.performance import mean_auprc

    probs = np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1], [0.2, 0.2, 0.6]])
    value = mean_auprc(probs, np.array([0.0, 1.0, 2.0]), n_class=3)
    assert value == 1.0


def test_youden_threshold_input_contract():
    import numpy as np
    import pytest

    from ssl4polyp_tpu.metrics.thresholds import compute_youden_threshold

    probs = np.array([0.1, 0.2, 0.8, 0.9])
    labels = np.array([0, 0, 1, 1])
    tau_probs = compute_youden_threshold(probs, labels)
    assert 0.2 < tau_probs <= 0.8

    # logits mode sigmoid-maps first (reference _prepare_binary_scores)
    logits = np.log(probs / (1 - probs))
    tau_logits = compute_youden_threshold(logits, labels, inputs="logits")
    assert abs(tau_logits - tau_probs) < 1e-9

    # out-of-range values in probs mode fail loudly instead of being
    # silently interpreted in the wrong space
    with pytest.raises(ValueError, match="outside"):
        compute_youden_threshold(logits, labels)
