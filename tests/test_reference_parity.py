"""Property-style A/B against the reference's OWN metric/threshold modules.

VERDICT r4 item 2: trajectory parity used hand-built torch mirrors; these
tests import the actual reference implementations
(``/root/reference/src/ssl4polyp/classification/metrics/thresholds.py:299``
and ``performance.py:100-231``, plus ``analysis/common_metrics.py:100``) and
sweep random score/label vectors across shapes, tie-heavy grids, degenerate
single-class splits, and carry-forward cases, asserting τ, the full policy
record, and every metric match this repo's modules.

The reference tree is imported read-only (its analysis/metrics layer needs
only numpy/sklearn/torch-CPU, all installed); nothing from it is executed
beyond the pure functions under test.
"""

from __future__ import annotations

import math
import sys
import warnings
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src" / "ssl4polyp").is_dir(),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference metric modules with their expected sys.path."""
    pytest.importorskip("torch")
    added = []
    for entry in (str(REFERENCE / "src"), str(REFERENCE)):
        if entry not in sys.path:
            sys.path.insert(0, entry)
            added.append(entry)
    try:
        from ssl4polyp.classification.metrics import performance as ref_perf
        from ssl4polyp.classification.metrics import thresholds as ref_thr
        from ssl4polyp.classification.analysis import common_metrics as ref_cm

        yield {"perf": ref_perf, "thr": ref_thr, "cm": ref_cm}
    finally:
        for entry in added:
            if entry in sys.path:
                sys.path.remove(entry)


def _threshold_cases():
    """(name, scores, labels) covering grids, ties, degenerate splits."""
    rng = np.random.default_rng(1234)
    cases = []
    for n in (1, 2, 7, 64, 500):  # 500 → >200 unique scores (grid subsample)
        cases.append((f"uniform_{n}", rng.uniform(0, 1, n), rng.integers(0, 2, n)))
    for n in (16, 257):  # heavy ties on a coarse value lattice
        cases.append(
            (f"quantized_{n}", np.round(rng.uniform(0, 1, n) * 4) / 4, rng.integers(0, 2, n))
        )
    cases.append(("constant", np.full(12, 0.5), rng.integers(0, 2, 12)))
    cases.append(
        ("extremes", rng.choice([0.0, 1.0, 0.5, 0.123], size=33), rng.integers(0, 2, 33))
    )
    cases.append(("all_negative", rng.uniform(0, 1, 9), np.zeros(9, dtype=int)))
    cases.append(("all_positive", rng.uniform(0, 1, 9), np.ones(9, dtype=int)))
    # perfectly separated (τ lands between the clusters)
    sep_scores = np.concatenate([rng.uniform(0, 0.3, 10), rng.uniform(0.7, 1.0, 10)])
    sep_labels = np.concatenate([np.zeros(10, dtype=int), np.ones(10, dtype=int)])
    cases.append(("separated", sep_scores, sep_labels))
    return cases


def test_compute_policy_threshold_matches_reference(ref):
    from ssl4polyp_tpu.metrics import thresholds as thr

    for name, scores, labels in _threshold_cases():
        for policy in ("f1_opt_on_val", "youden_on_val", "val_opt_youden"):
            for previous_tau in (None, 0.37):
                ours = thr.compute_policy_threshold(
                    scores, labels, policy=policy, split_name="sun_full/val",
                    epoch=3, previous_tau=previous_tau,
                )
                theirs = ref["thr"].compute_policy_threshold(
                    scores, labels, policy=policy, split_name="sun_full/val",
                    epoch=3, previous_tau=previous_tau,
                )
                ctx = f"{name}/{policy}/prev={previous_tau}"
                assert ours.tau == theirs.tau, ctx
                np.testing.assert_array_equal(
                    np.asarray(ours.candidates), np.asarray(theirs.candidates), err_msg=ctx
                )
                # record: identical keys and values (the wire format reporters
                # and guardrails consume)
                assert set(ours.record) == set(theirs.record), ctx
                for key in theirs.record:
                    a, b = ours.record[key], theirs.record[key]
                    if key == "metrics":
                        for mk, mv in b.items():
                            assert math.isclose(a[mk], mv, rel_tol=0, abs_tol=1e-12), (ctx, mk)
                    else:
                        assert a == b, (ctx, key)
                for mk, mv in theirs.metrics.items():
                    assert math.isclose(ours.metrics[mk], mv, rel_tol=0, abs_tol=1e-12), (ctx, mk)


def test_policy_threshold_error_contract_matches(ref):
    from ssl4polyp_tpu.metrics import thresholds as thr

    for kwargs in (
        dict(scores=[], labels=[], policy="f1_opt_on_val"),
        dict(scores=[0.5], labels=[1, 0], policy="f1_opt_on_val"),
        dict(scores=[0.5], labels=[1], policy="bogus"),
    ):
        with pytest.raises(ValueError):
            thr.compute_policy_threshold(split_name="v", epoch=0, **kwargs)
        with pytest.raises(ValueError):
            ref["thr"].compute_policy_threshold(split_name="v", epoch=0, **kwargs)


def test_youden_threshold_matches_reference(ref):
    import torch

    from ssl4polyp_tpu.metrics.thresholds import compute_youden_threshold

    rng = np.random.default_rng(7)
    for n, shape in ((33, "flat"), (64, "col"), (41, "two")):
        logits1d = rng.normal(0, 3, n)
        labels = rng.integers(0, 2, n)
        if shape == "flat":
            ours_in, ref_in = logits1d, torch.tensor(logits1d)
        elif shape == "col":
            ours_in = logits1d[:, None]
            ref_in = torch.tensor(logits1d[:, None])
        else:
            two = np.stack([-logits1d / 2, logits1d / 2], axis=1)
            ours_in, ref_in = two, torch.tensor(two)
        # our (N,1) path: reference sigmoids the squeezed column; ours via
        # inputs="logits" sigmoids 1-D and softmaxes 2-D — feed the squeezed
        # view for the column case to compare the same score space.
        if shape == "col":
            ours_in = logits1d
        tau_ours = compute_youden_threshold(ours_in, labels, inputs="logits")
        tau_ref = ref["thr"].compute_youden_j_threshold(ref_in, torch.tensor(labels))
        assert tau_ours == pytest.approx(tau_ref, abs=1e-12), shape

    # perfect separation → the roc_curve inf-threshold guard on both sides
    scores = np.concatenate([np.full(5, -4.0), np.full(5, 4.0)])
    labels = np.array([0] * 5 + [1] * 5)
    tau_ours = compute_youden_threshold(scores, labels, inputs="logits")
    tau_ref = ref["thr"].compute_youden_j_threshold(
        __import__("torch").tensor(scores), __import__("torch").tensor(labels)
    )
    assert tau_ours == pytest.approx(tau_ref, abs=1e-12)


def _pred_target_cases():
    rng = np.random.default_rng(99)
    n = 48
    labels = rng.integers(0, 2, n)
    logits1d = rng.normal(0, 2, n)
    probs1d = rng.uniform(0, 1, n)
    logits2 = rng.normal(0, 2, (n, 2))
    probrows = rng.dirichlet([1.0, 1.0], size=n)
    return [
        ("logits_1d", logits1d, labels),
        ("probs_1d", probs1d, labels),
        ("logits_n1", logits1d[:, None], labels),
        ("logits_n2", logits2, labels),
        ("probrows_n2", probrows, labels),
        ("single_class", logits2, np.zeros(n, dtype=int)),
    ]


def test_performance_metrics_match_reference(ref):
    import torch

    from ssl4polyp_tpu.metrics import performance as perf

    functors = {
        "f1": ref["perf"].meanF1Score(2),
        "precision": ref["perf"].meanPrecision(2),
        "recall": ref["perf"].meanRecall(2),
        "bal_acc": ref["perf"].meanBalancedAccuracy(2),
    }
    ours_fns = {
        "f1": perf.mean_f1,
        "precision": perf.mean_precision,
        "recall": perf.mean_recall,
        "bal_acc": perf.balanced_accuracy,
    }
    auroc_ref = ref["perf"].meanAUROC(2)
    auprc_ref = ref["perf"].meanAUPRC(2)

    for name, preds, labels in _pred_target_cases():
        t_preds = torch.tensor(preds)
        t_labels = torch.tensor(labels)
        for tau in (None, 0.3):
            for key, fn in ours_fns.items():
                a = fn(preds, labels, 2, tau)
                b = float(functors[key](t_preds, t_labels, tau=tau))
                # reference functors do the smoothing arithmetic in torch
                # float32; allow its resolution
                assert a == pytest.approx(b, abs=2e-6), (name, key, tau)
        if preds.ndim == 2 and preds.shape[1] == 2:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                a = perf.mean_auroc(preds, labels, 2)
                b = float(auroc_ref(t_preds, t_labels))
            assert (math.isnan(a) and math.isnan(b)) or a == pytest.approx(b, abs=2e-6), name
        a = perf.mean_auprc(preds, labels, 2)
        b = float(auprc_ref(t_preds, t_labels))
        assert a == pytest.approx(b, abs=2e-6), (name, "auprc")


def test_multiclass_metrics_match_reference(ref):
    import torch

    from ssl4polyp_tpu.metrics import performance as perf

    rng = np.random.default_rng(5)
    n, k = 60, 4
    logits = rng.normal(0, 2, (n, k))
    labels = rng.integers(0, k, n)
    t_logits, t_labels = torch.tensor(logits), torch.tensor(labels)

    pairs = [
        (perf.mean_f1, ref["perf"].meanF1Score(k)),
        (perf.mean_precision, ref["perf"].meanPrecision(k)),
        (perf.mean_recall, ref["perf"].meanRecall(k)),
        (perf.balanced_accuracy, ref["perf"].meanBalancedAccuracy(k)),
    ]
    for ours, theirs in pairs:
        assert ours(logits, labels, k) == pytest.approx(
            float(theirs(t_logits, t_labels)), abs=2e-6
        )
    # Deliberate divergence, found BY this A/B: the reference meanAUROC
    # feeds raw logits to sklearn for n_class > 2 (performance.py:190-193),
    # which raises "Target scores need to be probabilities"; ours softmaxes
    # first (as_class_probabilities) and succeeds.  On probabilities — the
    # only input its callers could ever have used successfully — both agree.
    with pytest.raises(ValueError, match="probabilities"):
        ref["perf"].meanAUROC(k)(t_logits, t_labels)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    t_probs = __import__("torch").tensor(probs)
    assert perf.mean_auroc(logits, labels, k) == pytest.approx(
        float(ref["perf"].meanAUROC(k)(t_probs, t_labels)), abs=2e-6
    )
    assert perf.mean_auroc(probs, labels, k) == pytest.approx(
        float(ref["perf"].meanAUROC(k)(t_probs, t_labels)), abs=2e-6
    )
    assert perf.mean_auprc(logits, labels, k) == pytest.approx(
        float(ref["perf"].meanAUPRC(k)(t_logits, t_labels)), abs=2e-6
    )


def test_analysis_binary_metrics_match_reference(ref):
    """The analysis layer's frame recomputation (used by every reporter)
    agrees with the reference ``common_metrics.compute_binary_metrics``."""
    from ssl4polyp_tpu.analysis.common import compute_binary_metrics

    rng = np.random.default_rng(31)
    for n in (5, 200):
        probs = rng.uniform(0, 1, n)
        labels = rng.integers(0, 2, n)
        for tau in (0.25, 0.5, 0.9):
            ours = compute_binary_metrics(probs, labels, tau)
            theirs = ref["cm"].compute_binary_metrics(probs, labels, tau)
            for key, val in theirs.items():
                if key not in ours:
                    continue
                a = ours[key]
                if isinstance(val, float) and math.isnan(val):
                    assert math.isnan(float(a)), key
                else:
                    assert float(a) == pytest.approx(float(val), abs=1e-12), key
