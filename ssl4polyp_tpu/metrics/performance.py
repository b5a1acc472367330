"""Classification metrics on host numpy arrays.

Functional re-design of the reference metric functors
(``src/ssl4polyp/classification/metrics/performance.py``): same numerical
contracts (macro averaging with 1e-8 smoothing, sklearn AUROC/AUPRC/balanced
accuracy, NaN AUROC on single-class targets, τ-thresholded binary
predictions, probability-vs-logit sniffing) without torch modules.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional

import numpy as np

_PROB_ATOL = 1e-6
_PROB_RTOL = 1e-4
_SMOOTH = 1e-8

__all__ = [
    "as_binary_scores",
    "as_class_probabilities",
    "as_label_predictions",
    "mean_f1",
    "mean_precision",
    "mean_recall",
    "mean_auroc",
    "mean_auprc",
    "balanced_accuracy",
    "mcc",
    "binary_metrics_block",
]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x: np.ndarray) -> np.ndarray:
    shifted = x - x.max(axis=1, keepdims=True)
    exp = np.exp(shifted)
    return exp / exp.sum(axis=1, keepdims=True)


def _looks_like_prob_vector(x: np.ndarray) -> bool:
    if x.size == 0:
        return True
    return float(x.min()) >= -_PROB_ATOL and float(x.max()) <= 1.0 + _PROB_ATOL


def _looks_like_prob_matrix(x: np.ndarray) -> bool:
    if x.size == 0:
        return True
    if not _looks_like_prob_vector(x):
        return False
    sums = x.sum(axis=1)
    return bool(np.allclose(sums, 1.0, atol=1e-3, rtol=_PROB_RTOL))


def as_binary_scores(preds: np.ndarray) -> np.ndarray:
    """Positive-class probabilities from (N,), (N,1) or (N,2) preds."""
    preds = np.asarray(preds)
    if preds.ndim == 1:
        if np.issubdtype(preds.dtype, np.floating):
            return preds if _looks_like_prob_vector(preds) else _sigmoid(preds)
        return preds.astype(np.float32)
    if preds.ndim == 2:
        if preds.shape[1] == 1:
            return as_binary_scores(preds[:, 0])
        if preds.shape[1] != 2:
            raise ValueError("Binary score extraction needs (N,), (N,1) or (N,2)")
        if np.issubdtype(preds.dtype, np.floating) and _looks_like_prob_matrix(preds):
            return preds[:, 1]
        return _softmax(preds.astype(np.float64))[:, 1]
    raise ValueError("Predictions must be 1D or 2D")


def as_class_probabilities(preds: np.ndarray, n_class: int) -> np.ndarray:
    preds = np.asarray(preds)
    if preds.ndim != 2 or preds.shape[1] != n_class:
        raise ValueError(f"Expected (N, {n_class}) array, got {preds.shape}")
    if np.issubdtype(preds.dtype, np.floating) and _looks_like_prob_matrix(preds):
        return preds
    return _softmax(preds.astype(np.float64))


def as_label_predictions(
    preds: np.ndarray, n_class: int, tau: Optional[float] = None
) -> np.ndarray:
    """Discrete predictions; binary problems threshold P(positive) at τ."""
    preds = np.asarray(preds)
    if preds.ndim == 1:
        if np.issubdtype(preds.dtype, np.floating):
            if n_class != 2:
                raise ValueError("1D float predictions only supported for binary")
            scores = preds if _looks_like_prob_vector(preds) else _sigmoid(preds)
            return (scores >= (0.5 if tau is None else tau)).astype(np.int64)
        return preds.astype(np.int64)
    if preds.ndim == 2:
        if preds.shape[1] == 1:
            return as_label_predictions(preds[:, 0], n_class, tau)
        if n_class == 2:
            scores = as_binary_scores(preds)
            return (scores >= (0.5 if tau is None else tau)).astype(np.int64)
        return np.argmax(as_class_probabilities(preds, n_class), axis=1)
    raise ValueError("Predictions must be 1D or 2D")


def _macro(preds, targets, n_class, tau, per_class_fn) -> float:
    labels = as_label_predictions(preds, n_class, tau)
    targets = np.asarray(targets)
    total = 0.0
    for c in range(n_class):
        pred_c = labels == c
        true_c = targets == c
        total += per_class_fn(pred_c, true_c)
    return float(total / n_class)


def mean_f1(preds, targets, n_class: int = 2, tau: Optional[float] = None) -> float:
    return _macro(
        preds, targets, n_class, tau,
        lambda p, t: (2.0 * ((p & t).sum() + _SMOOTH)) / (p.sum() + t.sum() + _SMOOTH),
    )


def mean_precision(preds, targets, n_class: int = 2, tau: Optional[float] = None) -> float:
    return _macro(
        preds, targets, n_class, tau,
        lambda p, t: ((p & t).sum() + _SMOOTH) / (p.sum() + _SMOOTH),
    )


def mean_recall(preds, targets, n_class: int = 2, tau: Optional[float] = None) -> float:
    return _macro(
        preds, targets, n_class, tau,
        lambda p, t: ((p & t).sum() + _SMOOTH) / (t.sum() + _SMOOTH),
    )


def mean_auroc(preds, targets, n_class: int = 2) -> float:
    from sklearn.metrics import roc_auc_score

    preds = np.asarray(preds)
    targets = np.asarray(targets)
    if np.unique(targets).size < 2:
        warnings.warn(
            "AUROC undefined with a single target class; returning NaN.",
            RuntimeWarning,
            stacklevel=2,
        )
        return float("nan")
    if n_class == 2:
        if preds.ndim == 2 and preds.shape[1] == 2:
            # Reference meanAUROC ranks by raw column 1 (``performance.py``:
            # preds[:, 1] straight into roc_auc_score) — NOT by the softmax
            # p1 = sigmoid(x1 - x0), which reverses rankings when x0 varies.
            scores = preds[:, 1]
        else:
            scores = as_binary_scores(preds)
        return float(roc_auc_score(targets, scores))
    probs = as_class_probabilities(preds, n_class)
    return float(roc_auc_score(targets, probs, multi_class="ovr", average="macro"))


def mean_auprc(preds, targets, n_class: int = 2) -> float:
    from sklearn.metrics import average_precision_score

    targets = np.asarray(targets)
    if n_class == 2:
        scores = as_binary_scores(np.asarray(preds))
        return float(average_precision_score(targets, scores))
    probs = as_class_probabilities(np.asarray(preds), n_class)
    # int cast mirrors the reference's targets.to(torch.long) before one_hot
    one_hot = np.eye(n_class, dtype=np.int64)[np.asarray(targets).astype(np.int64)]
    return float(average_precision_score(one_hot, probs, average="macro"))


def balanced_accuracy(preds, targets, n_class: int = 2, tau: Optional[float] = None) -> float:
    from sklearn.metrics import balanced_accuracy_score

    labels = as_label_predictions(np.asarray(preds), n_class, tau)
    return float(balanced_accuracy_score(np.asarray(targets), labels))


def mcc(preds, targets, n_class: int = 2, tau: Optional[float] = None) -> float:
    from sklearn.metrics import matthews_corrcoef

    labels = as_label_predictions(np.asarray(preds), n_class, tau)
    return float(matthews_corrcoef(np.asarray(targets), labels))


def binary_metrics_block(
    probs: np.ndarray,
    targets: np.ndarray,
    tau: Optional[float] = None,
    loss: Optional[float] = None,
) -> Dict[str, float]:
    """Full per-split metric block (the reference's reported metric set:
    ``README.md:335`` / ``common_metrics.py:100``).

    Averaging convention: POSITIVE-CLASS binary (sklearn semantics), the
    same convention as the analysis layer's frame recomputation
    (``analysis/common.py::compute_binary_metrics``, reference
    ``common_metrics.py:142-144``) and the threshold policies
    (``thresholds.py``).  The reference's *train-side* functors are
    macro-averaged (``performance.py:100-155``) — an internal inconsistency
    the reference tolerates because its artifact audit is disabled
    (``result_loader.py:189``); ours is active
    (``report_core.recompute_primary_metrics``), so the declared block
    must match the frames recomputation.  The macro functors remain
    available above for multiclass parity.  All thresholded metrics
    derive from ONE confusion pass.
    """
    from sklearn.metrics import average_precision_score, roc_auc_score

    probs = as_binary_scores(np.asarray(probs))
    targets = np.asarray(targets).astype(np.int64)
    threshold = 0.5 if tau is None else float(tau)
    predictions = (probs >= threshold).astype(np.int64)
    tp = int(((predictions == 1) & (targets == 1)).sum())
    fp = int(((predictions == 1) & (targets == 0)).sum())
    tn = int(((predictions == 0) & (targets == 0)).sum())
    fn = int(((predictions == 0) & (targets == 1)).sum())
    n = len(targets)
    recall = tp / (tp + fn) if tp + fn else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    f1 = (2 * tp) / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    tnr = tn / (tn + fp) if tn + fp else 0.0
    bal_acc = 0.5 * (recall + tnr)
    mcc_den = float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc_val = (
        (tp * tn - fp * fn) / np.sqrt(mcc_den) if mcc_den > 0 else 0.0
    )
    single_class = np.unique(targets).size < 2
    if single_class:
        warnings.warn(
            "AUROC undefined with a single target class; returning NaN.",
            RuntimeWarning,
            stacklevel=2,
        )
    block: Dict[str, float] = {
        "recall": float(recall),
        "precision": float(precision),
        "f1": float(f1),
        "balanced_accuracy": float(bal_acc),
        "auroc": float("nan") if single_class else float(roc_auc_score(targets, probs)),
        "auprc": float(average_precision_score(targets, probs)),
        "mcc": float(mcc_val),
        "tp": tp,
        "fp": fp,
        "tn": tn,
        "fn": fn,
        "n_total": n,
        "n_pos": int((targets == 1).sum()),
        "n_neg": int((targets == 0).sum()),
        "prevalence": float((targets == 1).sum() / n) if n else float("nan"),
        "tau": threshold,
    }
    if loss is not None:
        block["loss"] = float(loss)
    return block
