"""Metric suite and decision-threshold policies (host-side numpy/sklearn).

Forward passes run jitted on TPU; metric reduction happens on gathered host
arrays (cheap at this scale, and keeps sklearn parity with the reference —
SURVEY §7 hard-part 3).
"""

from .performance import (
    as_binary_scores,
    as_label_predictions,
    mean_f1,
    mean_precision,
    mean_recall,
    mean_auroc,
    mean_auprc,
    balanced_accuracy,
    binary_metrics_block,
)
from .thresholds import (
    compute_policy_threshold,
    compute_youden_threshold,
    format_threshold_key,
    load_thresholds,
    resolve_frozen_sun_threshold,
    save_thresholds,
    ThresholdResult,
)

__all__ = [
    "as_binary_scores",
    "as_label_predictions",
    "mean_f1",
    "mean_precision",
    "mean_recall",
    "mean_auroc",
    "mean_auprc",
    "balanced_accuracy",
    "binary_metrics_block",
    "compute_policy_threshold",
    "compute_youden_threshold",
    "format_threshold_key",
    "load_thresholds",
    "resolve_frozen_sun_threshold",
    "save_thresholds",
    "ThresholdResult",
]
