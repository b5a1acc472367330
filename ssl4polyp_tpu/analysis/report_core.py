"""Shared reporter machinery: discovery, aggregation, deltas, rendering.

The reference ships ~9.4k lines across seven near-copy reporters
(``analysis/exp{1..5c}_report.py``); here the common 90% lives once and the
per-experiment modules declare only their deviations (strata, learning
curves, retention, zero-shot anchors).
"""

from __future__ import annotations

import csv
import json
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from .common import CommonRun, compute_binary_metrics, load_common_run
from .display import format_delta, format_value
from .frame_bootstrap import FrameBootstrapper, FrameSample
from .guardrails import GuardrailViolation, ResultLoader, build_report_manifest
from .seed_checks import EXPECTED_SEEDS, ensure_expected_seeds

__all__ = [
    "ReportConfig",
    "RunSet",
    "discover_runs",
    "aggregate_conditions",
    "paired_deltas",
    "render_markdown_tables",
    "write_metric_csv",
    "generate_report",
]

HEADLINE_METRICS = ("auroc", "auprc", "f1", "recall", "precision", "balanced_accuracy", "mcc")


@dataclass
class ReportConfig:
    exp_id: str
    title: str
    metrics: Sequence[str] = HEADLINE_METRICS
    primary_metric: str = "auroc"
    expected_seeds: Sequence[int] = EXPECTED_SEEDS
    required_curve_keys: Sequence[str] = ()
    enforce_curve_exports: bool = False
    comparisons: Sequence[Tuple[str, str]] = ()  # (baseline, contender) model pairs
    strict: bool = True
    # condition = how runs are grouped beyond model (e.g. subset percent)
    condition_fn: Optional[Callable[[CommonRun], Optional[str]]] = None
    extra_sections: Sequence[Callable[["RunSet"], List[str]]] = ()


@dataclass
class RunSet:
    config: ReportConfig
    runs: Dict[str, Dict[int, CommonRun]] = field(default_factory=dict)  # condition → seed → run
    n_resamples: int = 2000  # bootstrap budget shared by the extra sections

    def conditions(self) -> List[str]:
        return sorted(self.runs)

    def add(self, condition: str, run: CommonRun) -> None:
        if run.seed is None:
            raise GuardrailViolation(f"Run {run.metrics_path} has no resolvable seed")
        bucket = self.runs.setdefault(condition, {})
        if run.seed in bucket:
            raise GuardrailViolation(
                f"Duplicate seed {run.seed} for condition {condition!r}: "
                f"{run.metrics_path} vs {bucket[run.seed].metrics_path}"
            )
        bucket[run.seed] = run


def _default_condition(run: CommonRun) -> Optional[str]:
    return run.model


def discover_runs(
    runs_root: str | Path,
    config: ReportConfig,
    *,
    pattern: str = "**/*.metrics.json",
    validate: bool = True,
) -> RunSet:
    """Find and guardrail-validate every run under ``runs_root``.

    ``*_last.metrics.json`` files are preferred over plain ``.metrics.json``
    siblings for the same stem (reference ``reporting_inputs.py:59-98``).
    """
    runs_root = Path(runs_root)
    loader = ResultLoader(
        config.exp_id,
        required_curve_keys=config.required_curve_keys,
        strict=config.strict,
        enforce_curve_exports=config.enforce_curve_exports,
    )
    candidates = sorted(runs_root.glob(pattern))
    chosen: Dict[str, Path] = {}
    for path in candidates:
        name = path.name
        if name.endswith("_last.metrics.json"):
            stem = name[: -len("_last.metrics.json")]
            chosen[str(path.parent / stem)] = path
        elif name.endswith(".metrics.json"):
            stem = name[: -len(".metrics.json")]
            chosen.setdefault(str(path.parent / stem), path)

    run_set = RunSet(config=config)
    condition_fn = config.condition_fn or _default_condition
    for path in sorted(chosen.values()):
        run = load_common_run(path)
        if validate:
            loader.validate(path, run.payload)
        condition = condition_fn(run)
        if condition is None:
            raise GuardrailViolation(f"Cannot derive a condition for {path}")
        run_set.add(condition, run)
    return run_set


def check_seeds(run_set: RunSet) -> None:
    ensure_expected_seeds(
        {cond: seeds for cond, seeds in run_set.runs.items()},
        run_set.config.expected_seeds,
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

AUDIT_TOLERANCE = 5e-3


def recompute_primary_metrics(run: CommonRun) -> Optional[Dict[str, float]]:
    """Headline metrics recomputed from the run's exported outputs CSV.

    The reference reporters rebuild their tables from ``*_test_outputs.csv``
    (``exp4_report.py:376-403``) so every number is auditable against the
    artifacts; the declared ``test_primary`` block is only trusted after it
    agrees with the frames within :data:`AUDIT_TOLERANCE`.
    """
    if not run.frames:
        return None
    probs = np.asarray([f.prob for f in run.frames], dtype=float)
    labels = np.asarray([f.label for f in run.frames], dtype=int)
    tau = run.primary_tau if run.primary_tau is not None else 0.5
    recomputed = compute_binary_metrics(probs, labels, tau)
    declared = run.payload.get("test_primary") or {}
    for key, value in recomputed.items():
        stated = declared.get(key)
        if (
            isinstance(stated, (int, float))
            and math.isfinite(float(stated))
            and math.isfinite(float(value))
            and abs(float(stated) - float(value)) > AUDIT_TOLERANCE
        ):
            raise GuardrailViolation(
                f"{run.metrics_path}: test_primary.{key}={float(stated):.6f} disagrees "
                f"with the outputs CSV recomputation {float(value):.6f}"
            )
    return recomputed


def aggregate_conditions(run_set: RunSet) -> Dict[str, Dict[str, Dict[str, float]]]:
    """{condition: {metric: {mean, std, min, max, n}}} over seeds.

    Values are recomputed from each run's outputs CSV when frames are
    available (and cross-checked against the declared block); runs without
    exported frames fall back to the validated ``test_primary`` numbers.
    """
    out: Dict[str, Dict[str, Dict[str, float]]] = {}
    for condition, seed_map in run_set.runs.items():
        metric_values: Dict[str, List[float]] = {}
        for run in seed_map.values():
            block = recompute_primary_metrics(run) or run.payload.get("test_primary") or {}
            for metric in run_set.config.metrics:
                value = block.get(metric)
                if isinstance(value, (int, float)) and math.isfinite(float(value)):
                    metric_values.setdefault(metric, []).append(float(value))
        out[condition] = {
            metric: {
                "mean": float(np.mean(vals)),
                "std": float(np.std(vals, ddof=1)) if len(vals) > 1 else 0.0,
                "min": float(np.min(vals)),
                "max": float(np.max(vals)),
                "n": len(vals),
            }
            for metric, vals in metric_values.items()
        }
    return out


def frame_sample_of(run: CommonRun) -> FrameSample:
    """Build a cluster-aware bootstrap sample from a run's exported frames."""
    if not run.frames:
        raise GuardrailViolation(f"Run {run.metrics_path} has no outputs CSV frames")
    probs = [f.prob for f in run.frames]
    labels = [f.label for f in run.frames]
    cases = [f.case_id or f.sequence_id or f.frame_id for f in run.frames]
    tau = run.primary_tau if run.primary_tau is not None else 0.5
    return FrameSample.build(probs, labels, cases, tau)


def paired_deltas(
    run_set: RunSet,
    *,
    metrics: Sequence[str] = ("auroc", "f1"),
    n_resamples: int = 2000,
) -> Dict[Tuple[str, str], Dict[str, Any]]:
    """True-metric cluster-bootstrap paired deltas per configured comparison.

    Each replicate resamples case clusters and recomputes the actual metric
    (AUROC via ranks, threshold metrics at the run's τ) — not a per-frame
    proxy — matching the reference's delta machinery
    (``exp4_report.py:913-1007``).
    """
    comparisons = run_set.config.comparisons
    if not comparisons:
        return {}

    results: Dict[Tuple[str, str], Dict[str, Any]] = {}
    for baseline, contender in comparisons:
        if baseline not in run_set.runs or contender not in run_set.runs:
            continue
        samples: Dict[str, Dict[int, FrameSample]] = {}
        for condition in (baseline, contender):
            samples[condition] = {
                seed: frame_sample_of(run)
                for seed, run in run_set.runs[condition].items()
            }
        boot = FrameBootstrapper(samples, n_resamples=n_resamples)
        results[(baseline, contender)] = {
            "metrics": {
                metric: boot.paired_delta(baseline, contender, metric=metric).as_dict()
                for metric in metrics
            },
        }
    return results


# ---------------------------------------------------------------------------
# Rendering
# ---------------------------------------------------------------------------

def render_markdown_tables(
    run_set: RunSet,
    aggregates: Mapping[str, Mapping[str, Mapping[str, float]]],
    deltas: Mapping[Tuple[str, str], Mapping[str, Any]],
) -> str:
    config = run_set.config
    lines: List[str] = [f"# {config.title}", ""]
    lines.append(f"Experiment: `{config.exp_id}` — {len(run_set.runs)} conditions, "
                 f"seeds {list(config.expected_seeds)}")
    lines.append("")

    metrics = list(config.metrics)
    lines.append("## Test metrics (mean ± std over seeds)")
    lines.append("")
    lines.append("| condition | " + " | ".join(metrics) + " |")
    lines.append("|" + "---|" * (len(metrics) + 1))
    for condition in run_set.conditions():
        cells = []
        for metric in metrics:
            stats = aggregates.get(condition, {}).get(metric)
            if not stats:
                cells.append("—")
            else:
                cells.append(f"{format_value(stats['mean'])} ± {format_value(stats['std'])}")
        lines.append(f"| {condition} | " + " | ".join(cells) + " |")
    lines.append("")

    if deltas:
        lines.append("## Paired deltas (true-metric cluster bootstrap, 95% CI)")
        lines.append("")
        lines.append("| baseline | contender | metric | Δ | 95% CI |")
        lines.append("|---|---|---|---|---|")
        for (baseline, contender), info in deltas.items():
            for metric, delta in info["metrics"].items():
                lines.append(
                    f"| {baseline} | {contender} | {metric} | "
                    f"{format_delta(delta['mean'])} | "
                    f"[{format_value(delta['ci_lower'])}, {format_value(delta['ci_upper'])}] |"
                )
        lines.append("")

    for section in config.extra_sections:
        lines.extend(section(run_set))
    return "\n".join(lines) + "\n"


def write_metric_csv(
    path: Path,
    aggregates: Mapping[str, Mapping[str, Mapping[str, float]]],
    metrics: Sequence[str],
) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as handle:
        writer = csv.writer(handle)
        writer.writerow(["condition", "metric", "mean", "std", "min", "max", "n"])
        for condition in sorted(aggregates):
            for metric in metrics:
                stats = aggregates[condition].get(metric)
                if not stats:
                    continue
                writer.writerow([
                    condition, metric,
                    stats["mean"], stats["std"], stats["min"], stats["max"], stats["n"],
                ])
    return path


def generate_report(
    runs_root: str | Path,
    config: ReportConfig,
    output_dir: str | Path,
    *,
    check_seed_protocol: bool = True,
    delta_metrics: Sequence[str] = ("auroc", "f1"),
    n_resamples: int = 2000,
) -> Dict[str, Any]:
    """Full pipeline: discover → validate → aggregate → render → manifest."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    run_set = discover_runs(runs_root, config)
    run_set.n_resamples = int(n_resamples)
    if check_seed_protocol:
        check_seeds(run_set)
    aggregates = aggregate_conditions(run_set)
    deltas = paired_deltas(run_set, metrics=delta_metrics, n_resamples=n_resamples)

    markdown = render_markdown_tables(run_set, aggregates, deltas)
    md_path = output_dir / f"{config.exp_id}_report.md"
    md_path.write_text(markdown, encoding="utf-8")
    csv_path = write_metric_csv(
        output_dir / f"{config.exp_id}_metrics.csv", aggregates, config.metrics
    )

    runs_flat = [
        {
            "condition": condition,
            "seed": seed,
            "metrics_path": str(run.metrics_path),
        }
        for condition, seeds in run_set.runs.items()
        for seed, run in seeds.items()
    ]
    manifest = build_report_manifest(
        config.exp_id,
        runs=runs_flat,
        outputs=[md_path, csv_path],
        extra={
            "deltas": {
                f"{a}->{b}": info["metrics"] for (a, b), info in deltas.items()
            },
        },
    )
    manifest_path = output_dir / f"{config.exp_id}_manifest.json"
    manifest_path.write_text(json.dumps(manifest, indent=2, default=str), encoding="utf-8")
    return {
        "markdown": md_path,
        "csv": csv_path,
        "manifest": manifest_path,
        "aggregates": aggregates,
        "deltas": deltas,
        "run_set": run_set,
    }
