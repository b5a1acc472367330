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

from .bootstrapper import Bootstrapper
from .common import CommonRun, load_common_run
from .display import format_delta, format_value
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

def aggregate_conditions(run_set: RunSet) -> Dict[str, Dict[str, Dict[str, float]]]:
    """{condition: {metric: {mean, std, min, max, n}}} over seeds from the
    validated ``test_primary`` blocks."""
    out: Dict[str, Dict[str, Dict[str, float]]] = {}
    for condition, seed_map in run_set.runs.items():
        metric_values: Dict[str, List[float]] = {}
        for run in seed_map.values():
            block = run.payload.get("test_primary") or {}
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


def _frame_arrays(run: CommonRun) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    if not run.frames:
        raise GuardrailViolation(f"Run {run.metrics_path} has no outputs CSV frames")
    probs = np.asarray([f.prob for f in run.frames], dtype=float)
    labels = np.asarray([f.label for f in run.frames], dtype=int)
    cases = [f.case_id or f.sequence_id or f.frame_id for f in run.frames]
    return probs, labels, cases


def paired_deltas(
    run_set: RunSet,
    *,
    metric: str = "f1",
    n_resamples: int = 2000,
) -> Dict[Tuple[str, str], Dict[str, Any]]:
    """Cluster-bootstrap paired deltas for each configured comparison.

    For threshold metrics, the per-frame value is the correctness indicator
    at the run's primary τ; case-level clusters resample together.
    """
    comparisons = run_set.config.comparisons
    if not comparisons:
        return {}

    def frame_scores(run: CommonRun) -> Tuple[np.ndarray, List[str]]:
        probs, labels, cases = _frame_arrays(run)
        tau = run.primary_tau if run.primary_tau is not None else 0.5
        if metric == "auroc":
            # rank-based per-frame contribution is ill-defined; use prob error
            values = 1.0 - np.abs(labels - probs)
        else:
            preds = (probs >= tau).astype(int)
            values = (preds == labels).astype(float)
        return values, cases

    results: Dict[Tuple[str, str], Dict[str, Any]] = {}
    for baseline, contender in comparisons:
        if baseline not in run_set.runs or contender not in run_set.runs:
            continue
        metrics_map: Dict[str, Dict[int, Sequence[float]]] = {}
        clusters_map: Dict[str, Dict[int, Sequence[str]]] = {}
        for condition in (baseline, contender):
            metrics_map[condition] = {}
            clusters_map[condition] = {}
            for seed, run in run_set.runs[condition].items():
                values, cases = frame_scores(run)
                metrics_map[condition][seed] = values
                clusters_map[condition][seed] = cases
        boot = Bootstrapper(metrics_map, clusters=clusters_map, n_resamples=n_resamples)
        delta = boot.paired_delta(baseline, contender)
        results[(baseline, contender)] = {
            "metric": metric,
            "delta": delta.as_dict(),
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
        lines.append("## Paired deltas (cluster bootstrap, 95% CI)")
        lines.append("")
        lines.append("| baseline | contender | metric | Δ | 95% CI |")
        lines.append("|---|---|---|---|---|")
        for (baseline, contender), info in deltas.items():
            delta = info["delta"]
            lines.append(
                f"| {baseline} | {contender} | {info['metric']} | "
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
    delta_metric: str = "f1",
    n_resamples: int = 2000,
) -> Dict[str, Any]:
    """Full pipeline: discover → validate → aggregate → render → manifest."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    run_set = discover_runs(runs_root, config)
    if check_seed_protocol:
        check_seeds(run_set)
    aggregates = aggregate_conditions(run_set)
    deltas = paired_deltas(run_set, metric=delta_metric, n_resamples=n_resamples)

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
                f"{a}->{b}": info["delta"] for (a, b), info in deltas.items()
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
