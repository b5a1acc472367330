"""Per-experiment report definitions (exp1–exp5c) over the shared core.

Each experiment contributes its grouping rule, comparison pairs and extra
sections; everything else (discovery, guardrails, seed checks, bootstrap,
rendering) comes from :mod:`.report_core`.  Reference counterparts:
``analysis/exp{1,2,3,4,5a,5b,5c}_report.py``.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from .common import CommonRun
from .display import format_delta, format_value
from .report_core import ReportConfig, RunSet, generate_report

__all__ = ["REPORTS", "build_report_config", "run_report", "main"]


def _model_of(run: CommonRun) -> Optional[str]:
    return run.model


def _subset_condition(run: CommonRun) -> Optional[str]:
    provenance = run.payload.get("provenance") or {}
    percent = provenance.get("subset_percent", 100)
    model = run.model or "model"
    return f"{model}@p{int(float(percent))}"


def _fewshot_condition(run: CommonRun) -> Optional[str]:
    provenance = run.payload.get("provenance") or {}
    budget = provenance.get("fewshot_budget")
    model = run.model or "model"
    return f"{model}@s{budget}" if budget is not None else model


# ---------------------------------------------------------------------------
# Extra sections
# ---------------------------------------------------------------------------

def _morphology_section(run_set: RunSet) -> List[str]:
    """exp3: per-stratum (flat/polypoid) metric table averaged over seeds."""
    lines = ["## Morphology strata", ""]
    header_written = False
    for condition in run_set.conditions():
        strata_acc: Dict[str, Dict[str, List[float]]] = {}
        for run in run_set.runs[condition].values():
            morphology = run.payload.get("test_morphology") or {}
            for stratum, block in morphology.items():
                for metric in ("recall", "f1", "auroc", "balanced_accuracy"):
                    value = block.get(metric)
                    if isinstance(value, (int, float)) and math.isfinite(float(value)):
                        strata_acc.setdefault(stratum, {}).setdefault(metric, []).append(float(value))
        if not strata_acc:
            continue
        if not header_written:
            lines.append("| condition | stratum | recall | f1 | auroc | balanced_accuracy |")
            lines.append("|---|---|---|---|---|---|")
            header_written = True
        for stratum in sorted(strata_acc):
            cells = [
                format_value(float(np.mean(strata_acc[stratum][m])))
                if m in strata_acc[stratum] else "—"
                for m in ("recall", "f1", "auroc", "balanced_accuracy")
            ]
            lines.append(f"| {condition} | {stratum} | " + " | ".join(cells) + " |")
    lines.append("")
    return lines if header_written else []


def _learning_curve_section(run_set: RunSet) -> List[str]:
    """exp4: AUROC learning curve over subset percents + AULC per model."""
    by_model: Dict[str, Dict[int, List[float]]] = {}
    for condition, seeds in run_set.runs.items():
        if "@p" not in condition:
            continue
        model, percent_token = condition.rsplit("@p", 1)
        percent = int(percent_token)
        for run in seeds.values():
            value = (run.payload.get("test_primary") or {}).get("auroc")
            if isinstance(value, (int, float)) and math.isfinite(float(value)):
                by_model.setdefault(model, {}).setdefault(percent, []).append(float(value))
    if not by_model:
        return []
    percents = sorted({p for curves in by_model.values() for p in curves})
    lines = ["## Learning curves (test AUROC by train-subset percent)", ""]
    lines.append("| model | " + " | ".join(f"p{p}" for p in percents) + " | AULC |")
    lines.append("|" + "---|" * (len(percents) + 2))
    for model in sorted(by_model):
        curve = by_model[model]
        means = [
            float(np.mean(curve[p])) if p in curve else float("nan") for p in percents
        ]
        valid = [(p, m) for p, m in zip(percents, means) if math.isfinite(m)]
        if len(valid) >= 2:
            xs = np.log10([p for p, _ in valid])
            ys = [m for _, m in valid]
            aulc = float(np.trapezoid(ys, xs) / (xs[-1] - xs[0]))
        else:
            aulc = float("nan")
        lines.append(
            f"| {model} | " + " | ".join(format_value(m) for m in means)
            + f" | {format_value(aulc)} |"
        )
    lines.append("")
    return lines


def _retention_section(run_set: RunSet) -> List[str]:
    """exp5b: per-perturbation-tag F1 retention vs the clean subset."""
    lines = ["## Perturbation retention (F1 vs clean)", ""]
    any_rows = False
    for condition in run_set.conditions():
        tag_acc: Dict[str, List[float]] = {}
        clean_acc: List[float] = []
        for run in run_set.runs[condition].values():
            perturbations = (run.payload.get("test_perturbations") or {}).get("per_tag") or {}
            clean = perturbations.get("clean") or {}
            clean_f1 = clean.get("f1")
            if isinstance(clean_f1, (int, float)) and clean_f1:
                clean_acc.append(float(clean_f1))
            for tag, block in perturbations.items():
                value = block.get("f1")
                if isinstance(value, (int, float)) and math.isfinite(float(value)):
                    tag_acc.setdefault(tag, []).append(float(value))
        if not tag_acc or not clean_acc:
            continue
        if not any_rows:
            lines.append("| condition | tag | f1 | retention |")
            lines.append("|---|---|---|---|")
            any_rows = True
        clean_mean = float(np.mean(clean_acc))
        for tag in sorted(tag_acc):
            mean = float(np.mean(tag_acc[tag]))
            retention = mean / clean_mean if clean_mean else float("nan")
            lines.append(
                f"| {condition} | {tag} | {format_value(mean)} | "
                f"{format_value(retention)} |"
            )
    lines.append("")
    return lines if any_rows else []


def _zero_shot_section(run_set: RunSet) -> List[str]:
    """exp5c: zero-shot anchor vs fine-tuned few-shot results."""
    lines = ["## Zero-shot anchor vs fine-tuned", ""]
    rows = []
    for condition in run_set.conditions():
        zs_acc, ft_acc = [], []
        for run in run_set.runs[condition].values():
            zero_shot = run.payload.get("zero_shot") or {}
            zs_value = (zero_shot.get("metrics") or {}).get("auroc")
            ft_value = (run.payload.get("test_primary") or {}).get("auroc")
            if isinstance(zs_value, (int, float)) and math.isfinite(float(zs_value)):
                zs_acc.append(float(zs_value))
            if isinstance(ft_value, (int, float)) and math.isfinite(float(ft_value)):
                ft_acc.append(float(ft_value))
        if not ft_acc:
            continue
        zs_mean = float(np.mean(zs_acc)) if zs_acc else float("nan")
        ft_mean = float(np.mean(ft_acc))
        rows.append((condition, zs_mean, ft_mean))
    if not rows:
        return []
    lines.append("| condition | zero-shot AUROC | fine-tuned AUROC | Δ |")
    lines.append("|---|---|---|---|")
    for condition, zs_mean, ft_mean in rows:
        delta = ft_mean - zs_mean if math.isfinite(zs_mean) else float("nan")
        lines.append(
            f"| {condition} | {format_value(zs_mean)} | {format_value(ft_mean)} | "
            f"{format_delta(delta)} |"
        )
    lines.append("")
    return lines


# ---------------------------------------------------------------------------
# Experiment registry
# ---------------------------------------------------------------------------

def build_report_config(exp: str) -> ReportConfig:
    exp = exp.lower()
    if exp == "exp1":
        return ReportConfig(
            exp_id="exp1",
            title="Exp1 — SUP-imnet vs SSL-imnet on SUN-full",
            comparisons=(("SupImnet", "SslImnet"), ("sup_imnet", "ssl_imnet")),
            required_curve_keys=("test",),
        )
    if exp == "exp2":
        return ReportConfig(
            exp_id="exp2",
            title="Exp2 — SSL-colon vs SSL-imnet on SUN-full",
            comparisons=(("SslImnet", "SslColon"), ("ssl_imnet", "ssl_colon")),
        )
    if exp in {"exp3", "exp3b"}:
        return ReportConfig(
            exp_id="exp3b",
            title="Exp3 — morphology-stratified evaluation",
            extra_sections=(_morphology_section,),
        )
    if exp == "exp4":
        return ReportConfig(
            exp_id="exp4",
            title="Exp4 — data-efficiency learning curves",
            condition_fn=_subset_condition,
            extra_sections=(_learning_curve_section,),
        )
    if exp == "exp5a":
        return ReportConfig(
            exp_id="exp5a",
            title="Exp5a — zero-shot PolypGen transfer",
        )
    if exp == "exp5b":
        return ReportConfig(
            exp_id="exp5b",
            title="Exp5b — perturbation robustness",
            extra_sections=(_retention_section,),
        )
    if exp == "exp5c":
        return ReportConfig(
            exp_id="exp5c",
            title="Exp5c — few-shot PolypGen adaptation",
            condition_fn=_fewshot_condition,
            extra_sections=(_zero_shot_section,),
        )
    raise ValueError(f"Unknown experiment {exp!r}")


REPORTS = ("exp1", "exp2", "exp3", "exp4", "exp5a", "exp5b", "exp5c")


def run_report(
    exp: str,
    runs_root: str | Path,
    output_dir: str | Path,
    *,
    check_seed_protocol: bool = True,
    n_resamples: int = 2000,
) -> Dict[str, Any]:
    config = build_report_config(exp)
    return generate_report(
        runs_root, config, output_dir,
        check_seed_protocol=check_seed_protocol,
        n_resamples=n_resamples,
    )


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Generate an experiment report")
    parser.add_argument("experiment", choices=REPORTS)
    parser.add_argument("--runs-root", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--no-seed-check", action="store_true")
    parser.add_argument("--resamples", type=int, default=2000)
    args = parser.parse_args(argv)
    result = run_report(
        args.experiment, args.runs_root, args.output_dir,
        check_seed_protocol=not args.no_seed_check,
        n_resamples=args.resamples,
    )
    print(f"wrote {result['markdown']}")


if __name__ == "__main__":
    main()
