"""reporting_inputs staging + aggregate_metrics script tests."""

import json
import subprocess
import sys
from pathlib import Path

from ssl4polyp_tpu.utils.reporting_inputs import select_metrics_files, stage_reporting_inputs


def make_run(run_dir: Path, stem: str, last: bool = False):
    run_dir.mkdir(parents=True, exist_ok=True)
    suffix = "_last.metrics.json" if last else ".metrics.json"
    payload = {"seed": 13, "test_primary": {"auroc": 0.9, "f1": 0.8}}
    (run_dir / f"{stem}{suffix}").write_text(json.dumps(payload))
    (run_dir / f"{stem}_test_outputs.csv").write_text("frame_id,prob,label,pred\nf0,0.9,1,1\n")
    return run_dir / f"{stem}{suffix}"


def test_select_prefers_last(tmp_path):
    make_run(tmp_path, "ModelA_SUN_s13")
    last = make_run(tmp_path, "ModelA_SUN_s13", last=True)
    selected = select_metrics_files(tmp_path)
    assert selected == [last]


def test_staging_copies_companions(tmp_path):
    runs = tmp_path / "runs"
    make_run(runs / "sun_baselines", "ModelA_SUN_s13")
    make_run(runs / "sun_baselines", "ModelA_SUN_s29")
    copied = stage_reporting_inputs(runs, tmp_path / "results", "exp1_inputs")
    dest = tmp_path / "results" / "reporting_inputs" / "exp1_inputs"
    names = sorted(p.name for p in dest.rglob("*") if p.is_file())
    assert "ModelA_SUN_s13.metrics.json" in names
    assert "ModelA_SUN_s13_test_outputs.csv" in names
    assert len(copied) == 4


def test_aggregate_metrics_script(tmp_path):
    for seed, auroc in ((13, 0.9), (29, 0.92), (47, 0.88)):
        make_run(tmp_path / f"s{seed}", f"M_SUN_s{seed}")
        path = tmp_path / f"s{seed}" / f"M_SUN_s{seed}.metrics.json"
        path.write_text(json.dumps({"seed": seed, "test_primary": {"auroc": auroc}}))
    result = subprocess.run(
        [sys.executable, "scripts/aggregate_metrics.py", str(tmp_path)],
        capture_output=True, text=True, check=True, cwd=Path(__file__).parent.parent,
    )
    payload = json.loads(result.stdout)
    assert payload["n_files"] == 3
    assert abs(payload["metrics"]["auroc"]["mean"] - 0.9) < 1e-9
    assert "ci_lower" in payload["metrics"]["auroc"]
