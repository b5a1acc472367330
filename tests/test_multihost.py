"""Multi-host semantics: host-0 I/O gating across every artifact writer.

The reference guards all sinks behind rank 0 (``util/misc.py:171``); here the
writers consult ``parallel.multihost.is_primary`` at call time, so mocking a
non-primary process must turn every disk write into a no-op while keeping
return values (paths, digests) host-consistent.
"""

import numpy as np
import pytest

from ssl4polyp_tpu.parallel import multihost


@pytest.fixture
def non_primary(monkeypatch):
    monkeypatch.setattr(multihost, "is_primary", lambda: False)


def test_save_checkpoint_skipped(tmp_path, non_primary):
    from ssl4polyp_tpu.utils.checkpoint import save_checkpoint, update_pointer

    target = tmp_path / "ck.ckpt"
    returned = save_checkpoint(target, {"params": {"w": np.zeros(2)}}, {"epoch": 0})
    assert returned == target
    assert not target.exists()
    update_pointer(tmp_path / "last.ckpt", target)
    assert not (tmp_path / "last.ckpt").exists()


def test_cleanup_skipped(tmp_path, non_primary):
    from ssl4polyp_tpu.utils.checkpoint import cleanup_checkpoints

    victim = tmp_path / "checkpoint-0.ckpt"
    victim.write_bytes(b"x")
    assert cleanup_checkpoints(tmp_path, keep_last=0) == []
    assert victim.exists()


def test_run_logger_silent(tmp_path, non_primary, capsys):
    from ssl4polyp_tpu.utils.logging import RunLogger

    logger = RunLogger(tmp_path / "runs", "stem")
    logger.text("hello")
    logger.json_line({"a": 1})
    logger.scalar("x", 1.0, 0)
    logger.close()
    assert not (tmp_path / "runs").exists()
    assert capsys.readouterr().out == ""


def test_exports_digest_without_write(tmp_path, non_primary):
    from ssl4polyp_tpu.evaluation import exports

    result = exports.export_frame_outputs(
        tmp_path / "out.csv",
        metadata_rows=[{"frame_id": "f0", "case_id": "c0"}],
        probabilities=[0.7],
        targets=[1],
        preds=[1],
    )
    assert not result.path.exists()
    assert len(result.sha256) == 64

    curve = exports.export_curve_sets(
        tmp_path / "stem", "test",
        probabilities=np.asarray([0.1, 0.9]),
        targets=np.asarray([0, 1]),
        grid_points=5,
    )
    assert not (tmp_path / "stem_test_roc_curve.csv").exists()
    assert len(curve["sha256"]) == 64 and len(curve["pr_sha256"]) == 64


def test_exports_digest_matches_written_file(tmp_path):
    # On the primary host the returned digest must equal the on-disk bytes.
    from ssl4polyp_tpu.evaluation import exports

    result = exports.export_frame_outputs(
        tmp_path / "out.csv",
        metadata_rows=[{"frame_id": "f0", "case_id": "c0"}],
        probabilities=[0.7],
        targets=[1],
        preds=[1],
    )
    assert result.path.exists()
    assert exports.sha256_file(result.path) == result.sha256


def test_thresholds_and_snapshot_skipped(tmp_path, non_primary):
    from ssl4polyp_tpu.configs.manifests import snapshot_provenance
    from ssl4polyp_tpu.metrics.thresholds import save_thresholds

    save_thresholds(tmp_path / "tau.json", {"k": 0.5})
    assert not (tmp_path / "tau.json").exists()

    snapshot_provenance(tmp_path / "snap", [], None, None)
    assert not (tmp_path / "snap").exists()


def test_engines_initialize_multihost():
    # The three CLIs must call initialize_multihost (SURVEY §2.8: DCN init
    # replaces the reference's env:// rendezvous).
    import inspect

    from ssl4polyp_tpu.evaluation import eval_classification
    from ssl4polyp_tpu.training import classification, hyperkvasir, pretrain

    assert "initialize_multihost" in inspect.getsource(classification.cli_main)
    assert "initialize_multihost" in inspect.getsource(pretrain.cli_main)
    assert "initialize_multihost" in inspect.getsource(eval_classification.cli_main)
    assert "initialize_multihost" in inspect.getsource(hyperkvasir.main)


_TWO_PROC_SCRIPT = r"""
import json, os, sys

import numpy as np

# Env (JAX_PLATFORMS / XLA_FLAGS / JAX_* coordinates) is set by the parent
# BEFORE interpreter start so the backend and the distributed runtime both
# pick it up; initialize_multihost() must discover everything from env.
from ssl4polyp_tpu.parallel.multihost import (
    initialize_multihost, is_primary, process_info,
)

initialize_multihost()
info = process_info()
pid = info["process_index"]
assert info["process_count"] == 2, info
assert info["global_devices"] == 2 * info["local_devices"], info
assert is_primary() == (pid == 0), (pid, is_primary())

# The evaluate.py gather contract (evaluation/evaluate.py:205-220): each
# process holds a disjoint loader stripe padded to a fixed shape with
# valid=False rows; after process_allgather + valid-filter every process
# must hold the identical full frame set.
from jax.experimental import multihost_utils

stripe = np.arange(pid * 3, pid * 3 + 3, dtype=np.int32)      # positions
logits = stripe.astype(np.float32) * 0.5
valid = np.array([True, True, pid == 0])                      # pad on pid 1
logits, stripe, valid = (
    np.reshape(multihost_utils.process_allgather(a), (-1, *a.shape[1:]))
    for a in (logits, stripe, valid)
)
kept = stripe[valid]
kept_logits = logits[valid]
assert sorted(kept.tolist()) == [0, 1, 2, 3, 4], kept
assert np.allclose(kept_logits, kept * 0.5), (kept_logits, kept)
print(json.dumps({"pid": pid, "primary": is_primary(),
                  "frames": sorted(kept.tolist())}))
"""


def test_two_process_gather_contract(tmp_path):
    """Spawn two REAL processes over the Gloo CPU backend: env-driven
    initialize_multihost, primary gating, and the padded-stripe
    process_allgather round trip used by the eval engine."""
    import json
    import socket
    import subprocess
    import sys

    script = tmp_path / "worker.py"
    script.write_text(_TWO_PROC_SCRIPT)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(
            **{k: v for k, v in __import__("os").environ.items()
               if not k.startswith(("JAX_", "XLA_"))},
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        repo_root = __import__("pathlib").Path(__file__).resolve().parents[1]
        env["PYTHONPATH"] = str(repo_root)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["pid"] for o in outs} == {0, 1}
    for o in outs:
        assert o["primary"] == (o["pid"] == 0)
        assert o["frames"] == [0, 1, 2, 3, 4]
