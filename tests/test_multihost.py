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
