"""Checkpoint save/load, pointers and retention."""

import jax.numpy as jnp
import numpy as np

from ssl4polyp_tpu.utils.checkpoint import (
    cleanup_checkpoints,
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
    update_pointer,
)


def test_roundtrip(tmp_path):
    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "opt": {"step": jnp.asarray(7), "mu": {"w": jnp.ones((2, 3))}},
    }
    meta = {"epoch": 3, "monitor": 0.5}
    path = save_checkpoint(tmp_path / "ck.ckpt", payload, meta)
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["payload"]["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert restored["meta"]["epoch"] == 3
    assert load_checkpoint_meta(path)["monitor"] == 0.5


def test_pointer(tmp_path):
    a = save_checkpoint(tmp_path / "a.ckpt", {"x": jnp.ones(2)}, {"tag": "a"})
    pointer = tmp_path / "last.ckpt"
    update_pointer(pointer, a)
    assert load_checkpoint(pointer)["meta"]["tag"] == "a"
    b = save_checkpoint(tmp_path / "b.ckpt", {"x": jnp.zeros(2)}, {"tag": "b"})
    update_pointer(pointer, b)
    assert load_checkpoint(pointer)["meta"]["tag"] == "b"


def test_retention(tmp_path):
    for epoch in range(10):
        save_checkpoint(tmp_path / f"checkpoint-{epoch}.ckpt", {"e": jnp.asarray(epoch)}, {})
    removed = cleanup_checkpoints(tmp_path, keep_last=2, keep_every_n_epochs=4)
    kept = sorted(p.name for p in tmp_path.glob("checkpoint-*.ckpt"))
    # Milestones use the 1-based completed-epoch convention so they align
    # with the engine's (epoch+1) % save_freq save cadence (epoch%N==0
    # would never match a saved epoch at the paper settings and every
    # milestone would be deleted).
    assert kept == [
        "checkpoint-3.ckpt",  # milestone: 4 epochs completed
        "checkpoint-7.ckpt",  # milestone: 8 epochs completed
        "checkpoint-8.ckpt",  # last-2
        "checkpoint-9.ckpt",  # last-2
    ]
    assert len(removed) == 6


def test_async_checkpointer_roundtrip_and_ordering(tmp_path):
    """AsyncCheckpointer writes the same document as save_checkpoint; the
    pointer and retention callback run AFTER the atomic rename."""
    from ssl4polyp_tpu.utils.checkpoint import AsyncCheckpointer

    saver = AsyncCheckpointer()
    events = []

    def cleanup():
        # the committed file must already exist when cleanup runs
        events.append((tmp_path / "ck-1.ckpt").exists())

    payload = {"params": {"w": jnp.arange(4.0)}}
    saver.save(tmp_path / "ck-1.ckpt", payload, {"epoch": 1},
               pointer=tmp_path / "last.ckpt", cleanup=cleanup)
    saver.wait()
    assert events == [True]
    assert (tmp_path / "last.ckpt").exists()
    restored = load_checkpoint(tmp_path / "last.ckpt")
    np.testing.assert_array_equal(restored["payload"]["params"]["w"], np.arange(4.0))
    assert restored["meta"]["epoch"] == 1
    assert saver.last_write_seconds is not None
    # no stray tmp files after a completed save
    assert not list(tmp_path.glob("*.tmp"))


def test_async_checkpointer_snapshot_isolation(tmp_path):
    """Mutating the source tree after save() must not affect the write —
    the host snapshot is taken synchronously inside save()."""
    from ssl4polyp_tpu.utils import checkpoint as ck

    saver = ck.AsyncCheckpointer()
    arr = np.arange(5.0)
    ck._WRITE_DELAY_S = 0.2
    try:
        saver.save(tmp_path / "c.ckpt", {"params": {"w": arr}}, {})
        arr += 100.0  # raced mutation
        saver.wait()
    finally:
        ck._WRITE_DELAY_S = 0.0
    restored = load_checkpoint(tmp_path / "c.ckpt")
    np.testing.assert_array_equal(restored["payload"]["params"]["w"], np.arange(5.0))


def test_async_checkpointer_error_propagates(tmp_path):
    from ssl4polyp_tpu.utils.checkpoint import AsyncCheckpointer

    saver = AsyncCheckpointer()
    saver.save(tmp_path / "x.ckpt", {"bad": object()}, {})  # unserializable
    import pytest

    with pytest.raises(Exception):
        saver.wait()
    # the error is cleared after surfacing; the saver stays usable
    saver.save(tmp_path / "y.ckpt", {"params": {"w": jnp.ones(1)}}, {})
    saver.wait()
    assert (tmp_path / "y.ckpt").exists()


def test_async_crash_safety(tmp_path):
    """A process killed mid-write leaves the previous checkpoint AND the
    pointer intact (the atomic rename is the commit point) — VERDICT r4
    item 6's crash-safety requirement."""
    import os
    import subprocess
    import sys
    import time

    child = f"""
import os, sys, time
import numpy as np
from ssl4polyp_tpu.utils import checkpoint as ck

out = {str(tmp_path)!r}
ck.save_checkpoint(os.path.join(out, "checkpoint-1.ckpt"),
                   {{"params": {{"w": np.arange(3.0)}}}}, {{"epoch": 1}})
ck.update_pointer(os.path.join(out, "last.ckpt"),
                  os.path.join(out, "checkpoint-1.ckpt"))
ck._WRITE_DELAY_S = 60.0  # park the writer between .tmp and the rename
saver = ck.AsyncCheckpointer()
saver.save(os.path.join(out, "checkpoint-2.ckpt"),
           {{"params": {{"w": np.arange(3.0) + 1}}}}, {{"epoch": 2}},
           pointer=os.path.join(out, "last.ckpt"))
time.sleep(1.0)  # let the thread write the .tmp
print("MIDWRITE", flush=True)
sys.stdout.flush()
os._exit(1)  # hard crash mid-save
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-c", child], cwd="/root/repo", env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=300,
    )
    assert "MIDWRITE" in result.stdout, result.stdout
    assert result.returncode == 1
    # checkpoint-2 never committed; its tmp may linger
    assert not (tmp_path / "checkpoint-2.ckpt").exists()
    # the previous checkpoint and the pointer are intact and loadable
    restored = load_checkpoint(tmp_path / "last.ckpt")
    assert restored["meta"]["epoch"] == 1
    np.testing.assert_array_equal(restored["payload"]["params"]["w"], np.arange(3.0))


def test_pretrain_sync_vs_async_same_artifacts(tmp_path):
    """async_checkpoint=False/True produce identical checkpoint documents
    (same snapshot semantics, different write scheduling)."""
    from tests.test_pretrain import patch_tiny_model, tiny_settings

    import pytest

    class MP:
        def __init__(self):
            self._undo = []

        def setattr(self, obj, name, value):
            self._undo.append((obj, name, getattr(obj, name)))
            setattr(obj, name, value)

        def undo(self):
            for obj, name, value in reversed(self._undo):
                setattr(obj, name, value)

    from PIL import Image

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(frames / f"f_{i:02d}.jpg", quality=90)

    from ssl4polyp_tpu.training.pretrain import run_pretraining

    mp = MP()
    patch_tiny_model(mp)
    try:
        s_sync = tiny_settings(frames, tmp_path / "sync", epochs=1,
                               batch_size=8, num_workers=1,
                               async_checkpoint=False)
        run_pretraining(s_sync)
        s_async = tiny_settings(frames, tmp_path / "async", epochs=1,
                                batch_size=8, num_workers=1,
                                async_checkpoint=True)
        run_pretraining(s_async)
    finally:
        mp.undo()

    from pathlib import Path

    a = load_checkpoint(Path(s_sync.output_dir) / "ckpts" / "checkpoint-0.ckpt")
    b = load_checkpoint(Path(s_async.output_dir) / "ckpts" / "checkpoint-0.ckpt")
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(a["payload"]["params"]),
                    jax.tree_util.tree_leaves(b["payload"]["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert a["meta"]["epoch"] == b["meta"]["epoch"] == 0
