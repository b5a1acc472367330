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
