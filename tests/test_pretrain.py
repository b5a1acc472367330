"""MAE pretraining engine: smoke run on the 8-device CPU mesh + resume."""

import json
from pathlib import Path

import numpy as np
import pytest

from ssl4polyp_tpu.training.pretrain import PretrainSettings, run_pretraining


@pytest.fixture
def image_folder(tmp_path):
    from PIL import Image

    root = tmp_path / "frames"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(32):
        array = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(array).save(root / f"frame_{i:03d}.jpg", quality=90)
    return root


def tiny_settings(image_folder, tmp_path, **overrides):
    defaults = dict(
        data_root=str(image_folder),
        output_dir=str(tmp_path / "out"),
        epochs=2,
        warmup_epochs=1,
        batch_size=16,
        accum_iter=2,
        image_size=32,
        num_workers=2,
        log_interval=1,
        save_freq_epochs=1,
        keep_last=3,
        keep_every_n_epochs=None,
        no_train_dir=True,
        precision="fp32",
        seed=5,
    )
    defaults.update(overrides)
    return PretrainSettings(**defaults)


def patch_tiny_model(monkeypatch):
    """Swap the ViT-B preset for a tiny model to keep the test fast."""
    import jax.numpy as jnp

    from ssl4polyp_tpu.models.mae import MAEConfig
    from ssl4polyp_tpu.models.vit import ViTConfig
    from ssl4polyp_tpu.training import pretrain as pt

    tiny = MAEConfig(
        encoder=ViTConfig(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            compute_dtype=jnp.float32,
        ),
        decoder_embed_dim=16,
        decoder_depth=1,
        decoder_num_heads=2,
    )
    monkeypatch.setattr(
        pt, "model_config", lambda settings: tiny
    )


def test_pretrain_smoke(image_folder, tmp_path, monkeypatch):
    patch_tiny_model(monkeypatch)
    settings = tiny_settings(image_folder, tmp_path)
    summary = run_pretraining(settings)
    assert summary["epoch"] == 1
    assert np.isfinite(summary["train_loss"])

    out = Path(settings.output_dir)
    ckpts = sorted((out / "ckpts").glob("checkpoint-*.ckpt"))
    assert [c.name for c in ckpts] == ["checkpoint-0.ckpt", "checkpoint-1.ckpt"]
    assert (out / "ckpts" / "last.ckpt").exists()
    lines = [json.loads(l) for l in (out / "pretrain.jsonl").read_text().splitlines()]
    assert [l["epoch"] for l in lines] == [0, 1]
    # loss should decrease epoch over epoch on this tiny overfit problem
    assert lines[1]["train_loss"] <= lines[0]["train_loss"] * 1.5


def test_pretrain_auto_resume(image_folder, tmp_path, monkeypatch):
    patch_tiny_model(monkeypatch)
    settings = tiny_settings(image_folder, tmp_path, epochs=1)
    run_pretraining(settings)
    # Continue for one more epoch via auto-resume
    settings2 = tiny_settings(image_folder, tmp_path, epochs=2, resume="auto")
    summary = run_pretraining(settings2)
    assert summary["epoch"] == 1
    out = Path(settings.output_dir)
    lines = [json.loads(l) for l in (out / "pretrain.jsonl").read_text().splitlines()]
    epochs = [l["epoch"] for l in lines]
    assert epochs == [0, 1]  # epoch 0 from first run, epoch 1 after resume
