"""Offline AugReg fetch-and-cache workflow (scripts/fetch_augreg.py).

The reference downloads the SUP-imnet ``.npz`` lazily with a torch-hub
cache (``models.py:52-55,225``); egress-free TPU hosts split that into an
offline fetch + shipped cache.  Covered here: structural verification, the
cache-path convention, and the factory's ``pretrained_npz="auto"`` hook.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "fetch_augreg.py"


def _load_module():
    spec = importlib.util.spec_from_file_location("fetch_augreg", SCRIPT)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _write_fake_augreg(path, *, good=True):
    arrays = {
        "embedding/kernel": np.zeros((16, 16, 3, 768), np.float32),
        "embedding/bias": np.zeros((768,), np.float32),
        "cls": np.zeros((1, 1, 768), np.float32),
        "Transformer/posembed_input/pos_embedding": np.zeros((1, 197, 768), np.float32),
        "Transformer/encoder_norm/scale": np.ones((768,), np.float32),
        "Transformer/encoderblock_0/LayerNorm_0/scale": np.ones((768,), np.float32),
        "Transformer/encoderblock_11/MlpBlock_3/Dense_1/kernel":
            np.zeros((3072, 768), np.float32),
    }
    if not good:
        arrays.pop("cls")
    np.savez(path, **arrays)


def test_verify_accepts_wellformed(tmp_path, capsys):
    module = _load_module()
    path = tmp_path / "augreg.npz"
    _write_fake_augreg(path)
    module.verify(path)
    assert "verified" in capsys.readouterr().out


def test_verify_rejects_missing_keys(tmp_path):
    module = _load_module()
    path = tmp_path / "bad.npz"
    _write_fake_augreg(path, good=False)
    with pytest.raises(SystemExit):
        module.verify(path)


def test_cache_dir_env_override(tmp_path, monkeypatch):
    module = _load_module()
    monkeypatch.setenv("SSL4POLYP_TPU_CACHE", str(tmp_path / "cache"))
    assert module.cache_dir() == tmp_path / "cache"
    assert module.default_path().parent == tmp_path / "cache"
    assert module.default_path().suffix == ".npz"


def _write_tiny_augreg(path, *, D=32, depth=2, heads=4, grid=2):
    hd = D // heads
    arrays = {
        "embedding/kernel": np.zeros((16, 16, 3, D), np.float32),
        "embedding/bias": np.zeros((D,), np.float32),
        "cls": np.full((1, 1, D), 0.5, np.float32),
        "Transformer/posembed_input/pos_embedding":
            np.zeros((1, grid * grid + 1, D), np.float32),
        "Transformer/encoder_norm/scale": np.ones((D,), np.float32),
        "Transformer/encoder_norm/bias": np.zeros((D,), np.float32),
    }
    for i in range(depth):
        base = f"Transformer/encoderblock_{i}"
        attn = f"{base}/MultiHeadDotProductAttention_1"
        for name in ("query", "key", "value"):
            arrays[f"{attn}/{name}/kernel"] = np.zeros((D, heads, hd), np.float32)
            arrays[f"{attn}/{name}/bias"] = np.zeros((heads, hd), np.float32)
        arrays[f"{attn}/out/kernel"] = np.zeros((heads, hd, D), np.float32)
        arrays[f"{attn}/out/bias"] = np.zeros((D,), np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            arrays[f"{base}/{ln}/scale"] = np.ones((D,), np.float32)
            arrays[f"{base}/{ln}/bias"] = np.zeros((D,), np.float32)
        arrays[f"{base}/MlpBlock_3/Dense_0/kernel"] = np.zeros((D, 4 * D), np.float32)
        arrays[f"{base}/MlpBlock_3/Dense_0/bias"] = np.zeros((4 * D,), np.float32)
        arrays[f"{base}/MlpBlock_3/Dense_1/kernel"] = np.zeros((4 * D, D), np.float32)
        arrays[f"{base}/MlpBlock_3/Dense_1/bias"] = np.zeros((D,), np.float32)
    np.savez(path, **arrays)


def test_factory_auto_uses_cache(tmp_path, monkeypatch, rng_key):
    from ssl4polyp_tpu.models.factory import get_imagenet_or_random_vit

    monkeypatch.setenv("SSL4POLYP_TPU_CACHE", str(tmp_path))
    module = _load_module()
    # no cached file -> actionable error naming the fetch script
    with pytest.raises(FileNotFoundError, match="fetch_augreg"):
        get_imagenet_or_random_vit(rng_key, pretrained_npz="auto")

    # a cached (tiny) export loads through the auto path
    dest = module.default_path()
    dest.parent.mkdir(parents=True, exist_ok=True)
    _write_tiny_augreg(dest)
    model = get_imagenet_or_random_vit(
        rng_key, pretrained_npz="auto",
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
    )
    assert model.scheme == "sup_imnet"
    cls = np.asarray(model.params["cls_token"])
    np.testing.assert_allclose(cls, 0.5)
