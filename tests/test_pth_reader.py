"""Torch-free ``.pth`` reading (models/pth_reader.py).

Checkpoints are WRITTEN with real torch (available in this image) and read
back with torch blocked from ``sys.modules`` — proving a TPU host without a
torch installation can import the published MAE checkpoints
(reference load sites: ``src/ssl4polyp/models/models.py:168-175``).
"""

import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ssl4polyp_tpu.models.pth_reader import (  # noqa: E402
    TorchUnpickleError,
    read_pth,
    read_pth_state_dict,
)


class _BlockTorch:
    """Make any ``import torch`` inside the block fail loudly."""

    def __enter__(self):
        self._saved = {
            name: sys.modules.pop(name)
            for name in list(sys.modules)
            if name == "torch" or name.startswith("torch.")
        }
        sys.modules["torch"] = None  # import torch -> ImportError
        return self

    def __exit__(self, *exc):
        sys.modules.pop("torch", None)
        sys.modules.update(self._saved)
        return False


def _state_dict():
    gen = torch.Generator().manual_seed(0)
    return {
        "weight": torch.randn(4, 3, generator=gen),
        "bias": torch.randn(4, generator=gen),
        "embed": torch.randn(2, 5, 6, generator=gen, dtype=torch.float64),
        "counts": torch.arange(7, dtype=torch.int64),
        "flag": torch.tensor(True),
        "half": torch.randn(3, 3, generator=gen).to(torch.float16),
        "bf16": torch.randn(3, 3, generator=gen).to(torch.bfloat16),
    }


def _assert_matches(loaded, reference):
    assert set(loaded) == set(reference)
    for name, tensor in reference.items():
        expected = tensor.to(torch.float32).numpy() if tensor.dtype == torch.bfloat16 \
            else tensor.numpy()
        got = loaded[name]
        if got.dtype.name == "bfloat16":
            got = got.astype(np.float32)
        np.testing.assert_array_equal(got, expected)


def test_zip_format_roundtrip(tmp_path):
    state = _state_dict()
    path = tmp_path / "ckpt.pth"
    torch.save({"model": state, "epoch": 3}, str(path))

    with _BlockTorch():
        loaded = read_pth_state_dict(path)
        full = read_pth(path)
    _assert_matches(loaded, state)
    assert full["epoch"] == 3


def test_noncontiguous_and_sliced_tensors(tmp_path):
    gen = torch.Generator().manual_seed(1)
    base = torch.randn(6, 8, generator=gen)
    state = {
        "transposed": base.t(),          # non-contiguous stride
        "sliced": base[1:5, 2:7],        # offset + ragged view
        "scalar": torch.tensor(2.5),
    }
    path = tmp_path / "views.pth"
    torch.save(state, str(path))
    with _BlockTorch():
        loaded = read_pth_state_dict(path, key=None)
    np.testing.assert_array_equal(loaded["transposed"], base.t().numpy())
    np.testing.assert_array_equal(loaded["sliced"], base[1:5, 2:7].numpy())
    np.testing.assert_array_equal(loaded["scalar"], np.float32(2.5))


def test_legacy_format_roundtrip(tmp_path):
    state = {k: v for k, v in _state_dict().items() if v.dtype != torch.bfloat16}
    path = tmp_path / "legacy.pth"
    torch.save(state, str(path), _use_new_zipfile_serialization=False)
    with _BlockTorch():
        loaded = read_pth_state_dict(path, key=None)
    _assert_matches(loaded, state)


def test_rejects_arbitrary_globals(tmp_path):
    path = tmp_path / "evil.pth"
    path.write_bytes(pickle.dumps(eval))  # os-level callable in the graph
    with pytest.raises(TorchUnpickleError):
        read_pth(path)


def test_rejects_legacy_view_metadata():
    """Pre-torch-0.4 persistent ids can carry view metadata (pid[5]); mapping
    the view onto the ROOT storage would silently load wrong values, so the
    reader must refuse (falling back to torch.load) rather than guess."""
    import io

    from ssl4polyp_tpu.models.pth_reader import _RestrictedUnpickler

    up = _RestrictedUnpickler(io.BytesIO(b""), lambda key, dtype, numel: None)
    with pytest.raises(TorchUnpickleError):
        up.persistent_load(
            ("storage", "FloatStorage", "0", "cpu", 10, ("view", 2, 4))
        )
    # the modern writer's explicit None view metadata stays accepted
    up.persistent_load(("storage", "FloatStorage", "0", "cpu", 10, None))


def test_mae_checkpoint_import_torch_free(tmp_path):
    """End-to-end: a reference-layout MAE encoder checkpoint written by
    torch loads through load_torch_state_dict + mae_params_from_torch with
    torch blocked, and matches the torch-read values."""
    from ssl4polyp_tpu.models.import_torch import (
        load_torch_state_dict,
        mae_params_from_torch,
    )
    from ssl4polyp_tpu.models.vit import ViTConfig

    gen = torch.Generator().manual_seed(7)
    D, depth, P, C = 16, 2, 4, 3
    state = {
        "cls_token": torch.randn(1, 1, D, generator=gen),
        "pos_embed": torch.randn(1, 10, D, generator=gen),
        "patch_embed.proj.weight": torch.randn(D, C, P, P, generator=gen),
        "patch_embed.proj.bias": torch.randn(D, generator=gen),
        "norm.weight": torch.randn(D, generator=gen),
        "norm.bias": torch.randn(D, generator=gen),
    }
    for i in range(depth):
        for sub, shape in [
            ("norm1.weight", (D,)), ("norm1.bias", (D,)),
            ("attn.qkv.weight", (3 * D, D)), ("attn.qkv.bias", (3 * D,)),
            ("attn.proj.weight", (D, D)), ("attn.proj.bias", (D,)),
            ("norm2.weight", (D,)), ("norm2.bias", (D,)),
            ("mlp.fc1.weight", (4 * D, D)), ("mlp.fc1.bias", (4 * D,)),
            ("mlp.fc2.weight", (D, 4 * D)), ("mlp.fc2.bias", (D,)),
        ]:
            state[f"blocks.{i}.{sub}"] = torch.randn(*shape, generator=gen)
    path = tmp_path / "mae.pth"
    torch.save({"model": state}, str(path))

    cfg = ViTConfig(img_size=12, patch_size=P, embed_dim=D, depth=depth,
                    num_heads=4)
    with _BlockTorch():
        numpy_state = load_torch_state_dict(path)
        params = mae_params_from_torch(numpy_state, cfg)
    np.testing.assert_allclose(
        params["blocks"]["attn"]["qkv"]["kernel"][1],
        state["blocks.1.attn.qkv.weight"].numpy().T,
        rtol=0, atol=0,
    )
    assert params["patch_embed"]["kernel"].shape == (P * P * C, D)


def test_shared_storage_views(tmp_path):
    """Two tensors sharing one storage (a view with offset) deserialize from
    the single stored buffer — the storage cache must dedupe by key."""
    base = torch.arange(12, dtype=torch.float32)
    state = {"full": base, "view": base[3:9], "strided": base[::2]}
    path = tmp_path / "shared.pth"
    torch.save(state, str(path))
    with _BlockTorch():
        loaded = read_pth_state_dict(path, key=None)
    np.testing.assert_array_equal(loaded["full"], np.arange(12, dtype=np.float32))
    np.testing.assert_array_equal(loaded["view"], np.arange(3, 9, dtype=np.float32))
    np.testing.assert_array_equal(loaded["strided"],
                                  np.arange(0, 12, 2, dtype=np.float32))


def test_published_mae_checkpoint_shape(tmp_path):
    """The published MAE checkpoints carry model + optimizer state + epoch +
    an argparse.Namespace of run args; the torch-free reader must survive
    the full graph, not just the model dict."""
    import argparse

    gen = torch.Generator().manual_seed(2)
    model = {"cls_token": torch.randn(1, 1, 8, generator=gen),
             "blocks.0.attn.qkv.weight": torch.randn(24, 8, generator=gen)}
    optimizer = {
        "state": {0: {"step": 100,
                      "exp_avg": torch.randn(24, 8, generator=gen),
                      "exp_avg_sq": torch.rand(24, 8, generator=gen)}},
        "param_groups": [{"lr": 1e-3, "betas": (0.9, 0.95), "params": [0]}],
    }
    args = argparse.Namespace(batch_size=64, mask_ratio=0.75, model="mae_vit_base")
    path = tmp_path / "mae_full.pth"
    torch.save({"model": model, "optimizer": optimizer, "epoch": 399,
                "args": args}, str(path))
    with _BlockTorch():
        full = read_pth(path)
        state = read_pth_state_dict(path)
    assert full["epoch"] == 399
    assert full["args"].mask_ratio == 0.75
    np.testing.assert_array_equal(
        state["cls_token"], model["cls_token"].numpy()
    )
    np.testing.assert_array_equal(
        full["optimizer"]["state"][0]["exp_avg"],
        optimizer["state"][0]["exp_avg"].numpy(),
    )


# ---------------------------------------------------------------------------
# Torch-free WRITER (models/pth_writer.py): the mirror direction — artifacts
# written on a torch-less TPU host must load with the reference's torch.load
# (reference consumer: eval_outputs.py:28 logits.pt).
# ---------------------------------------------------------------------------

def test_writer_roundtrip_through_torch(tmp_path):
    from ssl4polyp_tpu.models.pth_writer import write_pt

    rng = np.random.default_rng(0)
    obj = {
        "logits": rng.normal(size=(7, 2)).astype(np.float32),
        "targets": np.arange(7, dtype=np.int64),
        "meta": {"tau": 0.37, "name": "x", "flag": True, "none": None,
                 "list": [1, 2.5, "s"], "tup": (1, 2, 3, 4)},
        "bools": np.array([True, False]),
        "u8": rng.integers(0, 255, (2, 5)).astype(np.uint8),
        "f64": rng.normal(size=(3,)),
        "f16": rng.normal(size=(3,)).astype(np.float16),
    }
    path = tmp_path / "graph.pt"
    with _BlockTorch():
        write_pt(path, obj)

    # the DEFAULT (restricted, weights_only) torch unpickler must accept it
    loaded = torch.load(path, weights_only=True)
    assert loaded["logits"].dtype == torch.float32
    assert loaded["targets"].dtype == torch.int64
    assert loaded["u8"].dtype == torch.uint8
    assert loaded["f16"].dtype == torch.float16
    for key in ("logits", "targets", "bools", "u8", "f64", "f16"):
        np.testing.assert_array_equal(loaded[key].numpy(), obj[key])
    assert loaded["meta"] == obj["meta"]

    # and the torch-free reader closes the loop
    with _BlockTorch():
        back = read_pth(path)
    np.testing.assert_array_equal(back["logits"], obj["logits"])


def test_writer_bare_tensor_and_bf16(tmp_path):
    import ml_dtypes

    from ssl4polyp_tpu.models.pth_writer import write_pt

    logits = np.random.default_rng(1).normal(size=(5, 2)).astype(np.float32)
    with _BlockTorch():
        write_pt(tmp_path / "bare.pt", logits, archive_name="logits")
    bare = torch.load(tmp_path / "bare.pt", weights_only=True)
    assert isinstance(bare, torch.Tensor)
    np.testing.assert_array_equal(bare.numpy(), logits)

    bf = np.arange(6, dtype=np.float32).astype(ml_dtypes.bfloat16).reshape(2, 3)
    with _BlockTorch():
        write_pt(tmp_path / "bf.pt", {"w": bf})
    loaded = torch.load(tmp_path / "bf.pt", weights_only=True)
    assert loaded["w"].dtype == torch.bfloat16
    np.testing.assert_array_equal(
        loaded["w"].float().numpy(), bf.astype(np.float32)
    )


def test_writer_non_contiguous_and_errors(tmp_path):
    from ssl4polyp_tpu.models.pth_writer import TorchPickleError, write_pt

    base = np.arange(24, dtype=np.float32).reshape(4, 6)
    view = base[::2, ::3]  # non-contiguous — writer must normalise
    with _BlockTorch():
        write_pt(tmp_path / "v.pt", {"v": view})
    loaded = torch.load(tmp_path / "v.pt", weights_only=True)
    np.testing.assert_array_equal(loaded["v"].numpy(), view)

    with pytest.raises(TorchPickleError):
        write_pt(tmp_path / "bad.pt", {"obj": object()})
    with pytest.raises(TorchPickleError):
        write_pt(tmp_path / "badarr.pt", np.array(["strings"]))


def test_writer_rejects_cycles_allows_shared_refs(tmp_path):
    """No MEMO opcodes: cycles must fail loudly (they'd otherwise recurse
    forever); DAG-shared references are fine and serialize as copies."""
    from ssl4polyp_tpu.models.pth_writer import TorchPickleError, write_pt

    cyclic: list = []
    cyclic.append({"self": cyclic})
    with pytest.raises(TorchPickleError, match="cyclic"):
        write_pt(tmp_path / "cycle.pt", {"c": cyclic})

    shared = {"w": np.ones(3, dtype=np.float32)}
    write_pt(tmp_path / "dag.pt", {"a": shared, "b": shared})
    loaded = torch.load(tmp_path / "dag.pt", weights_only=True)
    np.testing.assert_array_equal(loaded["a"]["w"].numpy(), loaded["b"]["w"].numpy())
