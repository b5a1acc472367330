"""Torch-free writer for PyTorch ``.pt``/``.pth`` files.

Counterpart of :mod:`ssl4polyp_tpu.models.pth_reader`: emits the torch-1.6+
zipfile serialization format so the reference's torch-based consumers (e.g.
``torch.load`` of ``eval_outputs.py``'s ``logits.pt`` —
``src/ssl4polyp/classification/eval_outputs.py:28``) can read artifacts
produced on TPU hosts with no torch installation.

The archive layout torch.load expects::

    <name>/data.pkl        pickled object graph; tensors are persistent-id
                           records calling ``torch._utils._rebuild_tensor_v2``
    <name>/data/<key>      one raw little-endian buffer per storage
    <name>/version         "3"

``pickle.Pickler`` cannot produce the graph without torch importable (its
``save_global`` verifies that ``torch._utils._rebuild_tensor_v2`` resolves),
so the pickle stream is emitted directly with protocol-2 opcodes.  The
supported object subset — dict/list/tuple, str/bytes, int/float/bool/None,
and numpy arrays as tensors — is exactly what ``torch.load(...,
weights_only=True)``'s restricted unpickler accepts, so readers never need
``weights_only=False`` for these files.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from typing import Any, Dict, IO

import numpy as np

__all__ = ["write_pt", "TorchPickleError"]


class TorchPickleError(RuntimeError):
    """The object graph contains something outside the writable subset."""


def _np_bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _storage_name(dtype: np.dtype) -> str:
    """numpy dtype → torch storage class name (pth_reader table, inverted)."""
    table = {
        np.dtype("<f4"): "FloatStorage",
        np.dtype("<f8"): "DoubleStorage",
        np.dtype("<f2"): "HalfStorage",
        np.dtype("<i8"): "LongStorage",
        np.dtype("<i4"): "IntStorage",
        np.dtype("<i2"): "ShortStorage",
        np.dtype("i1"): "CharStorage",
        np.dtype("u1"): "ByteStorage",
        np.dtype("bool"): "BoolStorage",
        np.dtype("<c8"): "ComplexFloatStorage",
        np.dtype("<c16"): "ComplexDoubleStorage",
    }
    if dtype in table:
        return table[dtype]
    try:
        if dtype == _np_bfloat16():
            return "BFloat16Storage"
    except ImportError:  # pragma: no cover - ml_dtypes ships with jax
        pass
    raise TorchPickleError(f"no torch storage type for numpy dtype {dtype}")


class _PickleWriter:
    """Minimal protocol-2 pickler for the torch checkpoint object graph."""

    def __init__(self, out: IO[bytes]):
        self._out = out
        self.storages: Dict[str, np.ndarray] = {}
        # Containers on the current recursion path. There are no MEMO
        # opcodes (shared references serialize as independent copies), so a
        # cyclic graph would recurse forever — fail loudly instead.
        self._stack: set[int] = set()

    # -- low-level opcode helpers ----------------------------------------
    def _w(self, data: bytes) -> None:
        self._out.write(data)

    def _global(self, module: str, name: str) -> None:
        self._w(b"c" + module.encode("ascii") + b"\n" + name.encode("ascii") + b"\n")

    def _unicode(self, text: str) -> None:
        raw = text.encode("utf-8")
        self._w(b"X" + struct.pack("<I", len(raw)) + raw)

    def _int(self, value: int) -> None:
        if 0 <= value < 256:
            self._w(b"K" + struct.pack("<B", value))
        elif 0 <= value < 65536:
            self._w(b"M" + struct.pack("<H", value))
        elif -(2**31) <= value < 2**31:
            self._w(b"J" + struct.pack("<i", value))
        else:
            encoded = value.to_bytes(
                (value.bit_length() + 8) // 8, "little", signed=True
            )
            if len(encoded) > 255:
                raise TorchPickleError("integer too large")
            self._w(b"\x8a" + struct.pack("<B", len(encoded)) + encoded)

    # -- object graph ------------------------------------------------------
    def save(self, obj: Any) -> None:
        if obj is None:
            self._w(b"N")
        elif obj is True:
            self._w(b"\x88")
        elif obj is False:
            self._w(b"\x89")
        elif isinstance(obj, int):
            self._int(obj)
        elif isinstance(obj, float):
            self._w(b"G" + struct.pack(">d", obj))
        elif isinstance(obj, str):
            self._unicode(obj)
        elif isinstance(obj, bytes):
            self._w(b"B" + struct.pack("<I", len(obj)) + obj)
        elif isinstance(obj, np.ndarray) or np.isscalar(obj) and isinstance(
            obj, np.generic
        ):
            self._tensor(np.asarray(obj))
        elif isinstance(obj, (dict, list, tuple)):
            if id(obj) in self._stack:
                raise TorchPickleError(
                    "cyclic object graph cannot be written to a .pt file"
                )
            self._stack.add(id(obj))
            try:
                if isinstance(obj, dict):
                    self._w(b"}")
                    if obj:
                        self._w(b"(")
                        for key, value in obj.items():
                            self.save(key)
                            self.save(value)
                        self._w(b"u")
                elif isinstance(obj, list):
                    self._w(b"]")
                    if obj:
                        self._w(b"(")
                        for item in obj:
                            self.save(item)
                        self._w(b"e")
                else:
                    self._tuple(obj)
            finally:
                self._stack.discard(id(obj))
        else:
            raise TorchPickleError(
                f"cannot serialize {type(obj).__name__!r} into a .pt file"
            )

    def _tuple(self, items: tuple) -> None:
        if len(items) == 0:
            self._w(b")")
            return
        if len(items) <= 3:
            for item in items:
                self.save(item)
            self._w({1: b"\x85", 2: b"\x86", 3: b"\x87"}[len(items)])
            return
        self._w(b"(")
        for item in items:
            self.save(item)
        self._w(b"t")

    def _tensor(self, array: np.ndarray) -> None:
        if array.dtype.kind in ("U", "S", "O"):
            raise TorchPickleError(f"cannot store dtype {array.dtype} as a tensor")
        # Normalise to little-endian contiguous — the raw buffer format.
        contiguous = np.ascontiguousarray(array)
        if contiguous.dtype.byteorder == ">":
            contiguous = contiguous.astype(contiguous.dtype.newbyteorder("<"))
        key = str(len(self.storages))
        self.storages[key] = contiguous

        # torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
        #                                 requires_grad, backward_hooks)
        self._global("torch._utils", "_rebuild_tensor_v2")
        # arg tuple ------------------------------------------------------
        self._w(b"(")
        #   persistent id: ('storage', <StorageType>, key, location, numel)
        self._w(b"(")
        self._unicode("storage")
        self._global("torch", _storage_name(contiguous.dtype))
        self._unicode(key)
        self._unicode("cpu")
        self._int(int(contiguous.size))
        self._w(b"t")
        self._w(b"Q")  # BINPERSID
        #   offset, size, stride (contiguous strides in elements)
        self._int(0)
        self._tuple(tuple(int(s) for s in contiguous.shape))
        strides = []
        acc = 1
        for dim in reversed(contiguous.shape):
            strides.append(acc)
            acc *= int(dim)
        self._tuple(tuple(reversed(strides)))
        #   requires_grad, backward_hooks (empty OrderedDict)
        self._w(b"\x89")
        self._global("collections", "OrderedDict")
        self._w(b")")
        self._w(b"R")  # OrderedDict()
        self._w(b"t")
        self._w(b"R")  # _rebuild_tensor_v2(*args)

    def dump(self, obj: Any) -> None:
        self._w(b"\x80\x02")  # PROTO 2
        self.save(obj)
        self._w(b".")


def write_pt(path: str | Path, obj: Any, *, archive_name: str | None = None) -> Path:
    """Serialize ``obj`` to ``path`` in the torch zipfile format.

    ``obj`` may be any nesting of dict/list/tuple, str/bytes, numbers,
    None, and numpy arrays (written as CPU tensors of the matching torch
    dtype).  Verified round-trippable through both ``torch.load`` (incl.
    ``weights_only=True``) and :func:`pth_reader.read_pth`.
    """
    path = Path(path)
    name = archive_name or path.stem or "archive"
    import io

    buffer = io.BytesIO()
    writer = _PickleWriter(buffer)
    writer.dump(obj)

    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as archive:
        archive.writestr(f"{name}/data.pkl", buffer.getvalue())
        for key, storage in writer.storages.items():
            archive.writestr(f"{name}/data/{key}", storage.tobytes())
        archive.writestr(f"{name}/version", "3\n")
        archive.writestr(f"{name}/byteorder", "little")
    return path
