"""Torch-free reader for PyTorch ``.pth`` checkpoints.

TPU hosts should not need a torch installation to import the published MAE
checkpoints (reference load sites:
``src/ssl4polyp/models/models.py:168-175`` — ``torch.load`` of
``ckpt["model"]`` state dicts; SURVEY §7 hard-part 6).  A ``.pth`` written
by ``torch.save`` since torch 1.6 is an ordinary ZIP archive::

    <name>/data.pkl        the object graph, pickled, with tensors replaced
                           by persistent-id records
    <name>/data/<key>      one raw little-endian buffer per storage
    <name>/version

and tensor reconstruction only needs two torch callables —
``torch._utils._rebuild_tensor_v2`` (storage, offset, size, stride, ...)
and the storage classes themselves — both of which this module re-expresses
in numpy.  The unpickler is *restricted*: only the allow-listed
torch/collections/builtins names resolve, everything else raises, so a
malicious pickle cannot execute arbitrary callables through this path.

bfloat16 storages map to ``ml_dtypes.bfloat16`` (always present in this
stack — jax depends on it).

The pre-1.6 "legacy" tar-less format (magic-number pickle stream followed
by inline storages) is also supported: the published MAE-era checkpoints in
the wild span both formats.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from pathlib import Path
from typing import Any, BinaryIO, Dict, Optional, Tuple

import numpy as np

__all__ = ["read_pth", "read_pth_state_dict", "TorchUnpickleError"]


class TorchUnpickleError(RuntimeError):
    """A ``.pth`` contained a construct outside the supported subset."""


def _np_bfloat16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


# torch storage class name -> numpy dtype factory
_STORAGE_DTYPES = {
    "FloatStorage": lambda: np.dtype("<f4"),
    "DoubleStorage": lambda: np.dtype("<f8"),
    "HalfStorage": lambda: np.dtype("<f2"),
    "BFloat16Storage": _np_bfloat16,
    "LongStorage": lambda: np.dtype("<i8"),
    "IntStorage": lambda: np.dtype("<i4"),
    "ShortStorage": lambda: np.dtype("<i2"),
    "CharStorage": lambda: np.dtype("i1"),
    "ByteStorage": lambda: np.dtype("u1"),
    "BoolStorage": lambda: np.dtype("bool"),
    "ComplexFloatStorage": lambda: np.dtype("<c8"),
    "ComplexDoubleStorage": lambda: np.dtype("<c16"),
}

# torch.<dtype> singletons appear as ('torch', 'float32') etc. in newer
# pickles (UntypedStorage path); map them to numpy dtypes too.
_SCALAR_DTYPES = {
    "float32": lambda: np.dtype("<f4"),
    "float64": lambda: np.dtype("<f8"),
    "float16": lambda: np.dtype("<f2"),
    "bfloat16": _np_bfloat16,
    "int64": lambda: np.dtype("<i8"),
    "int32": lambda: np.dtype("<i4"),
    "int16": lambda: np.dtype("<i2"),
    "int8": lambda: np.dtype("i1"),
    "uint8": lambda: np.dtype("u1"),
    "bool": lambda: np.dtype("bool"),
}


class _StorageRef:
    """A lazily-read flat storage: (dtype, raw loader)."""

    __slots__ = ("dtype", "_load", "_array")

    def __init__(self, dtype: np.dtype, load):
        self.dtype = dtype
        self._load = load
        self._array: Optional[np.ndarray] = None

    def array(self) -> np.ndarray:
        if self._array is None:
            if self._load is None:
                raise TorchUnpickleError("storage data was never serialized")
            self._array = self._load()
        return self._array


class _LazyTensor:
    """Tensor placeholder: materialized after all storages are readable
    (the legacy format serializes storages AFTER the object pickle, so
    rebuild must not touch data during unpickling)."""

    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage: _StorageRef, offset: int,
                 size: Tuple[int, ...], stride: Tuple[int, ...]):
        self.storage = storage
        self.offset = int(offset)
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride)

    def materialize(self) -> np.ndarray:
        flat = self.storage.array()
        if not self.size:
            return flat[self.offset : self.offset + 1].reshape(()).copy()
        itemsize = flat.dtype.itemsize
        view = np.lib.stride_tricks.as_strided(
            flat[self.offset :],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
            writeable=False,
        )
        return np.ascontiguousarray(view)


def _rebuild_tensor_v2(
    storage: _StorageRef,
    storage_offset: int,
    size: Tuple[int, ...],
    stride: Tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> _LazyTensor:
    return _LazyTensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad: bool = False,
                       backward_hooks: Any = None):
    return data


def _materialize(obj: Any) -> Any:
    """Replace every :class:`_LazyTensor` in a container graph by its
    numpy array (dict/list/tuple/set/Namespace are walked)."""
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        for k in list(obj):
            obj[k] = _materialize(obj[k])
        return obj
    if isinstance(obj, list):
        return [_materialize(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v) for v in obj)
    if isinstance(obj, set):
        return {_materialize(v) for v in obj}
    if hasattr(obj, "__dict__") and obj.__class__.__name__ == "Namespace":
        for k, v in vars(obj).items():
            setattr(obj, k, _materialize(v))
        return obj
    return obj


class _Dtype:
    """Stand-in for a ``torch.<dtype>`` singleton in the pickle graph."""

    def __init__(self, name: str):
        self.name = name

    def numpy(self) -> np.dtype:
        return _SCALAR_DTYPES[self.name]()


def _rebuild_device_tensor_from_numpy(data, dtype, device, requires_grad):
    return np.asarray(data)


class _RestrictedUnpickler(pickle.Unpickler):
    """Allow-list unpickler for torch checkpoint object graphs."""

    def __init__(self, handle: BinaryIO, load_storage):
        super().__init__(handle)
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):  # noqa: D102
        if module == "torch._utils":
            table = {
                "_rebuild_tensor_v2": _rebuild_tensor_v2,
                "_rebuild_tensor": _rebuild_tensor_v2,
                "_rebuild_parameter": _rebuild_parameter,
                "_rebuild_device_tensor_from_numpy":
                    _rebuild_device_tensor_from_numpy,
            }
            if name in table:
                return table[name]
        if module == "torch":
            if name in _STORAGE_DTYPES:
                # The class object itself is only used as a tag inside the
                # persistent id tuple; return the name.
                return name
            if name in _SCALAR_DTYPES:
                return _Dtype(name)
            if name == "Size":
                return tuple
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a, **k: None
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "builtins" and name in ("dict", "list", "tuple", "set",
                                             "int", "float", "str", "bytes",
                                             "complex", "bool", "slice"):
            import builtins

            return getattr(builtins, name)
        if module == "numpy.core.multiarray" and name == "_reconstruct":
            from numpy.core.multiarray import _reconstruct

            return _reconstruct
        if module == "numpy" and name in ("ndarray", "dtype"):
            return getattr(np, name)
        if module == "numpy.core.multiarray" and name == "scalar":
            from numpy.core.multiarray import scalar

            return scalar
        if module == "argparse" and name == "Namespace":
            # MAE checkpoints embed the run args; keep them readable.
            import argparse

            return argparse.Namespace
        raise TorchUnpickleError(
            f"unsupported pickle global {module}.{name} — refusing to load "
            f"(torch-free .pth reader supports plain tensor checkpoints)"
        )

    def persistent_load(self, pid):  # noqa: D102
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise TorchUnpickleError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid[:5]
        if len(pid) > 5 and pid[5] is not None:
            # Legacy (pre-torch-0.4) view metadata: the tensor aliases a
            # sub-range of the root storage.  Resolving it against the root
            # with view-relative offsets would silently load wrong values —
            # refuse instead, so load_torch_state_dict falls back to torch.
            raise TorchUnpickleError(
                f"legacy storage view metadata {pid[5]!r} is unsupported — "
                f"refusing to load (torch-free .pth reader)"
            )
        if isinstance(storage_type, _Dtype):
            dtype = storage_type.numpy()
        elif isinstance(storage_type, str) and storage_type in _STORAGE_DTYPES:
            dtype = _STORAGE_DTYPES[storage_type]()
        else:
            raise TorchUnpickleError(f"unknown storage type {storage_type!r}")
        return self._load_storage(str(key), dtype, int(numel))


def _read_zip_pth(path: Path) -> Any:
    with zipfile.ZipFile(path) as archive:
        names = archive.namelist()
        pkl_candidates = [n for n in names if n.endswith("/data.pkl")]
        if not pkl_candidates:
            raise TorchUnpickleError(f"{path}: no data.pkl in archive")
        pkl_name = min(pkl_candidates, key=len)
        prefix = pkl_name[: -len("data.pkl")]
        cache: Dict[str, _StorageRef] = {}

        def load_storage(key: str, dtype: np.dtype, numel: int) -> _StorageRef:
            ref = cache.get(key)
            if ref is None:
                def _load(key=key, dtype=dtype, numel=numel):
                    raw = archive.read(f"{prefix}data/{key}")
                    return np.frombuffer(raw, dtype=dtype, count=numel).copy()

                ref = _StorageRef(dtype, _load)
                cache[key] = ref
            return ref

        with archive.open(pkl_name) as handle:
            graph = _RestrictedUnpickler(io.BytesIO(handle.read()),
                                         load_storage).load()
            # Materialize INSIDE the context manager: storage reads hit the
            # still-open archive; numpy copies the buffers so the returned
            # graph owns its memory.
            return _materialize(graph)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def _read_legacy_pth(path: Path) -> Any:
    """Pre-1.6 format: pickled (magic, protocol, sysinfo, obj, keys) followed
    by each storage as ``int64 numel`` + raw little-endian data.

    Every pickle stream in the file — including the magic/protocol/sysinfo
    preludes and the storage-key list — goes through the SAME restricted
    unpickler as the main object graph, so the no-arbitrary-callables
    guarantee holds for the legacy format too.
    """
    with open(path, "rb") as handle:
        deferred: Dict[str, _StorageRef] = {}

        def load_storage(key: str, dtype: np.dtype, numel: int) -> _StorageRef:
            ref = deferred.get(key)
            if ref is None:
                ref = _StorageRef(dtype, None)
                deferred[key] = ref
            return ref

        def restricted_load():
            return _RestrictedUnpickler(handle, load_storage).load()

        magic = restricted_load()
        if magic != _LEGACY_MAGIC:
            raise TorchUnpickleError(f"{path}: not a torch legacy file")
        _protocol = restricted_load()
        _sysinfo = restricted_load()

        result = restricted_load()
        storage_keys = restricted_load()
        for key in storage_keys:
            ref = deferred[str(key)]
            (numel,) = struct.unpack("<q", handle.read(8))
            raw = handle.read(numel * ref.dtype.itemsize)
            arr = np.frombuffer(raw, dtype=ref.dtype, count=numel).copy()
            ref._array = arr
        return _materialize(result)


def read_pth(path: str | Path) -> Any:
    """Load a ``.pth`` checkpoint into numpy without torch.

    Returns the deserialized object graph with every tensor as a
    ``np.ndarray``.  Raises :class:`TorchUnpickleError` for constructs
    outside the supported subset (callers may fall back to torch).
    """
    path = Path(path)
    if zipfile.is_zipfile(path):
        return _read_zip_pth(path)
    return _read_legacy_pth(path)


def read_pth_state_dict(path: str | Path, key: Optional[str] = "model") -> Dict[str, np.ndarray]:
    """Torch-free counterpart of ``torch.load(...)[key]`` → numpy dict."""
    payload = read_pth(path)
    state = payload
    if isinstance(payload, dict):
        if key and key in payload and isinstance(payload[key], dict):
            state = payload[key]
        else:
            for candidate in ("state_dict", "model", "model_state", "weights",
                              "params"):
                value = payload.get(candidate)
                if isinstance(value, dict):
                    state = value
                    break
    return {
        name: np.asarray(tensor)
        for name, tensor in state.items()
        if isinstance(tensor, np.ndarray)
    }
