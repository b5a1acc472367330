"""Native host-side components (C++ via ctypes).

``jpeg_loader`` accelerates the input pipeline: JPEG decode at DCT-domain
scale + threaded bilinear resize straight into a batch buffer.  The shared
library is compiled from the bundled source on first use (g++ + libjpeg are
part of the image) and cached next to the package; everything degrades
gracefully to the PIL path when a toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "native_available",
    "decode_resize_batch",
    "decode_resize_batch_status",
    "decode_resize",
    "decode_crop_resize",
    "decode_crop_resize_batch_status",
    "jpeg_dims",
    "build_library",
]

_SOURCE = Path(__file__).parent / "jpeg_loader.cpp"
_LIB_PATH = Path(__file__).parent / "_jpeg_loader.so"
_STAMP_PATH = Path(__file__).parent / "_jpeg_loader.src.sha256"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _source_digest() -> str:
    import hashlib

    return hashlib.sha256(_SOURCE.read_bytes()).hexdigest()


def build_library(force: bool = False) -> Optional[Path]:
    """Compile the shared library from the bundled source; returns its path.

    The cached ``.so`` is only reused when the recorded source SHA256 matches
    the bundled ``jpeg_loader.cpp`` — a stale or foreign binary is never
    loaded blindly (the library is rebuilt from source instead).
    """
    global _build_failed
    digest = _source_digest()
    if _LIB_PATH.exists() and not force:
        try:
            if _STAMP_PATH.read_text().strip() == digest:
                return _LIB_PATH
        except OSError:
            pass
    if _build_failed and not force:
        return None
    try:
        subprocess.run(
            [
                # -O3 vectorizes the scalar resample loops; no -march=native
                # (the cached .so may be reused on a different host).
                "g++", "-O3", "-funroll-loops", "-shared", "-fPIC",
                "-std=c++17",
                str(_SOURCE), "-o", str(_LIB_PATH), "-ljpeg", "-pthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        _STAMP_PATH.write_text(digest + "\n")
        return _LIB_PATH
    except Exception:
        _build_failed = True
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        library = build_library()
        if library is None:
            return None
        try:
            lib = ctypes.CDLL(str(library))
        except OSError:
            return None
        lib.decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.decode_resize.restype = ctypes.c_int
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.decode_resize_batch.restype = ctypes.c_int
        lib.decode_resize_batch_status.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.decode_resize_batch_status.restype = ctypes.c_int
        lib.jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jpeg_dims.restype = ctypes.c_int
        lib.decode_crop_resize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int,
        ]
        lib.decode_crop_resize.restype = ctypes.c_int
        lib.decode_crop_resize_batch_status.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.decode_crop_resize_batch_status.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_resize(path: str | os.PathLike, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Decode one JPEG to (out_h, out_w, 3) uint8; None when unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    status = lib.decode_resize(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
    )
    return out if status == 0 else None


def decode_resize_batch(
    paths: Sequence[str | os.PathLike],
    out_h: int,
    out_w: int,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Decode a batch into (n, out_h, out_w, 3) uint8.

    Returns None when the native library is unavailable; failed individual
    frames are zero-filled.  Use :func:`decode_resize_batch_status` when the
    caller needs to know which frames failed.
    """
    result = decode_resize_batch_status(paths, out_h, out_w, n_threads, out)
    return None if result is None else result[0]


def decode_resize_batch_status(
    paths: Sequence[str | os.PathLike],
    out_h: int,
    out_w: int,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Decode a batch; returns ``(images, ok)`` where ``ok`` is a per-frame
    bool array (False = decode failed, frame zero-filled), or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    if out is None:
        out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
    status = np.zeros((n,), dtype=np.uint8)
    encoded: List[bytes] = [str(p).encode() for p in paths]
    array_type = ctypes.c_char_p * n
    lib.decode_resize_batch_status(
        array_type(*encoded), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, int(n_threads),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, status.astype(bool)


def jpeg_dims(path: str | os.PathLike) -> Optional[tuple[int, int]]:
    """(width, height) from the JPEG header only; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    width = ctypes.c_int()
    height = ctypes.c_int()
    if lib.jpeg_dims(str(path).encode(), ctypes.byref(width),
                     ctypes.byref(height)) != 0:
        return None
    return int(width.value), int(height.value)


def decode_crop_resize(
    path: str | os.PathLike,
    out_h: int,
    out_w: int,
    crop_frac: Sequence[float],
    hflip: bool = False,
) -> Optional[np.ndarray]:
    """Random-resized-crop decode of one frame.

    ``crop_frac`` = (fy, fx, fh, fw) fractions of the FULL image.  Decodes
    at the smallest DCT scale covering the scaled crop, skips rows outside
    it, cubic-resizes to (out_h, out_w, 3); None when unavailable/failed.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    fy, fx, fh, fw = (float(v) for v in crop_frac)
    status = lib.decode_crop_resize(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, fy, fx, fh, fw, int(bool(hflip)),
    )
    return out if status == 0 else None


def decode_crop_resize_batch_status(
    paths: Sequence[str | os.PathLike],
    out_h: int,
    out_w: int,
    crops: np.ndarray,
    hflips: np.ndarray,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Batched random-resized-crop decode into (n, out_h, out_w, 3) uint8.

    ``crops``: (n, 4) float64 [fy, fx, fh, fw] fractions; ``hflips``: (n,)
    bools.  Returns ``(images, ok)`` or None when the library is
    unavailable; failed frames are zero-filled with ``ok=False``.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    crops = np.ascontiguousarray(crops, dtype=np.float64)
    flips = np.ascontiguousarray(hflips, dtype=np.uint8)
    if crops.shape != (n, 4) or flips.shape != (n,):
        raise ValueError(f"crops {crops.shape} / hflips {flips.shape} for n={n}")
    if out is None:
        out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
    status = np.zeros((n,), dtype=np.uint8)
    encoded: List[bytes] = [str(p).encode() for p in paths]
    array_type = ctypes.c_char_p * n
    lib.decode_crop_resize_batch_status(
        array_type(*encoded), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w,
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(n_threads),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, status.astype(bool)
