"""Pytree checkpointing with retention, pointers and resume metadata.

Replaces the reference's two torch checkpoint formats
(fine-tune payload ``train_classification.py:7039-7110``; MAE
``checkpoint-{epoch}.pth`` + ``last.pth`` symlink ``mae/util/misc.py:306-352``)
with one scheme:

* a single msgpack file holds any dict-of-pytrees of arrays (params,
  optimizer moments, PRNG key, thresholds, ...) plus a JSON-safe ``meta``
  block (epoch, step, monitor values, config digest);
* a lightweight ``.json`` sidecar mirrors ``meta`` for cheap inspection;
* pointer files are symlinks with copy fallback (reference
  ``train_classification.py:3932-3940``);
* retention keeps the last K checkpoints plus every-N-epoch milestones
  (reference ``main_pretrain.py:235-252``).

Because JAX PRNG keys are values, resume restores bit-identical randomness
from the stored key alone — no torch-style RNG state snapshots needed.
"""

from __future__ import annotations

import json
import re
import shutil
import threading
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_meta",
    "update_pointer",
    "cleanup_checkpoints",
    "AsyncCheckpointer",
]

# Test hook: seconds to sleep between writing the .tmp file and the atomic
# rename (lets crash-safety tests kill the process mid-save).
_WRITE_DELAY_S = 0.0


def _to_numpy(tree: Any, copy: bool = False) -> Any:
    """Host-numpy snapshot of a pytree.  ``copy=True`` guarantees the result
    aliases NO caller memory (device arrays already copy on transfer; host
    numpy leaves are copied explicitly) — required by the async writer,
    whose caller keeps mutating the source tree."""
    if isinstance(tree, dict):
        return {key: _to_numpy(value, copy) for key, value in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy(item, copy) for item in tree)
    if hasattr(tree, "shape") and hasattr(tree, "dtype"):
        array = np.asarray(tree)
        # ``copy=True`` must hold even if np.asarray returned a view of the
        # caller's (or a CPU jax buffer's) memory — guard on ownership, not
        # just object identity, so a future zero-copy __array__ path can't
        # silently alias a donated buffer under the async writer.
        if copy and (array is tree or array.base is not None or not array.flags["OWNDATA"]):
            array = array.copy()
        return array
    return tree


def _write_checkpoint_file(path: Path, snapshot: Dict[str, Any],
                           meta: Dict[str, Any]) -> None:
    """Serialize + write + atomic rename.  ``snapshot`` must already be
    host numpy (no device handles — safe off the main thread)."""
    from flax import serialization

    path.parent.mkdir(parents=True, exist_ok=True)
    document = {"payload": snapshot, "meta": meta}
    data = serialization.msgpack_serialize(document)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    if _WRITE_DELAY_S:
        time.sleep(_WRITE_DELAY_S)
    tmp.replace(path)  # atomic on POSIX: a crash mid-save keeps the old file
    sidecar = path.with_suffix(path.suffix + ".json")
    try:
        sidecar.write_text(json.dumps(meta, indent=2, default=str), encoding="utf-8")
    except TypeError:
        pass


def save_checkpoint(path: str | Path, payload: Dict[str, Any], meta: Optional[Dict[str, Any]] = None) -> Path:
    """Serialise ``payload`` (pytrees of arrays + JSON-safe leaves) to ``path``.

    Multi-host: only the primary process writes (reference rank-0 save guard,
    ``util/misc.py:306-335``); other hosts return the path untouched."""
    from ssl4polyp_tpu.parallel.multihost import is_primary

    path = Path(path)
    if not is_primary():
        return path
    _write_checkpoint_file(path, _to_numpy(payload), meta or {})
    return path


class AsyncCheckpointer:
    """Overlap checkpoint writes with the next epoch's compute.

    The reference saves synchronously (``util/misc.py:306-335``); this is the
    TPU-first improvement (VERDICT r4 item 6).  Split of work:

    * **synchronous** (caller's thread): the device→host snapshot
      (``np.asarray`` on every leaf).  It must complete before returning
      because training loops donate their parameter/optimizer buffers into
      the next step — a background read of a donated buffer would race with
      its deletion.
    * **asynchronous** (one background thread, ≤1 write in flight): msgpack
      serialization, the .tmp write, the atomic rename, then the optional
      pointer update and retention cleanup — all pure host I/O.

    A crash mid-write leaves the previous checkpoint and pointer intact (the
    rename is the commit point; tested in
    ``tests/test_checkpoint.py::test_async_crash_safety``).  Exceptions from
    the writer thread re-raise on the next :meth:`save`/:meth:`wait`.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None
        # serialize+write time of the last completed async save (telemetry)
        self.last_write_seconds: Optional[float] = None
        self.last_snapshot_seconds: Optional[float] = None

    def wait(self) -> None:
        """Join the in-flight write (call before load/exit)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise error

    def save(
        self,
        path: str | Path,
        payload: Dict[str, Any],
        meta: Optional[Dict[str, Any]] = None,
        *,
        pointer: Optional[str | Path] = None,
        cleanup: Optional[Callable[[], Any]] = None,
    ) -> Path:
        """Snapshot now, write in the background; returns immediately after
        the host snapshot.  ``pointer``/``cleanup`` run on the writer thread
        AFTER the atomic rename so observers never see a pointer to a
        missing/partial file."""
        from ssl4polyp_tpu.parallel.multihost import is_primary

        path = Path(path)
        if not is_primary():
            return path
        self.wait()  # at most one write in flight; surfaces prior errors
        t0 = time.perf_counter()
        snapshot = _to_numpy(payload, copy=True)
        self.last_snapshot_seconds = time.perf_counter() - t0
        meta_copy = dict(meta or {})

        def _run() -> None:
            try:
                w0 = time.perf_counter()
                _write_checkpoint_file(path, snapshot, meta_copy)
                if pointer is not None:
                    update_pointer(pointer, path)
                if cleanup is not None:
                    cleanup()
                self.last_write_seconds = time.perf_counter() - w0
            except BaseException as exc:  # noqa: BLE001 - re-raised on wait()
                self._error = exc

        self._thread = threading.Thread(
            target=_run, name="async-checkpoint", daemon=True
        )
        self._thread.start()
        return path


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    """Load a checkpoint; returns ``{"payload": ..., "meta": ...}`` with numpy leaves."""
    from flax import serialization

    data = Path(path).read_bytes()
    return serialization.msgpack_restore(data)


def load_checkpoint_meta(path: str | Path) -> Dict[str, Any]:
    sidecar = Path(path).with_suffix(Path(path).suffix + ".json")
    if sidecar.exists():
        return json.loads(sidecar.read_text(encoding="utf-8"))
    return load_checkpoint(path).get("meta", {})


def update_pointer(pointer: str | Path, target: str | Path) -> None:
    """Point ``pointer`` at ``target`` (symlink, copy fallback; primary only)."""
    from ssl4polyp_tpu.parallel.multihost import is_primary

    if not is_primary():
        return
    pointer = Path(pointer)
    target = Path(target)
    try:
        if pointer.is_symlink() or pointer.exists():
            pointer.unlink()
        pointer.symlink_to(target.name if target.parent == pointer.parent else target)
    except OSError:
        shutil.copy2(target, pointer)


def cleanup_checkpoints(
    directory: str | Path,
    pattern: str = r"checkpoint-(\d+)\.ckpt",
    keep_last: int = 2,
    keep_every_n_epochs: Optional[int] = None,
) -> List[Path]:
    """Delete stale epoch checkpoints (primary only); returns removed paths."""
    from ssl4polyp_tpu.parallel.multihost import is_primary

    if not is_primary():
        return []
    directory = Path(directory)
    matcher = re.compile(pattern)
    found: List[tuple[int, Path]] = []
    for item in directory.iterdir() if directory.exists() else []:
        match = matcher.fullmatch(item.name)
        if match:
            found.append((int(match.group(1)), item))
    found.sort()
    keep: set[Path] = {p for _, p in found[-keep_last:]} if keep_last else set()
    if keep_every_n_epochs:
        # Milestones on COMPLETED-epoch counts: the pretrain engine saves
        # when (epoch+1) % save_freq == 0 (epochs 19, 39, …), so the
        # milestone filter must use the same 1-based convention — an
        # epoch%N==0 filter never matches any saved epoch and silently
        # deletes every intended milestone.
        keep.update(
            p for epoch, p in found if (epoch + 1) % keep_every_n_epochs == 0
        )
    removed: List[Path] = []
    for _, item in found:
        if item not in keep:
            item.unlink(missing_ok=True)
            sidecar = item.with_suffix(item.suffix + ".json")
            sidecar.unlink(missing_ok=True)
            removed.append(item)
    return removed
