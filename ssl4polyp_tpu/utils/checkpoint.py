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
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_meta",
    "update_pointer",
    "cleanup_checkpoints",
]


def _to_numpy(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {key: _to_numpy(value) for key, value in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_to_numpy(item) for item in tree)
    if hasattr(tree, "shape") and hasattr(tree, "dtype"):
        return np.asarray(tree)
    return tree


def save_checkpoint(path: str | Path, payload: Dict[str, Any], meta: Optional[Dict[str, Any]] = None) -> Path:
    """Serialise ``payload`` (pytrees of arrays + JSON-safe leaves) to ``path``.

    Multi-host: only the primary process writes (reference rank-0 save guard,
    ``util/misc.py:306-335``); other hosts return the path untouched."""
    from flax import serialization

    from ssl4polyp_tpu.parallel.multihost import is_primary

    path = Path(path)
    if not is_primary():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    document = {"payload": _to_numpy(payload), "meta": meta or {}}
    data = serialization.msgpack_serialize(document)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic on POSIX
    sidecar = path.with_suffix(path.suffix + ".json")
    try:
        sidecar.write_text(json.dumps(meta or {}, indent=2, default=str), encoding="utf-8")
    except TypeError:
        pass
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
