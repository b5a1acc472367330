"""Persist raw evaluation outputs (reference ``classification/eval_outputs.py``):
logits (npz), per-frame metadata (jsonl), and the decision threshold (json)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping, Optional, Sequence

import numpy as np

__all__ = ["write_outputs"]


def write_outputs(
    output_dir: str | Path,
    *,
    logits: np.ndarray,
    targets: np.ndarray,
    metadata_rows: Sequence[Mapping[str, Any]],
    tau: Optional[float] = None,
) -> Path:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    np.savez(
        output_dir / "logits.npz",
        logits=np.asarray(logits),
        targets=np.asarray(targets),
    )
    with open(output_dir / "metadata.jsonl", "w", encoding="utf-8") as handle:
        for row in metadata_rows:
            handle.write(json.dumps(dict(row), default=str) + "\n")
    (output_dir / "tau.json").write_text(
        json.dumps({"tau": float(tau) if tau is not None else None}), encoding="utf-8"
    )
    return output_dir
