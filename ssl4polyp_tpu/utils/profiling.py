"""Optional device profiling (fills the reference's tracing gap — SURVEY §5
notes the reference has no profiler; here a ``jax.profiler`` trace is one
context manager away)."""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Optional

__all__ = ["maybe_trace"]


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str | Path]) -> Iterator[None]:
    """Capture a jax profiler trace into ``trace_dir`` when given."""
    if not trace_dir:
        yield
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield
