"""Runtime utilities: checkpointing, determinism, logging."""

from .determinism import set_determinism
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    update_pointer,
    cleanup_checkpoints,
)

__all__ = [
    "set_determinism",
    "save_checkpoint",
    "load_checkpoint",
    "update_pointer",
    "cleanup_checkpoints",
]
