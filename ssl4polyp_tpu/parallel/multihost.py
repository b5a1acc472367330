"""Multi-host initialisation and host-0 gating.

The TPU replacement for the reference's rank-discovery machinery
(``mae/util/misc.py:217-249`` reads OMPI/SLURM/env vars and runs an
``env://`` NCCL rendezvous; submitit launchers schedule SLURM jobs):

* on TPU pods, ``jax.distributed.initialize()`` discovers the coordinator
  from the TPU environment automatically — no rendezvous server;
* explicit coordinator/process settings are accepted for non-TPU fleets;
* ``is_primary()`` replaces rank-0 guards.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_multihost", "is_primary", "process_info"]

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise JAX distributed when running multi-process.

    Safe to call unconditionally: single-process runs are detected and
    skipped.  Explicit arguments (or ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``) override auto-detection.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_processes = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_processes) if env_processes else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes in (None, 1):
        return  # single process — nothing to initialise
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_primary() -> bool:
    """True on the process that owns artifact writes (reference rank-0
    guards).  Falls back to True when no JAX runtime is available so the
    accelerator-free layers (configs, analysis) stay usable standalone."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
