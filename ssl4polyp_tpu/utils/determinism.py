"""Determinism controls.

The reference needs a stack of flags to tame CUDA nondeterminism
(``train_classification.py:1615-1630``: cudnn.deterministic, CUBLAS
workspace config, torch.use_deterministic_algorithms).  XLA on TPU is
deterministic by construction for a fixed program and seed, so the JAX side
needs only (a) seeding host-side RNGs used by the data path and (b) deriving
all device randomness from explicit PRNG keys.
"""

from __future__ import annotations

import random

import numpy as np

__all__ = ["set_determinism", "worker_seed"]


def set_determinism(seed: int) -> "np.random.Generator":
    """Seed host RNGs; returns a numpy Generator for run-scoped use.

    Device-side randomness must come from ``jax.random`` keys derived from
    the same seed by the caller (keys are values, not hidden state — resume
    needs only ``(seed, epoch, step)``).
    """
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return np.random.default_rng(seed)


def worker_seed(seed: int, rank: int = 0, epoch: int = 0) -> int:
    """Per-process/per-epoch derived seed (reference offsets seed by rank —
    ``train_classification.py:6033`` — and by epoch for the sampler)."""
    return (seed + 1_000_003 * rank + 7_919 * epoch) % (2 ** 63)
