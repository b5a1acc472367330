"""Restore stock ``JAX_PLATFORMS`` semantics under the axon sitecustomize.

The TPU terminal image ships a ``sitecustomize`` that registers the remote
axon backend and then **pins** the selection with
``jax.config.update("jax_platforms", "axon,cpu")`` — overriding whatever the
user put in the ``JAX_PLATFORMS`` environment variable.  The documented
CPU-mesh recipe (``JAX_PLATFORMS=cpu python -m ssl4polyp_tpu...``) therefore
still initialised the axon backend, and with the relay down the process hung
indefinitely inside client creation (observed in the round-3 verification
drive: sleeping at 0% CPU, zero artifacts).

:func:`honor_platform_env` re-applies the environment value through
``jax.config.update`` *after* the sitecustomize pin, restoring the behaviour
stock JAX would have had.  It is called from ``ssl4polyp_tpu/__init__`` so
every CLI entry point (training/eval/bench/report) honors the env var before
its first backend touch.  The axon default is left untouched: when the env
asks for the axon platform (the terminal default, ``JAX_PLATFORMS=axon``)
the richer "axon,cpu" pin from the sitecustomize is kept, because the cpu
tail is what stages ``jax.debug.callback`` inputs.

Reference counterpart: none — the reference's torch stack selects devices
per-process via ``torch.device``; on TPU the platform choice is global and
must be made before backend initialisation, hence this shim.
"""

from __future__ import annotations

import os

__all__ = ["honor_platform_env"]

_APPLIED = False


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` win over the sitecustomize's axon pin.

    No-op when the env var is unset/empty, when it selects the axon
    platform itself, or when jax is not importable.  Safe to call more
    than once; if backends were already initialised with a different
    platform the stale set is cleared so the selection takes effect
    (mirrors ``axon.register._install_jax_hooks``'s own recovery path).
    """
    global _APPLIED
    value = os.environ.get("JAX_PLATFORMS", "").strip()
    if not value or "axon" in value.lower():
        return
    try:
        import jax
        from jax._src import xla_bridge as _xb
    except Exception:  # pragma: no cover - jax always present in this image
        return
    current = getattr(jax.config, "jax_platforms", None)
    if current == value and _APPLIED:
        return
    jax.config.update("jax_platforms", value)
    _APPLIED = True
    try:
        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    except Exception:  # pragma: no cover - defensive: keep CLIs bootable
        pass
