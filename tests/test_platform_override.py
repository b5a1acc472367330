"""JAX_PLATFORMS env must win over the sitecustomize's axon pin.

Round-3 verification found the documented CPU-mesh recipe
(``JAX_PLATFORMS=cpu python -m ssl4polyp_tpu...``) still initialised the
remote axon backend — the container sitecustomize pins
``jax_platforms="axon,cpu"`` after registration — and hung every CLI when
the TPU relay was down.  ``ssl4polyp_tpu/__init__`` now re-asserts the env
value (utils/platform.py); this test drives the real import path in a
subprocess so a regression reproduces the original hang (bounded by the
timeout) instead of silently passing in-process.
"""

import os
import subprocess
import sys


def test_env_cpu_override_wins_in_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import ssl4polyp_tpu, jax; print(jax.devices()[0].platform)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"


def test_honor_platform_env_noops_for_axon(monkeypatch):
    # The terminal default (JAX_PLATFORMS=axon) must keep the richer
    # "axon,cpu" pin from the sitecustomize (cpu tail stages debug
    # callbacks), so the helper must not touch config for axon values.
    from ssl4polyp_tpu.utils import platform as plat

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    import jax

    before = jax.config.jax_platforms
    plat.honor_platform_env()
    assert jax.config.jax_platforms == before
