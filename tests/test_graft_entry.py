"""Driver-contract coverage: __graft_entry__ must work WITHOUT the conftest env.

Round 1 shipped a red multichip gate because ``dryrun_multichip`` was only
ever exercised under tests/conftest.py's forced 8-device CPU mesh, while the
driver calls it in a process whose JAX backend is already initialised with a
single (axon TPU) device. These tests reproduce the driver environment: a
fresh subprocess with JAX_PLATFORMS / the xla_force_host_platform_device_count
flag scrubbed, so whatever backend sitecustomize pins is what the entry points
see — exactly like `MULTICHIP_r*.json` generation.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    kept = [
        tok for tok in flags.split()
        if "xla_force_host_platform_device_count" not in tok
    ]
    if kept:
        env["XLA_FLAGS"] = " ".join(kept)
    else:
        env.pop("XLA_FLAGS", None)
    # Keep the driver scenario hermetic on CI-like hosts with no TPU: if the
    # sitecustomize backend is unreachable JAX falls back to CPU (1 device
    # without the flag), which is the same "too few devices" condition.
    return env


def test_dryrun_multichip_without_conftest_env():
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    result = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_scrubbed_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=570,
    )
    assert result.returncode == 0, result.stdout
    assert "dryrun_multichip(8)" in result.stdout and "OK" in result.stdout


def test_build_mesh_error_names_device_counts():
    import jax

    from ssl4polyp_tpu.parallel.mesh import build_mesh

    devices = jax.devices()[:1]
    with pytest.raises(ValueError, match=r"needs 8 devices, have 1"):
        build_mesh(data=8, model=1, devices=devices)
