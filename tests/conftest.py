"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX must see these environment variables before first import, so they are set
here at conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
