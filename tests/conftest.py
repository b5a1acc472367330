"""Test configuration: run everything on a virtual 8-device CPU mesh.

JAX must see these environment variables before first import, so they are set
here at conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers the remote-TPU (axon) backend and
# pins jax_platforms to it before conftest runs; override back to CPU so the
# suite runs on the virtual 8-device host mesh, deterministically and in fp32.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
