"""Mesh, multihost and logging utility coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl4polyp_tpu.parallel import (
    batch_sharding,
    build_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from ssl4polyp_tpu.parallel.multihost import initialize_multihost, is_primary, process_info


def test_build_mesh_shapes():
    mesh = build_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = build_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        build_mesh(model=3)  # 8 % 3 != 0


def test_shard_and_replicate():
    mesh = build_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)
    tree = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert tree["w"].sharding == replicated_sharding(mesh)
    # data round-trips
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_sharded_computation_reduces_globally():
    mesh = build_mesh()
    x = jax.device_put(np.ones((16, 4), np.float32), batch_sharding(mesh))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    assert float(total(x)) == 64.0


def test_multihost_noop_single_process():
    initialize_multihost()  # must not raise in single-process mode
    assert is_primary()
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8


def test_run_logger_sinks(tmp_path):
    from ssl4polyp_tpu.utils.logging import RunLogger, Throughput

    logger = RunLogger(tmp_path, "unit", enable_tensorboard=False, echo=False)
    logger.scalar("loss", 1.0, 0)  # no-op writer must absorb this
    logger.text("hello")
    logger.json_line({"epoch": 0, "loss": 1.0})
    logger.close()
    assert "hello" in (tmp_path / "unit.log").read_text()
    assert '"epoch": 0' in (tmp_path / "unit.jsonl").read_text()

    meter = Throughput()
    assert meter.tick(10) is None  # first tick has no interval
    assert meter.tick(10) is not None


def test_profiling_context(tmp_path):
    from ssl4polyp_tpu.utils.profiling import maybe_trace

    with maybe_trace(None):
        pass  # disabled: no-op
    with maybe_trace(tmp_path / "trace"):
        jnp.ones(4).block_until_ready()
    assert any((tmp_path / "trace").rglob("*"))
