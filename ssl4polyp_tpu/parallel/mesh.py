"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's process-group machinery
(``torch.distributed`` + DDP + DistributedSampler + NCCL,
``train_classification.py:6017-6027`` / ``mae/util/misc.py:217-249``):

* one :class:`jax.sharding.Mesh` over all chips, axes ``("data", "model")``;
* the global batch is sharded along ``data`` (ICI handles gradient
  reduction via the collectives XLA inserts for the pjit-ed train step);
* parameters and optimizer state are replicated by default; the ``model``
  axis exists so large variants can shard attention/MLP kernels without
  changing the training loop (tensor parallelism is a sharding annotation
  here, not an architecture change);
* multi-host initialisation is ``jax.distributed.initialize`` (DCN), no
  rendezvous server.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "build_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "cross_replica_mean",
]


def build_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        if len(devices) % model != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by model-parallel degree {model}"
            )
        data = len(devices) // model
    needed = data * model
    if len(devices) < needed:
        raise ValueError(
            f"build_mesh(data={data}, model={model}) needs {needed} devices, "
            f"have {len(devices)} ({[str(d) for d in devices]}). On a single "
            f"host, request a virtual mesh with JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={needed} set "
            f"before JAX initialises."
        )
    grid = np.asarray(devices[:needed]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding along the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch dict onto the mesh, sharded along "data"."""
    sharding = batch_sharding(mesh)
    return {key: jax.device_put(value, sharding) for key, value in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def cross_replica_mean(value: jax.Array, axis_name: str = "data") -> jax.Array:
    """psum-mean across the data axis (inside shard_map/pjit contexts)."""
    return jax.lax.pmean(value, axis_name)
