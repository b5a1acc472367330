"""Mesh construction and sharding rules (ICI data-parallel first)."""

from .mesh import (
    build_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    cross_replica_mean,
)

__all__ = [
    "build_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "cross_replica_mean",
]
