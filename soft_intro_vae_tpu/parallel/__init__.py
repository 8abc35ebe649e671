"""SPMD parallelism: mesh/sharding helpers (DP) and multi-host init."""

from soft_intro_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    host_local_batch_size,
    make_data_mesh,
    replicated,
    shard_batch,
    shard_scan_batch,
    shard_state,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "host_local_batch_size",
    "make_data_mesh",
    "replicated",
    "shard_batch",
    "shard_scan_batch",
    "shard_state",
]
