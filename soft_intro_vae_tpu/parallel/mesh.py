"""Device mesh + sharding helpers — the reference's NCCL/DDP layer, TPU-style.

The reference's only parallelism is single-node data parallelism via
DistributedDataParallel + NCCL (style variant, SURVEY §2.7). Here the whole
strategy is three lines of sharding policy:

  * params / optimizer state / BN stats: fully replicated over the mesh,
  * batches: sharded over the leading axis on the ``data`` mesh axis,
  * the SAME jitted train step runs 1..N chips — XLA inserts the gradient
    all-reduce over ICI automatically because the loss mean contracts a
    data-sharded axis against replicated params (GSPMD).

Note a deliberate semantic upgrade over the reference: BatchNorm statistics
are computed over the *global* batch (sync-BN) because the batch-axis mean is
a collective under GSPMD. The reference never syncs BN across replicas (it is
single-device for every BN-bearing variant), so this only makes multi-chip
training better-behaved, not different at N=1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def _is_prng_key(x: Any) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState (or any pytree) fully replicated on the mesh.

    On a multi-controller mesh (real multi-host, or the 2-process CPU test
    rig) ``jax.device_put`` cannot target non-addressable devices, so each
    process contributes the full (identical, seeded) value via
    ``jax.make_array_from_process_local_data``; typed PRNG keys round-trip
    through their raw key data."""
    sh = replicated(mesh)
    local = {d.id for d in jax.local_devices()}
    if jax.process_count() > 1 and any(d.id not in local for d in mesh.devices.flat):

        def put(x):
            if _is_prng_key(x):
                data = np.asarray(jax.random.key_data(x))
                g = jax.make_array_from_process_local_data(sh, data)
                return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        return jax.tree_util.tree_map(put, state)
    return jax.device_put(state, sh)


def _place(batch: Any, sharding: NamedSharding) -> Any:
    """device_put on a single host; on multi-host (multi-controller) meshes
    each process contributes its LOCAL slice of the global batch via
    jax.make_array_from_process_local_data — the TPU-pod analog of the
    reference's per-rank DataLoader shards (dataloader.py:53-67)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard array(s) along the leading (batch) axis across the data axis."""
    return _place(batch, batch_sharding(mesh))


def shard_scan_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard (K, B, ...) stacked step batches along axis 1 (the batch axis);
    the leading K axis is the in-program lax.scan step axis."""
    return _place(batch, NamedSharding(mesh, P(None, DATA_AXIS)))


def host_local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-chip slice of the global batch (reference lod_driver.py:59-60
    divides the global batch by world size the same way)."""
    n = mesh.devices.size
    if global_batch_size % n != 0:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n} devices")
    return global_batch_size // n
