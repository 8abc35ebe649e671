"""Multi-host (multi-slice) initialization helpers.

The reference's distributed story is single-node mp.spawn + NCCL
(style launcher.py:26-29,102-131). The TPU-native equivalent needs no
launcher: each host runs the SAME program, `jax.distributed.initialize`
wires the runtime over DCN, and the global mesh spans every chip. Data
loading uses per-host sharding (`process_index`) exactly like the
reference's per-rank TFRecord assignment (dataloader.py:53-67).
"""

from __future__ import annotations

from typing import Optional

import jax

from soft_intro_vae_tpu.parallel.mesh import make_data_mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Call once per host before any jax op. On TPU pods the arguments are
    discovered from the environment automatically; pass them explicitly for
    CPU/GPU clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_data_mesh():
    """1-D data mesh across every chip of every host."""
    return make_data_mesh()


def host_shard_info() -> tuple[int, int]:
    """(process_index, process_count) for per-host data sharding, the analog
    of (rank, world_size) in the reference launcher."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the host that owns side-effect outputs (checkpoints, plots,
    results logs) — the analog of the reference's ``local_rank == 0`` gates
    (train_style_soft_intro_vae.py:207-218,287-299)."""
    return jax.process_index() == 0


def per_host_slice(n_items: int) -> slice:
    """Contiguous per-host slice of a dataset of n_items."""
    rank, world = host_shard_info()
    per = n_items // world
    return slice(rank * per, (rank + 1) * per)
