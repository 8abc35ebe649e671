"""Train state: one donated pytree carrying both subnets' params/opt/stats.

The reference toggles ``requires_grad`` imperatively per phase
(train_soft_intro_vae.py:552-555, 592-595); here each phase takes jax.grad
w.r.t. only its own param subtree — functionally identical, and it lets the
whole two-phase update compile into a single XLA program with donated buffers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params_e: Any
    params_d: Any
    # target decoder for the bootstrap variant; None otherwise
    params_d_target: Any
    # flax 'batch_stats' collections ({} for nets without BN)
    stats_e: Any
    stats_d: Any
    stats_d_target: Any
    opt_e: optax.OptState
    opt_d: optax.OptState
    # current learning rates — traced scalars so MultiStepLR-style schedules
    # never trigger recompilation (the host updates them between epochs)
    lr_e: jax.Array
    lr_d: jax.Array
    rng: jax.Array

    @classmethod
    def create(cls, *, params_e, params_d, opt_e, opt_d, rng, stats_e=None,
               stats_d=None, params_d_target=None, stats_d_target=None,
               lr_e=2e-4, lr_d=2e-4):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params_e=params_e,
            params_d=params_d,
            params_d_target=params_d_target,
            stats_e=stats_e if stats_e is not None else {},
            stats_d=stats_d if stats_d is not None else {},
            stats_d_target=stats_d_target if stats_d_target is not None else {},
            opt_e=opt_e,
            opt_d=opt_d,
            lr_e=jnp.asarray(lr_e, jnp.float32),
            lr_d=jnp.asarray(lr_d, jnp.float32),
            rng=rng,
        )
