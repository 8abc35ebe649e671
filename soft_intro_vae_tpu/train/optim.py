"""Optimizers and LR schedules.

Adam matches torch.optim.Adam semantics (step = lr * m_hat / (sqrt(v_hat)+eps),
the reference's optimizer at train_soft_intro_vae.py:450-451). The learning
rate is applied *outside* the transform from a traced scalar held in
TrainState, so MultiStepLR changes (reference :453-454) are free — no
recompilation, no schedule baked into the compiled program.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """LR-less Adam; scale by -lr at apply time via ``apply_updates_with_lr``."""
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)


def apply_updates_with_lr(params, updates, lr: jax.Array):
    """params - lr * adam_direction (direction from ``adam`` above)."""
    return jax.tree_util.tree_map(lambda p, u: p - lr * u.astype(p.dtype), params, updates)


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """torch MultiStepLR: lr = base * gamma^(#milestones passed). Host-side."""

    def schedule(t: int) -> float:
        n = sum(1 for m in milestones if t >= m)
        return base_lr * (gamma**n)

    return schedule
