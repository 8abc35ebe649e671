"""MLP Soft-IntroVAE for 2D toy distributions.

Capability parity with the reference's Simple trio
(/root/reference/soft_intro_vae_2d/train_soft_intro_vae_2d.py:402-483):
3-hidden-layer ReLU MLPs, encoder emits concatenated (mu, logvar).

The reference decoder carries an unused ``loggamma`` parameter (:432); it is
intentionally omitted here (it receives no gradient and affects nothing).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.models.initializers import torch_kaiming_uniform, torch_bias_uniform

Array = jax.Array


def _dense(features: int, fan_in: int, name: str | None = None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(fan_in),
        name=name,
        dtype=jnp.float32,
    )


class EncoderMLP(nn.Module):
    """x -> (mu, logvar). Mirrors EncoderSimple (:402-421)."""

    x_dim: int = 2
    z_dim: int = 2
    n_layers: int = 2
    num_hidden: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        h = nn.relu(_dense(self.num_hidden, self.x_dim, "input")(x))
        for i in range(self.n_layers):
            h = nn.relu(_dense(self.num_hidden, self.num_hidden, f"hidden_{i + 1}")(h))
        y = _dense(2 * self.z_dim, self.num_hidden, "output")(h)
        mu, logvar = jnp.split(y, 2, axis=-1)
        return mu, logvar


class DecoderMLP(nn.Module):
    """z -> x_hat. Mirrors DecoderSimple (:424-444)."""

    x_dim: int = 2
    z_dim: int = 2
    n_layers: int = 2
    num_hidden: int = 64

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = z.reshape(z.shape[0], -1)
        h = nn.relu(_dense(self.num_hidden, self.z_dim, "input")(h))
        for i in range(self.n_layers):
            h = nn.relu(_dense(self.num_hidden, self.num_hidden, f"hidden_{i + 1}")(h))
        return _dense(self.x_dim, self.num_hidden, "output")(h)
