"""PyTorch-style default initializers, for training-trajectory parity.

The reference never customizes initialization, so it inherits torch defaults:
  * Conv/Linear weight: kaiming_uniform(a=sqrt(5))  ==  U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  * Conv/Linear bias:   U(-1/sqrt(fan_in), 1/sqrt(fan_in))

kaiming_uniform with a=sqrt(5) has gain sqrt(2/(1+5)) = sqrt(1/3) and bound
gain*sqrt(3/fan_in) = sqrt(1/fan_in); that equals variance_scaling with
scale=1/3, mode=fan_in, uniform (limit = sqrt(3*scale/fan_in)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# torch nn.Conv2d / nn.Linear default weight init
torch_kaiming_uniform = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_uniform(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
