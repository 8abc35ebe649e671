"""LREQAdam as an optax transform.

Capability parity with /root/reference/style_soft_intro_vae/custom_adam.py:
beta1 forced to 0 (no first moment, :30-31,66-70), second moment EMA with
bias-corrected *step size* (denom uses the raw sqrt(v)+eps, :86-88):

    v <- beta2 * v + (1 - beta2) * g^2
    update = sqrt(1 - beta2^t) * g / (sqrt(v) + eps)

The reference's per-param ``lr_equalization_coef`` step scaling (:91-92) is
unnecessary here: our lreq layers use explicit forward scaling
(models/lreq.py), which with beta1=0 Adam yields identical effective-weight
dynamics (see that module's docstring).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LreqAdamState(NamedTuple):
    count: jax.Array
    nu: optax.Updates


def scale_by_lreq_adam(beta2: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return LreqAdamState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        del params
        nu = jax.tree_util.tree_map(lambda v, g: beta2 * v + (1 - beta2) * (g * g), state.nu, updates)
        count = state.count + 1
        bc2 = jnp.sqrt(1.0 - beta2 ** count.astype(jnp.float32))
        out = jax.tree_util.tree_map(lambda g, v: bc2 * g / (jnp.sqrt(v) + eps), updates, nu)
        return out, LreqAdamState(count=count, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
