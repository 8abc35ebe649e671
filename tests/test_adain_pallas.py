"""Parity tests for the fused bias+lrelu+IN(+AdaIN) Pallas kernel
(ops/adain_pallas.py) against the pure-jnp oracle, in interpret mode.

Semantics under test match the reference's decode/encode norm sites
(style_soft_intro_vae/net.py:97-181). The kernel is opt-in on TPU
(measured A/B in BENCH_NOTES.md); these tests keep it correct either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.ops.adain_pallas import (
    fused_bias_act_norm,
    reference_bias_act_norm,
)

rng = np.random.default_rng(7)


def _args(mode, affine, B=2, H=8, W=8, C=16, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 2 + 0.3, dtype)
    bias = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    kw = dict(mode=mode, eps=1e-5, corr_scale=1.414)
    if affine:
        kw["g"] = jnp.asarray(rng.normal(size=(B, C)) + 1, jnp.float32)
        kw["b"] = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    if mode == "noise":
        kw["n"] = jnp.asarray(rng.normal(size=(B, H, W)), jnp.float32)
        kw["nw"] = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    return x, bias, kw


@pytest.mark.parametrize("mode", ["plain", "noise", "corr"])
@pytest.mark.parametrize("affine", [True, False])
def test_forward_matches_oracle(mode, affine):
    x, bias, kw = _args(mode, affine)
    y1, m1, v1 = fused_bias_act_norm(x, bias, interpret=True, **kw)
    y2, m2, v2 = reference_bias_act_norm(x, bias, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)


def test_multi_tile_accumulation():
    # S > tile: the sequential-grid moment accumulation must match exactly
    x, bias, kw = _args("plain", True, B=1, H=64, W=32, C=128)
    y1, m1, v1 = fused_bias_act_norm(x, bias, interpret=True, **kw)
    y2, m2, v2 = reference_bias_act_norm(x, bias, **kw)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # interpret-mode custom-VJP grads are compile-heavy on CPU
@pytest.mark.parametrize("mode,affine", [("noise", True), ("plain", False), ("corr", True)])
def test_grads_match_oracle(mode, affine):
    x, bias, kw = _args(mode, affine, dtype=jnp.float32)

    def loss(fn, interp, x, bias):
        kw2 = dict(kw)
        y, m, v = fn(x, bias, interpret=True, **kw2) if interp else fn(x, bias, **kw2)
        # touch y, m, v so every output cotangent path is exercised
        w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) / y.size
        return (jnp.sum(y.astype(jnp.float32) * w) + 0.7 * jnp.sum(m)
                + jnp.sum(jnp.sqrt(v + 1e-12)))

    g1 = jax.grad(lambda x, b: loss(fused_bias_act_norm, True, x, b), argnums=(0, 1))(x, bias)
    g2 = jax.grad(lambda x, b: loss(reference_bias_act_norm, False, x, b), argnums=(0, 1))(x, bias)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5)


def test_noise_mode_requires_noise_args():
    x, bias, kw = _args("plain", False)
    with pytest.raises(ValueError, match="noise"):
        fused_bias_act_norm(x, bias, mode="noise", interpret=True)


def test_unknown_mode_raises():
    x, bias, _ = _args("plain", False)
    with pytest.raises(ValueError, match="unknown mode"):
        fused_bias_act_norm(x, bias, mode="bogus", interpret=True)
