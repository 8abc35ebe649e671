"""Pallas chamfer kernel vs the XLA reference implementation (values + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.ops.chamfer import chamfer_distance
from soft_intro_vae_tpu.ops.chamfer_pallas import chamfer_distance_pallas


def _clouds(b, n, m, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randn(b, n, 3).astype(np.float32) * 0.3,
            rs.randn(b, m, 3).astype(np.float32) * 0.3)


class TestChamferPallas:
    def test_matches_xla_square(self):
        preds, gts = _clouds(2, 64, 64, 1)
        ref = chamfer_distance(jnp.array(preds), jnp.array(gts))
        got = chamfer_distance_pallas(jnp.array(preds), jnp.array(gts), 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_matches_xla_rectangular(self):
        preds, gts = _clouds(3, 48, 96, 2)
        ref = chamfer_distance(jnp.array(preds), jnp.array(gts))
        got = chamfer_distance_pallas(jnp.array(preds), jnp.array(gts), 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_odd_tile_fallback(self):
        # n not divisible by the requested tile: divisor search kicks in
        preds, gts = _clouds(1, 24, 24, 3)
        ref = chamfer_distance(jnp.array(preds), jnp.array(gts))
        got = chamfer_distance_pallas(jnp.array(preds), jnp.array(gts), 256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_zero_for_identical(self):
        x = _clouds(2, 32, 32, 4)[0]
        got = chamfer_distance_pallas(jnp.array(x), jnp.array(x), 32)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-5)

    def test_grads_match_xla(self):
        preds, gts = _clouds(2, 32, 40, 5)
        p, g = jnp.array(preds), jnp.array(gts)

        def loss_ref(p, g):
            return jnp.sum(chamfer_distance(p, g))

        def loss_pal(p, g):
            return jnp.sum(chamfer_distance_pallas(p, g, 16))

        gp_ref, gg_ref = jax.grad(loss_ref, argnums=(0, 1))(p, g)
        gp_pal, gg_pal = jax.grad(loss_pal, argnums=(0, 1))(p, g)
        np.testing.assert_allclose(np.asarray(gp_pal), np.asarray(gp_ref), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gg_pal), np.asarray(gg_ref), rtol=1e-3, atol=1e-4)

    def test_jits_and_vmaps_into_train_shapes(self):
        preds, gts = _clouds(4, 128, 128, 6)
        f = jax.jit(lambda p, g: chamfer_distance_pallas(p, g, 64))
        out = f(jnp.array(preds), jnp.array(gts))
        assert out.shape == (4,)
        assert np.isfinite(np.asarray(out)).all()
