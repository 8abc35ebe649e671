"""Unit tests for loss primitives: closed forms + torch cross-checks.

torch (CPU) is used only as an independent oracle for the math the reference
defines with torch functional ops — no reference code is imported.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from soft_intro_vae_tpu.ops import (
    chamfer_distance,
    chamfer_distance_tiled,
    exp_elbo,
    kl_divergence,
    per_sample_recon,
    reconstruction_loss,
    reparameterize,
)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestKL:
    def test_standard_normal_closed_form(self):
        # KL(N(mu, sigma^2) || N(0, 1)) = 0.5*(mu^2 + sigma^2 - log sigma^2 - 1)
        mu = _rand((4, 8), 1)
        logvar = _rand((4, 8), 2) * 0.3
        expect = 0.5 * (mu**2 + np.exp(logvar) - logvar - 1).sum(1)
        got = kl_divergence(jnp.array(mu), jnp.array(logvar), reduce="none")
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)

    def test_zero_at_prior(self):
        mu = jnp.zeros((2, 16))
        logvar = jnp.zeros((2, 16))
        assert float(kl_divergence(mu, logvar, reduce="sum")) == pytest.approx(0.0)

    def test_general_prior_matches_analytic(self):
        # KL(N(m,s^2)||N(mo,so^2)) = log(so/s) + (s^2+(m-mo)^2)/(2 so^2) - 1/2
        mu = _rand((5, 3), 3)
        logvar = _rand((5, 3), 4) * 0.2
        mu_o, logvar_o = 0.7, -0.4
        s2, so2 = np.exp(logvar), np.exp(logvar_o)
        expect = (0.5 * (logvar_o - logvar) + (s2 + (mu - mu_o) ** 2) / (2 * so2) - 0.5).sum(1)
        got = kl_divergence(jnp.array(mu), jnp.array(logvar), mu_o=mu_o, logvar_o=logvar_o, reduce="none")
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)

    def test_narrow_prior_3d_form(self):
        # the 3D variant's prior: logvar_o = log(prior_std^2), prior_std=0.2
        prior_logvar = float(np.log(0.2**2))
        mu = _rand((3, 128), 5)
        logvar = _rand((3, 128), 6) * 0.1
        got_mean = kl_divergence(jnp.array(mu), jnp.array(logvar), logvar_o=prior_logvar, reduce="mean")
        got_none = kl_divergence(jnp.array(mu), jnp.array(logvar), logvar_o=prior_logvar, reduce="none")
        np.testing.assert_allclose(float(got_mean), np.asarray(got_none).mean(), rtol=1e-6)

    def test_reductions(self):
        mu, logvar = _rand((4, 8), 7), _rand((4, 8), 8)
        none = np.asarray(kl_divergence(jnp.array(mu), jnp.array(logvar), reduce="none"))
        assert none.shape == (4,)
        assert float(kl_divergence(jnp.array(mu), jnp.array(logvar), reduce="sum")) == pytest.approx(none.sum(), rel=1e-5)
        assert float(kl_divergence(jnp.array(mu), jnp.array(logvar), reduce="mean")) == pytest.approx(none.mean(), rel=1e-5)


class TestReparameterize:
    def test_moments(self):
        mu = jnp.full((20000, 2), 1.5)
        logvar = jnp.full((20000, 2), np.log(0.25))
        z = reparameterize(jax.random.key(0), mu, logvar)
        assert float(jnp.mean(z)) == pytest.approx(1.5, abs=0.02)
        assert float(jnp.std(z)) == pytest.approx(0.5, abs=0.02)

    def test_deterministic_given_key(self):
        mu, logvar = jnp.ones((4, 3)), jnp.zeros((4, 3))
        z1 = reparameterize(jax.random.key(7), mu, logvar)
        z2 = reparameterize(jax.random.key(7), mu, logvar)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    def test_grad_flows_to_mu_and_logvar(self):
        def f(mu, logvar):
            return jnp.sum(reparameterize(jax.random.key(0), mu, logvar))

        g_mu, g_lv = jax.grad(f, argnums=(0, 1))(jnp.ones((2, 2)), jnp.zeros((2, 2)))
        np.testing.assert_allclose(np.asarray(g_mu), 1.0)
        assert np.abs(np.asarray(g_lv)).sum() > 0


class TestReconstruction:
    """Cross-check against torch F.* — the reference's definitions."""

    def setup_method(self):
        self.x = _rand((6, 3, 8, 8), 10) * 0.25 + 0.5
        self.r = _rand((6, 3, 8, 8), 11) * 0.25 + 0.5
        self.x = np.clip(self.x, 0.01, 0.99)
        self.r = np.clip(self.r, 0.01, 0.99)
        self.tx = torch.tensor(self.x).view(6, -1)
        self.tr = torch.tensor(self.r).view(6, -1)

    @pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
    def test_mse(self, reduction):
        ref = F.mse_loss(self.tr, self.tx, reduction="none").sum(1)
        if reduction == "sum":
            ref = ref.sum()
        elif reduction == "mean":
            ref = ref.mean()
        got = reconstruction_loss(jnp.array(self.x), jnp.array(self.r), "mse", reduction)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-5)

    @pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
    def test_l1(self, reduction):
        ref = F.l1_loss(self.tr, self.tx, reduction=reduction)
        got = reconstruction_loss(jnp.array(self.x), jnp.array(self.r), "l1", reduction)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-5)

    @pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
    def test_bce(self, reduction):
        ref = F.binary_cross_entropy(self.tr, self.tx, reduction=reduction)
        got = reconstruction_loss(jnp.array(self.x), jnp.array(self.r), "bce", reduction)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_per_sample_recon_matches_summed_none(self):
        for lt in ["mse", "l1", "bce"]:
            got = per_sample_recon(jnp.array(self.x), jnp.array(self.r), lt)
            assert got.shape == (6,)


class TestExpElbo:
    def test_value(self):
        rec = jnp.array([1.0, 2.0])
        kl = jnp.array([0.5, 0.25])
        scale = 0.5
        out = exp_elbo(rec, kl, scale, beta_rec=2.0, beta_neg=4.0)
        expect = np.mean(np.exp(-2 * scale * (2.0 * np.array([1, 2.0]) + 4.0 * np.array([0.5, 0.25]))))
        assert float(out) == pytest.approx(expect, rel=1e-5)

    def test_monotone_decreasing_in_kl(self):
        rec = jnp.ones((8,))
        lo = exp_elbo(rec, jnp.ones((8,)) * 0.1, 1.0, 1.0, 1.0)
        hi = exp_elbo(rec, jnp.ones((8,)) * 2.0, 1.0, 1.0, 1.0)
        assert float(lo) > float(hi)

    def test_underflow_is_zero_not_nan(self):
        out = exp_elbo(jnp.array([1e6]), jnp.array([1e6]), 1.0, 1.0, 1.0)
        assert float(out) == 0.0


class TestChamfer:
    def _torch_chamfer(self, preds, gts):
        # independent oracle via torch.cdist
        p = torch.cdist(torch.tensor(gts), torch.tensor(preds)) ** 2
        return (p.min(1).values.sum(1) + p.min(2).values.sum(1)).numpy()

    def test_matches_torch_cdist(self):
        preds = _rand((4, 64, 3), 20)
        gts = _rand((4, 48, 3), 21)
        got = chamfer_distance(jnp.array(preds), jnp.array(gts))
        np.testing.assert_allclose(np.asarray(got), self._torch_chamfer(preds, gts), rtol=1e-3, atol=1e-3)

    def test_zero_for_identical_clouds(self):
        x = _rand((2, 32, 3), 22)
        got = chamfer_distance(jnp.array(x), jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-4)

    def test_tiled_matches_dense(self):
        preds = _rand((2, 128, 3), 23)
        gts = _rand((2, 96, 3), 24)
        dense = chamfer_distance(jnp.array(preds), jnp.array(gts))
        tiled = chamfer_distance_tiled(jnp.array(preds), jnp.array(gts), tile=32)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense), rtol=1e-5)

    def test_grad_exists(self):
        preds = jnp.array(_rand((1, 16, 3), 25))
        gts = jnp.array(_rand((1, 16, 3), 26))
        g = jax.grad(lambda p: jnp.sum(chamfer_distance(p, gts)))(preds)
        assert np.isfinite(np.asarray(g)).all()


class TestToyDistributions:
    """All six procedural 2D distributions produce valid batches."""

    def test_all_distributions(self):
        from soft_intro_vae_tpu.data.toy import DISTRIBUTIONS, ToyDataset

        for d in DISTRIBUTIONS:
            ds = ToyDataset(d, seed=0)
            b = ds.next_batch(64)
            assert b.shape == (64, 2), d
            assert np.isfinite(b).all(), d

    def test_8gaussians_statistics(self):
        from soft_intro_vae_tpu.data.toy import ToyDataset

        ds = ToyDataset("8Gaussians", seed=1)
        b = ds.next_batch(20000)
        # modes at radius scale/1.414 = 2/1.414 ~ 1.414
        r = np.linalg.norm(b, axis=1)
        assert abs(r.mean() - 1.414) < 0.05

    def test_sequential_modes_cycle(self):
        from soft_intro_vae_tpu.data.toy import ToyDataset

        ds = ToyDataset("Sequential8Gaussians", seed=2, iter_per_mode=1)
        centers = [ds.next_batch(4).mean(0) for _ in range(8)]
        # eight distinct cluster centers
        dists = [np.linalg.norm(centers[i] - centers[(i + 1) % 8]) for i in range(8)]
        assert min(dists) > 0.3
