"""Quantitative 2D metrics: grid-normalized ELBO, histogram KL / JSD.

Capability parity with /root/reference/soft_intro_vae_2d/train_soft_intro_vae_2d.py:
  * setup_grid (:217-221)
  * calculate_elbo_with_grid (:345-373)
  * calculate_sample_kl (:376-394) — torch F.kl_div 'batchmean' semantics
    reproduced exactly (divide by the first histogram dim, 0*log0 := 0).

The forward sweeps are jitted and batched on device; the tiny histogram /
reduction tail runs on host (eval-only, not perf-critical).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.ops.losses import kl_divergence, per_sample_recon

# model_fwd(x) -> (mu, logvar, rec): deterministic (z = mu) forward in eval mode
DeterministicFwd = Callable[[jax.Array], Tuple[jax.Array, jax.Array, jax.Array]]


def setup_grid(range_lim: float = 4.0, n_pts: int = 1000) -> np.ndarray:
    """Flattened (n_pts^2, 2) grid over [-range_lim, range_lim]^2 (:217-221)."""
    x = np.linspace(-range_lim, range_lim, n_pts, dtype=np.float32)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel()], axis=1)


def _neg_elbo_batch(model_fwd: DeterministicFwd, x: jax.Array, beta_kl: float, beta_rec: float) -> jax.Array:
    mu, logvar, rec = model_fwd(x)
    recon = per_sample_recon(x, rec, "mse")
    kl = kl_divergence(mu, logvar, reduce="none")
    return beta_kl * kl + beta_rec * recon


def grid_normalized_elbo(
    model_fwd: DeterministicFwd,
    sampler,
    grid: np.ndarray,
    beta_kl: float = 1.0,
    beta_rec: float = 1.0,
    batch_size: int = 512,
    num_iter: int = 100,
    grid_chunk: int = 65536,
) -> float:
    """calculate_elbo_with_grid (:345-373): mean data neg-ELBO normalized by
    the summed neg-ELBO over (grid + data).

    The grid sweep runs in large device chunks (per-point values are
    batching-invariant); data batches keep the reference's batch_size draws.
    """
    grid_sum = float(_chunked_vals(model_fwd, grid, beta_kl, beta_rec, grid_chunk).sum())
    fwd = jax.jit(lambda x: _neg_elbo_batch(model_fwd, x, beta_kl, beta_rec))
    data_vals = []
    for _ in range(num_iter):
        batch = sampler.next_batch(batch_size=batch_size)
        data_vals.append(np.asarray(fwd(jnp.asarray(batch))))
    elbos = np.concatenate(data_vals)
    normalizing = grid_sum + elbos.sum()
    return float((elbos / normalizing).mean())


def _chunked_vals(model_fwd, grid: np.ndarray, beta_kl: float, beta_rec: float, chunk: int) -> np.ndarray:
    fwd = jax.jit(lambda x: _neg_elbo_batch(model_fwd, x, beta_kl, beta_rec))
    n = grid.shape[0]
    pad = (-n) % chunk
    gpad = np.concatenate([grid, np.zeros((pad, 2), np.float32)], axis=0)
    vals = [np.asarray(fwd(jnp.asarray(gpad[i : i + chunk]))) for i in range(0, gpad.shape[0], chunk)]
    return np.concatenate(vals)[:n]


def _kl_div_batchmean(log_q: np.ndarray, p: np.ndarray) -> float:
    """torch F.kl_div(input=log_q, target=p, reduction='batchmean') with the
    0*log(0)=0 convention; 'batch' = first dim of the histogram."""
    term = np.where(p > 0, p * (np.log(np.where(p > 0, p, 1.0)) - log_q), 0.0)
    return float(term.sum() / p.shape[0])


def sample_kl_2d(
    sample_model: Callable[[int], np.ndarray],
    sampler,
    num_samples: int = 5000,
    hist_bins: int = 100,
    use_jsd: bool = False,
    xy_range: Tuple[float, float] = (-2, 2),
) -> float:
    """calculate_sample_kl (:376-394): histogram KL(fake||real) or JSD."""
    hist_range = [list(xy_range), list(xy_range)]
    real = np.asarray(sampler.next_batch(batch_size=num_samples))
    real_hist, _, _ = np.histogram2d(real[:, 0], real[:, 1], bins=hist_bins, density=True, range=hist_range)
    fake = np.asarray(sample_model(num_samples))
    fake_hist, _, _ = np.histogram2d(fake[:, 0], fake[:, 1], bins=hist_bins, density=True, range=hist_range)
    if use_jsd:
        m = 0.5 * (fake_hist + real_hist)
        kl_1 = _kl_div_batchmean(np.log(real_hist + 1e-14), m)
        kl_2 = _kl_div_batchmean(np.log(fake_hist + 1e-14), m)
        return 0.5 * (kl_1 + kl_2)
    return _kl_div_batchmean(np.log(fake_hist + 1e-14), real_hist)


def vae_density(
    model_fwd: DeterministicFwd,
    grid: np.ndarray,
    beta_kl: float = 1.0,
    beta_rec: float = 1.0,
    chunk: int = 65536,
) -> np.ndarray:
    """plot_vae_density's p(x) ≈ exp(-(βkl·kl + βrec·rec)) on a grid (:232-258)."""
    return np.exp(-_chunked_vals(model_fwd, grid, beta_kl, beta_rec, chunk))
