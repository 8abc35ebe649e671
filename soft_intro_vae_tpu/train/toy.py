"""2D toy trainer — the minimal end-to-end Soft-IntroVAE slice.

Capability parity with train_soft_intro_vae_toy
(/root/reference/soft_intro_vae_2d/train_soft_intro_vae_2d.py:486-725):
iteration-based loop, vanilla-VAE warm-up for ``num_vae`` iters, E/D
introspective steps with dim_scale=0.5 (:515), MultiStepLR milestones
(10000, 15000) gamma 0.1 stepped per iteration (:510-512,659-660), NaN abort
(:656-658), final gnELBO / sample-KL / JSD metrics appended to a results log
(:703-724).

TPU-first deltas: the whole iteration is one jitted donated step; metrics are
fetched only at ``test_iter`` boundaries instead of every iteration.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.data.toy import ToyDataset
from soft_intro_vae_tpu.metrics.toy import grid_normalized_elbo, sample_kl_2d, setup_grid
from soft_intro_vae_tpu.models.mlp import DecoderMLP, EncoderMLP
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps
from soft_intro_vae_tpu.utils.checkpoint import Checkpointer


@dataclasses.dataclass
class ToyConfig:
    dataset: str = "8Gaussians"
    z_dim: int = 2
    lr_e: float = 2e-4
    lr_d: float = 2e-4
    batch_size: int = 32
    n_iter: int = 30000
    num_vae: int = 0
    recon_loss_type: str = "mse"
    beta_kl: float = 1.0
    beta_rec: float = 1.0
    beta_neg: float = 1.0
    gamma_r: float = 1e-8
    test_iter: int = 5000
    save_interval: int = 5000
    seed: int = -1
    scale: float = 1.0          # plot/metric half-range multiplier
    n_layers: int = 3
    num_hidden: int = 256
    result_dir: str = "./results_toy"
    save_checkpoints: bool = False
    save_figures: bool = False
    verbose: bool = True


def build_toy(cfg: ToyConfig):
    """Construct modules, functional applies, steps, and the initial state."""
    enc = EncoderMLP(x_dim=2, z_dim=cfg.z_dim, n_layers=cfg.n_layers, num_hidden=cfg.num_hidden)
    dec = DecoderMLP(x_dim=2, z_dim=cfg.z_dim, n_layers=cfg.n_layers, num_hidden=cfg.num_hidden)

    def encode(params, stats, x):
        return enc.apply({"params": params}, x), stats

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    seed = cfg.seed if cfg.seed != -1 else int(time.time()) % (2**31)
    root = jax.random.key(seed)
    k_e, k_d, k_state = jax.random.split(root, 3)
    params_e = enc.init(k_e, jnp.zeros((1, 2)))["params"]
    params_d = dec.init(k_d, jnp.zeros((1, cfg.z_dim)))["params"]

    opt = optim.adam()
    state = TrainState.create(
        params_e=params_e,
        params_d=params_d,
        opt_e=opt.init(params_e),
        opt_d=opt.init(params_d),
        rng=k_state,
        lr_e=cfg.lr_e,
        lr_d=cfg.lr_d,
    )
    step_cfg = StepConfig(
        z_dim=cfg.z_dim,
        beta_rec=cfg.beta_rec,
        beta_kl=cfg.beta_kl,
        beta_neg=cfg.beta_neg,
        gamma_r=cfg.gamma_r,
        scale=0.5,  # dim_scale, reference :515
        loss_type=cfg.recon_loss_type,
    )
    vanilla_step, intro_step = build_train_steps(encode=encode, decode=decode, optimizer=opt, cfg=step_cfg)
    return enc, dec, state, vanilla_step, intro_step


def make_eval_fns(enc: EncoderMLP, dec: DecoderMLP):
    """Deterministic forward + sampler closures over (params_e, params_d)."""

    def det_fwd(params_e, params_d, x):
        mu, logvar = enc.apply({"params": params_e}, x)
        rec = dec.apply({"params": params_d}, mu)
        return mu, logvar, rec

    def sample(params_d, rng, n, z_dim):
        z = jax.random.normal(rng, (n, z_dim), jnp.float32)
        return dec.apply({"params": params_d}, z)

    return det_fwd, jax.jit(sample, static_argnums=(2, 3))


def train_soft_intro_vae_toy(cfg: ToyConfig, sampler: Optional[ToyDataset] = None):
    """Run the toy recipe; returns (state, results dict)."""
    if sampler is None:
        sampler = ToyDataset(distr=cfg.dataset, seed=max(cfg.seed, 0))
    scale = cfg.scale * sampler.range

    enc, dec, state, vanilla_step, intro_step = build_toy(cfg)
    det_fwd, sample = make_eval_fns(enc, dec)
    lr_sched_e = optim.multistep_lr(cfg.lr_e, (10000, 15000), 0.1)
    lr_sched_d = optim.multistep_lr(cfg.lr_d, (10000, 15000), 0.1)
    ckpt = Checkpointer(os.path.join(cfg.result_dir, "saves")) if cfg.save_checkpoints else None

    start = time.time()
    metrics = {}
    for it in range(cfg.n_iter):
        batch = jnp.asarray(sampler.next_batch(batch_size=cfg.batch_size))
        step_fn = vanilla_step if it < cfg.num_vae else intro_step
        state, metrics = step_fn(state, batch)
        # per-iteration scheduler (reference :659-660)
        state = state.replace(
            lr_e=jnp.asarray(lr_sched_e(it + 1), jnp.float32),
            lr_d=jnp.asarray(lr_sched_d(it + 1), jnp.float32),
        )
        if it % cfg.test_iter == 0 or it == cfg.n_iter - 1:
            host = {k: float(v) for k, v in metrics.items()}
            if any(np.isnan(v) for v in host.values()):
                raise SystemError("loss is NaN.")
            # observation-only deterministic reconstruction error (reference
            # :573-578 computes it per-iter; we compute at log cadence)
            mu_d, _, rec_d = det_fwd(state.params_e, state.params_d, batch)
            from soft_intro_vae_tpu.ops.losses import reconstruction_loss as _rl
            host["rec_det"] = float(_rl(batch, rec_d, cfg.recon_loss_type, "mean"))
            if cfg.verbose:
                keys = ", ".join(f"{k}: {v:.4f}" for k, v in host.items())
                print(f"Iter {it}/{cfg.n_iter} time {time.time() - start:.1f}s: {keys}")
            if cfg.save_figures and (it > 0 or it == cfg.n_iter - 1):
                from soft_intro_vae_tpu.utils.plotting import save_scatter_2d

                k_plot = jax.random.fold_in(state.rng, 10**7 + it)
                fakes = np.asarray(sample(state.params_d, k_plot, 1024, cfg.z_dim))
                name = (f"{cfg.dataset}_bkl_{cfg.beta_kl}_bneg_{cfg.beta_neg}"
                        f"_brec_{cfg.beta_rec}_seed_{cfg.seed}_iter_{it}.png")
                save_scatter_2d(fakes, os.path.join(cfg.result_dir, name), lim=scale * 2)
        if ckpt is not None and it > 0 and it % cfg.save_interval == 0:
            ckpt.save(state, epoch=it, iteration=it)

    # final quantitative metrics (reference :703-724)
    pe, pd = state.params_e, state.params_d
    fwd = lambda x: det_fwd(pe, pd, x)
    k_fake = jax.random.fold_in(state.rng, 10**6)

    def sample_np(n):
        return np.asarray(sample(pd, k_fake, n, cfg.z_dim))

    if cfg.save_figures:
        from soft_intro_vae_tpu.metrics.toy import vae_density
        from soft_intro_vae_tpu.utils.plotting import save_density_2d, save_scatter_2d

        real = np.asarray(sampler.next_batch(batch_size=1024))
        save_scatter_2d(real, os.path.join(cfg.result_dir, f"{cfg.dataset}_real.png"),
                        lim=scale * 2, color="C0")
        dens_grid = setup_grid(range_lim=scale * 2, n_pts=1024)
        dens = vae_density(fwd, dens_grid, beta_kl=1.0, beta_rec=1.0)
        save_density_2d(dens, 1024, os.path.join(cfg.result_dir, f"density_{cfg.dataset}.png"))

    res = {}
    res["sample_kl"] = sample_kl_2d(sample_np, sampler, num_samples=5000, hist_bins=100,
                                    use_jsd=False, xy_range=(-2 * scale, 2 * scale))
    res["jsd"] = sample_kl_2d(sample_np, sampler, num_samples=5000, hist_bins=100,
                              use_jsd=True, xy_range=(-2 * scale, 2 * scale))
    grid = setup_grid(range_lim=scale * 2, n_pts=1024)
    res["gn_elbo"] = grid_normalized_elbo(fwd, sampler, grid, beta_kl=1.0, beta_rec=1.0, batch_size=128)

    os.makedirs(cfg.result_dir, exist_ok=True)
    with open(os.path.join(cfg.result_dir, "results_log_soft_intro_vae.txt"), "a") as fp:
        fp.write(
            f"{cfg.dataset}_beta_kl_{cfg.beta_kl}_beta_neg_{cfg.beta_neg}_beta_rec_{cfg.beta_rec}"
            f"_gnelbo_{res['gn_elbo']}_kl_{res['sample_kl']}_jsd_{res['jsd']}_seed_{cfg.seed}\n"
        )
    if cfg.verbose:
        print(f"gn_elbo: {res['gn_elbo']:.4e}, kl: {res['sample_kl']:.4f}, jsd: {res['jsd']:.4f}")
    return state, res
