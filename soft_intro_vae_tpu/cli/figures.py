"""Style-variant figure tools.

Capability parity with /root/reference/style_soft_intro_vae/make_figures/*
and style_mixing/stylemix_sandwich.py: sample grids, reconstruction pages,
latent interpolation, and style-mixing grids from an (EMA) checkpoint.

Usage: python -m soft_intro_vae_tpu.cli.figures <subcommand> --yaml cfg.yaml -m ckpt ...
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.train.style import MultiResImages, StyleConfig, build_style_training
from soft_intro_vae_tpu.utils.checkpoint import load_checkpoint
from soft_intro_vae_tpu.utils.plotting import save_image_grid


def _load(cfg: StyleConfig, ckpt_path: str):
    model, opt, state, mesh = build_style_training(cfg)
    state, *_ = load_checkpoint(ckpt_path, state)
    return model, state


def _to01(x):
    return np.clip(np.asarray(x) * 0.5 + 0.5, 0, 1)


def generate_samples(cfg: StyleConfig, ckpt_path: str, out: str, count: int = 32,
                     seed: int = 0, use_ema: bool = True, truncation: bool = True) -> str:
    """make_figures/generate_samples.py parity (EMA weights, truncation)."""
    model, state = _load(cfg, ckpt_path)
    pd = state.ema_d if use_ema else state.params_d
    buf = state.ema_buffers if use_ema else state.buffers
    lod = cfg.layer_count - 1
    z = jax.random.normal(jax.random.key(seed), (count, cfg.latent_space_size), jnp.float32)
    rec, _ = model.generate(pd, buf, jax.random.key(seed + 1), lod, None, z,
                            mixing=False, truncation=truncation, update_avg=False)
    return save_image_grid(_to01(rec), out, nrow=8)


def reconstruction_figure(cfg: StyleConfig, ckpt_path: str, dataset: MultiResImages,
                          out: str, count: int = 8, use_ema: bool = True) -> str:
    """make_recon_figure_*: interleaved [real | reconstruction] rows."""
    model, state = _load(cfg, ckpt_path)
    pe = state.ema_e if use_ema else state.params_e
    pd = state.ema_d if use_ema else state.params_d
    buf = state.ema_buffers if use_ema else state.buffers
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    x = next(iter(dataset.epoch(res, count))) / 127.5 - 1.0
    eps = jnp.zeros((count, cfg.latent_space_size))
    z, mu, _ = model.encode(pe, jnp.asarray(x, jnp.float32), lod, None, eps)  # z = mu
    rec, _ = model.generate(pd, buf, jax.random.key(1), lod, None, mu,
                            mixing=False, truncation=False, update_avg=False)
    rows = np.concatenate([_to01(x), _to01(rec)], axis=0)
    return save_image_grid(rows, out, nrow=count)


def interpolation_figure(cfg: StyleConfig, ckpt_path: str, out: str, steps: int = 8,
                         seed: int = 0, use_ema: bool = True) -> str:
    """make_recon_figure_interpolation parity: z-space lerp grid."""
    model, state = _load(cfg, ckpt_path)
    pd = state.ema_d if use_ema else state.params_d
    buf = state.ema_buffers if use_ema else state.buffers
    lod = cfg.layer_count - 1
    za = jax.random.normal(jax.random.key(seed), (2, cfg.latent_space_size), jnp.float32)
    alphas = jnp.linspace(0.0, 1.0, steps)[:, None]
    z = za[0][None] * (1 - alphas) + za[1][None] * alphas
    rec, _ = model.generate(pd, buf, jax.random.key(seed + 1), lod, None, z,
                            mixing=False, truncation=False, update_avg=False)
    return save_image_grid(_to01(rec), out, nrow=steps)


def style_mixing_figure(cfg: StyleConfig, ckpt_path: str, out: str, n_src: int = 4,
                        n_dst: int = 4, crossover: Optional[int] = None, seed: int = 0,
                        use_ema: bool = True) -> str:
    """stylemix_sandwich.py parity: rows take coarse styles from the source
    column, fine styles from the destination row (cutoff = ``crossover``)."""
    model, state = _load(cfg, ckpt_path)
    pd = state.ema_d if use_ema else state.params_d
    buf = state.ema_buffers if use_ema else state.buffers
    lod = cfg.layer_count - 1
    num_layers = model.num_layers
    crossover = crossover if crossover is not None else num_layers // 2

    k1, k2 = jax.random.split(jax.random.key(seed))
    z_src = jax.random.normal(k1, (n_src, cfg.latent_space_size), jnp.float32)
    z_dst = jax.random.normal(k2, (n_dst, cfg.latent_space_size), jnp.float32)
    s_src = model.mapping_fl.apply({"params": pd["mapping_fl"]}, z_src)[:, 0]
    s_dst = model.mapping_fl.apply({"params": pd["mapping_fl"]}, z_dst)[:, 0]

    def decode(styles):
        return model.decoder.apply({"params": pd["decoder"]}, styles, lod,
                                   jax.random.key(seed + 2))

    layer_idx = jnp.arange(num_layers)[None, :, None]
    rows = []
    # header row: source images
    rows.append(_to01(decode(jnp.repeat(s_src[:, None, :], num_layers, 1))))
    for j in range(n_dst):
        dst = jnp.repeat(s_dst[j][None, None, :], num_layers, 1)
        mixed = jnp.where(layer_idx < crossover,
                          jnp.broadcast_to(dst, (n_src, num_layers, cfg.latent_space_size)),
                          jnp.repeat(s_src[:, None, :], num_layers, 1))
        rows.append(_to01(decode(mixed)))
    grid = np.concatenate(rows, axis=0)
    return save_image_grid(grid, out, nrow=n_src)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="style-figures")
    sub = ap.add_subparsers(dest="command", required=True)
    for name in ("samples", "recon", "interpolation", "stylemix"):
        p = sub.add_parser(name)
        p.add_argument("--yaml", type=str, default=None)
        p.add_argument("-m", "--model", type=str, required=True)
        p.add_argument("-o", "--out", type=str, required=True)
        p.add_argument("--seed", type=int, default=0)
        if name == "recon":
            # real side: DATASET.PATH %-pattern from the yaml, or synthetic
            p.add_argument("--count", type=int, default=8)
    args = ap.parse_args(argv)
    cfg = StyleConfig.from_yaml(args.yaml) if args.yaml else StyleConfig()
    if args.command == "samples":
        print(generate_samples(cfg, args.model, args.out, seed=args.seed))
    elif args.command == "recon":
        from soft_intro_vae_tpu.train.style import make_style_dataset

        if not (cfg.dataset_path and "%" in cfg.dataset_path):
            cfg.use_synthetic = True
        print(reconstruction_figure(cfg, args.model, make_style_dataset(cfg),
                                    args.out, count=args.count))
    elif args.command == "interpolation":
        print(interpolation_figure(cfg, args.model, args.out, seed=args.seed))
    elif args.command == "stylemix":
        print(style_mixing_figure(cfg, args.model, args.out, seed=args.seed))


if __name__ == "__main__":
    main()
