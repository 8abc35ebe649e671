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
    # astype first: uint8-storage datasets (train/style.py host_storage)
    # must normalize in f32, same as the trainer's host path
    x = next(iter(dataset.epoch(res, count))).astype(np.float32) / 127.5 - 1.0
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


def _load_sample_images(samples_dir: str, im_size: int, names=None,
                        shuffle_seed: Optional[int] = None) -> np.ndarray:
    """Folder -> (N, im_size, im_size, 3) f32 in [-1, 1].

    Mirrors the make_figures loaders (make_recon_figure_paged.py:143-156):
    drop alpha, scale by /127.5-1, average-pool an integer factor down to
    the model resolution."""
    from PIL import Image

    if names is None:
        names = sorted(os.listdir(samples_dir))
        if shuffle_seed is not None:
            import random

            random.Random(shuffle_seed).shuffle(names)
    out = []
    for name in names:
        img = np.asarray(Image.open(os.path.join(samples_dir, name)))
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        img = img[:, :, :3].astype(np.float32) / 127.5 - 1.0
        factor = img.shape[0] // im_size
        if factor > 1:
            h = (img.shape[0] // factor) * factor
            w = (img.shape[1] // factor) * factor
            img = img[:h, :w].reshape(h // factor, factor, w // factor,
                                      factor, 3).mean(axis=(1, 3))
        if img.shape[:2] != (im_size, im_size):
            raise ValueError(f"{name}: {img.shape} does not reduce to {im_size}")
        out.append(img)
    return np.stack(out)


def _encode_styles(model, state, x, lod: int, use_ema: bool = True):
    """Real image batch -> full (B, num_layers, latent) style tensor, the
    figure scripts' ``encode`` (make_recon_figure_multires.py:126-129)."""
    pe = state.ema_e if use_ema else state.params_e
    pd = state.ema_d if use_ema else state.params_d
    eps = jnp.zeros((x.shape[0], model.mc.latent_size))
    _, mu, _ = model.encode(pe, jnp.asarray(x, jnp.float32), lod, None, eps)
    return model.mapping_fl.apply({"params": pd["mapping_fl"]}, mu)


def _decode_styles(model, state, styles, lod: int, seed: int = 0,
                   use_ema: bool = True) -> np.ndarray:
    pd = state.ema_d if use_ema else state.params_d
    return np.asarray(model.decoder.apply({"params": pd["decoder"]}, styles,
                                          lod, jax.random.key(seed)))


def _resize_half(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))


def multires_reconstruction_figure(cfg: StyleConfig, ckpt_path: str,
                                   samples_dir: str, out: str,
                                   use_ema: bool = True, seed: int = 5) -> str:
    """make_recon_figure_multires.py parity: 4 column groups, each a
    full-resolution [real | recon] pair above a 2x2 grid of half-resolution
    pairs (lods_down=1, padding_step=4, layout formulas at :188-250)."""
    model, state = _load(cfg, ckpt_path)
    lod = cfg.layer_count - 1
    im_size = model.layer_to_resolution[lod]
    names = sorted(os.listdir(samples_dir))
    import random

    random.Random(seed).shuffle(names)
    names = names[: 4 * 5]  # 4 parts x (1 full + 4 half) pairs
    x = _load_sample_images(samples_dir, im_size, names=names)
    rec = _decode_styles(model, state,
                         _encode_styles(model, state, x, lod, use_ema),
                         lod, use_ema=use_ema)

    pad0, step = 8, 4  # current_padding after the reference's sizing loop
    width = 2 * im_size + 4 + 10
    height = 2 * im_size + 4 + 20

    def to01(img):
        return np.clip(img * 0.5 + 0.5, 0, 1)

    def make_part(imgs):  # imgs: list of (real, recon) HWC pairs, len<=5
        canvas = np.ones((height, width, 3), np.float32)

        def place(img, px, py):
            canvas[py: py + img.shape[0], px: px + img.shape[1]] = to01(img)

        it = iter(imgs)
        try:
            a, b = next(it)
            place(a, pad0, 0)
            place(b, pad0 + im_size, 0)
            half = im_size // 2
            for xx in range(2):
                for yy in range(2):
                    a, b = next(it)
                    place(_resize_half(a),
                          step + xx * (2 * half + step),
                          im_size + 2 * pad0 + yy * (half + step))
                    place(_resize_half(b),
                          step + half + xx * (2 * half + step),
                          im_size + 2 * pad0 + yy * (half + step))
        except StopIteration:
            pass
        return canvas

    pairs = list(zip(x, rec))
    parts = [make_part(pairs[i::4]) for i in range(4)]
    canvas = np.concatenate(parts, axis=1)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(out, np.clip(canvas, 0, 1))
    return out


def paged_reconstruction_figure(cfg: StyleConfig, ckpt_path: str,
                                samples_dir: str, out_dir: str,
                                per_page: int = 24, use_ema: bool = True,
                                seed: int = 1, max_pages: Optional[int] = None):
    """make_recon_figure_paged.py parity: pages of [real | recon] cells,
    3 cells per grid row, files reconstructions_<i>.png."""
    model, state = _load(cfg, ckpt_path)
    lod = cfg.layer_count - 1
    im_size = model.layer_to_resolution[lod]
    names = sorted(os.listdir(samples_dir))
    import random

    random.Random(seed).shuffle(names)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    n_pages = (len(names) + per_page - 1) // per_page
    if max_pages is not None:
        n_pages = min(n_pages, max_pages)
    for page in range(n_pages):
        chunk = names[page * per_page:(page + 1) * per_page]
        x = _load_sample_images(samples_dir, im_size, names=chunk)
        rec = _decode_styles(model, state,
                             _encode_styles(model, state, x, lod, use_ema),
                             lod, use_ema=use_ema)
        cells = np.concatenate([_to01(x), _to01(rec)], axis=2)  # side by side
        paths.append(save_image_grid(
            cells, os.path.join(out_dir, f"reconstructions_{page}.png"), nrow=3))
    return paths


def interpolation_2_images_figure(cfg: StyleConfig, ckpt_path: str,
                                  samples_dir: str, image_a: str, image_b: str,
                                  out: str, steps: int = 7,
                                  use_ema: bool = True, seed: int = 0) -> str:
    """make_recon_figure_interpolation_2_images.py parity: encode two REAL
    images to w space and decode the w-space lerp (width=7 row)."""
    model, state = _load(cfg, ckpt_path)
    lod = cfg.layer_count - 1
    im_size = model.layer_to_resolution[lod]
    x = _load_sample_images(samples_dir, im_size, names=[image_a, image_b])
    styles = _encode_styles(model, state, x, lod, use_ema)
    wa, wb = styles[0, 0], styles[1, 0]  # single w per image (:154-155)
    kh = jnp.linspace(0.0, 1.0, steps)[:, None]
    w = wa[None] * (1 - kh) + wb[None] * kh
    mixed = jnp.repeat(w[:, None, :], model.num_layers, axis=1)
    rec = _decode_styles(model, state, mixed, lod, seed=seed, use_ema=use_ema)
    return save_image_grid(_to01(rec), out, nrow=steps)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="style-figures")
    sub = ap.add_subparsers(dest="command", required=True)
    for name in ("samples", "recon", "interpolation", "stylemix",
                 "recon-multires", "recon-paged", "interpolation-images"):
        p = sub.add_parser(name)
        p.add_argument("--yaml", type=str, default=None)
        p.add_argument("-m", "--model", type=str, required=True)
        p.add_argument("-o", "--out", type=str, required=True)
        # recon-paged's historical default seed is 1 (matching the function
        # default, make_recon_figure_paged.py shuffle) — keep figure outputs
        # reproducible across versions
        p.add_argument("--seed", type=int,
                       default=1 if name == "recon-paged" else 0)
        if name == "recon":
            # real side: DATASET.PATH %-pattern from the yaml, or synthetic
            p.add_argument("--count", type=int, default=8)
        if name in ("recon-multires", "recon-paged", "interpolation-images"):
            # real images from a folder (cfg.DATASET.SAMPLES_PATH equivalent)
            p.add_argument("--samples", type=str, required=True)
        if name == "recon-paged":
            p.add_argument("--max-pages", type=int, default=None)
        if name == "interpolation-images":
            p.add_argument("--image-a", type=str, required=True)
            p.add_argument("--image-b", type=str, required=True)
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
    elif args.command == "recon-multires":
        print(multires_reconstruction_figure(cfg, args.model, args.samples,
                                             args.out, seed=args.seed))
    elif args.command == "recon-paged":
        print(paged_reconstruction_figure(cfg, args.model, args.samples,
                                          args.out, seed=args.seed,
                                          max_pages=args.max_pages))
    elif args.command == "interpolation-images":
        print(interpolation_2_images_figure(cfg, args.model, args.samples,
                                            args.image_a, args.image_b,
                                            args.out, seed=args.seed))


if __name__ == "__main__":
    main()
