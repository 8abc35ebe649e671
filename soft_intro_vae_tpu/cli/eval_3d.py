"""3D evaluation tools.

Capability parity with the reference's 3D evaluation scripts:
  * ``test_jsd``  — soft_intro_vae_3d/test_model.py:41-93 (test-split JSD,
    3 trials of 3x samples, averaged)
  * ``find_best_epoch`` — evaluation/find_best_epoch_on_validation_soft.py:26-148
    (sweep every epoch checkpoint for minimum validation JSD)
  * ``generate_data_for_metrics`` — evaluation/generate_data_for_metrics.py:25-92
    (dump X / X_generated / X_reconstructed .npy for external metric suites)
  * ``generate_for_rendering`` — generate_for_rendering.py:19-119 (samples +
    latent interpolations as .npy for offline renderers)

Usage: python -m soft_intro_vae_tpu.cli.eval_3d <subcommand> ...
"""

from __future__ import annotations

import argparse
import os
import re
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.data.shapenet import ShapeNetDataset, SyntheticClouds
from soft_intro_vae_tpu.metrics.jsd import jsd_between_point_cloud_sets
from soft_intro_vae_tpu.train.threed import ThreeDConfig, build_3d_training
from soft_intro_vae_tpu.utils.checkpoint import load_checkpoint


def _load(cfg: ThreeDConfig, ckpt_path: str):
    enc, dec, state, *_ = build_3d_training(cfg)
    state, epoch, _ = load_checkpoint(ckpt_path, state)
    return enc, dec, state, epoch


def _points(cfg: ThreeDConfig, split: str) -> np.ndarray:
    if cfg.use_synthetic:
        return SyntheticClouds(max(cfg.synthetic_n // 8, 8), cfg.n_points,
                               seed={"valid": 1, "test": 2}.get(split, 0)).load_all()[0]
    return ShapeNetDataset(cfg.data_dir, cfg.classes, split).load_all()[0]


def _jsd_vs_samples(dec, state, ref_points: np.ndarray, cfg: ThreeDConfig,
                    trials: int = 3, mult: int = 3, seed: int = 777) -> float:
    n = ref_points.shape[0]
    decode = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    vals = []
    for t in range(trials):
        k = jax.random.fold_in(jax.random.key(seed), t)
        noise = cfg.prior_std * jax.random.normal(k, (mult * n, cfg.z_size), jnp.float32)
        x_g = np.asarray(decode(state.params_d, noise))
        vals.append(jsd_between_point_cloud_sets(x_g, ref_points, voxels=28))
    return float(np.mean(vals))


def test_jsd(cfg: ThreeDConfig, ckpt_path: str) -> float:
    """Test-split JSD of a trained checkpoint (test_model.py parity)."""
    _, dec, state, _ = _load(cfg, ckpt_path)
    return _jsd_vs_samples(dec, state, _points(cfg, "test"), cfg)


def find_best_epoch(cfg: ThreeDConfig, weights_dir: Optional[str] = None) -> Tuple[str, float]:
    """Sweep all checkpoints under weights_dir for minimum validation JSD."""
    weights_dir = weights_dir or os.path.join(cfg.results_dir, "weights")
    paths = sorted(
        os.path.join(weights_dir, f) for f in os.listdir(weights_dir) if f.endswith(".ckpt")
    )
    if not paths:
        raise FileNotFoundError(f"no checkpoints under {weights_dir}")
    valid = _points(cfg, "valid")
    enc, dec, state0, *_ = build_3d_training(cfg)
    best: Tuple[Optional[str], float] = (None, float("inf"))
    for p in paths:
        state, epoch, _ = load_checkpoint(p, state0)
        jsd = _jsd_vs_samples(dec, state, valid, cfg)
        print(f"{os.path.basename(p)} (epoch {epoch}): jsd {jsd:.4f}")
        if jsd < best[1]:
            best = (p, jsd)
    assert best[0] is not None
    return best


def generate_data_for_metrics(cfg: ThreeDConfig, ckpt_path: str, out_dir: str,
                              split: str = "test") -> List[str]:
    """Dump X.npy (real), Xg.npy (samples), Xrec.npy (reconstructions)."""
    enc, dec, state, _ = _load(cfg, ckpt_path)
    x = _points(cfg, split)
    decode = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    encode = jax.jit(lambda pe, se, pts: enc.apply(
        {"params": pe, "batch_stats": se}, pts, train=False))
    mu, _ = encode(state.params_e, state.stats_e, jnp.asarray(x))
    x_rec = np.asarray(decode(state.params_d, mu))
    k = jax.random.key(123)
    noise = cfg.prior_std * jax.random.normal(k, (x.shape[0], cfg.z_size), jnp.float32)
    x_g = np.asarray(decode(state.params_d, noise))
    os.makedirs(out_dir, exist_ok=True)
    out = []
    for name, arr in [("X", x), ("Xg", x_g), ("Xrec", x_rec)]:
        p = os.path.join(out_dir, f"{name}.npy")
        np.save(p, arr)
        out.append(p)
    return out


def generate_for_rendering(cfg: ThreeDConfig, ckpt_path: str, out_dir: str,
                           num_samples: int = 10, num_interp: int = 5) -> List[str]:
    """Samples + latent interpolations as .npy (generate_for_rendering.py)."""
    enc, dec, state, _ = _load(cfg, ckpt_path)
    decode = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    k1, k2 = jax.random.split(jax.random.key(7))
    z = cfg.prior_std * jax.random.normal(k1, (num_samples, cfg.z_size), jnp.float32)
    samples = np.asarray(decode(state.params_d, z))
    za = cfg.prior_std * jax.random.normal(k2, (2, cfg.z_size), jnp.float32)
    alphas = jnp.linspace(0.0, 1.0, num_interp)[:, None]
    z_interp = za[0][None] * (1 - alphas) + za[1][None] * alphas
    interp = np.asarray(decode(state.params_d, z_interp))
    os.makedirs(out_dir, exist_ok=True)
    p1 = os.path.join(out_dir, "samples.npy")
    p2 = os.path.join(out_dir, "interpolation.npy")
    np.save(p1, samples)
    np.save(p2, interp)
    return [p1, p2]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="eval-3d")
    sub = ap.add_subparsers(dest="command", required=True)
    for name in ("test-jsd", "find-best-epoch", "dump-metrics-data", "render-data"):
        p = sub.add_parser(name)
        p.add_argument("-c", "--config", type=str, default=None, help="JSON config path")
        if name != "find-best-epoch":
            p.add_argument("-m", "--model", type=str, required=True, help="checkpoint path")
        if name in ("dump-metrics-data", "render-data"):
            p.add_argument("-o", "--out", type=str, required=True)
    p_xml = sub.add_parser("render-xml", help="npy/npz/ply -> Mitsuba XML scenes "
                                              "(render_mitsuba2_pc.py parity)")
    p_xml.add_argument("-i", "--input", type=str, required=True)
    p_xml.add_argument("-o", "--out", type=str, default=None)
    p_xml.add_argument("--points", type=int, default=2048)
    p_xml.add_argument("--mitsuba", type=str, default=None, help="mitsuba binary (optional)")
    args = ap.parse_args(argv)
    if args.command == "render-xml":
        from soft_intro_vae_tpu.utils.mitsuba import render_pointclouds

        print("\n".join(render_pointclouds(args.input, args.out, args.points, args.mitsuba)))
        return
    cfg = ThreeDConfig.from_json(args.config) if args.config else ThreeDConfig()
    if args.command == "test-jsd":
        print(f"test jsd: {test_jsd(cfg, args.model):.4f}")
    elif args.command == "find-best-epoch":
        path, jsd = find_best_epoch(cfg)
        print(f"best: {path} (jsd {jsd:.4f})")
    elif args.command == "dump-metrics-data":
        print("\n".join(generate_data_for_metrics(cfg, args.model, args.out)))
    elif args.command == "render-data":
        print("\n".join(generate_for_rendering(cfg, args.model, args.out)))


if __name__ == "__main__":
    main()
