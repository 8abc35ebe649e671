"""3D point-cloud trainer (ShapeNet, Chamfer loss, narrow prior).

Capability parity with /root/reference/soft_intro_vae_3d/train_soft_intro_vae_3d.py:111-449:
JSON-config driven, scale = 1/(3*n_points) (:156), prior N(0, prior_std^2)
(:178-180), optional random Z-rotation augment (:256-260), MultiStepLR
[350,450,550] gamma 0.5 (:188-189), valid-set JSD every valid_frequency
epochs with best-JSD checkpointing (:428-442), epoch-numbered checkpoints
with optimizer state (:444-449) and resume from the latest epoch (:191-198).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.data.shapenet import ShapeNetDataset, SyntheticClouds, rotate_z
from soft_intro_vae_tpu.metrics.jsd import jsd_between_point_cloud_sets
from soft_intro_vae_tpu.models.pointnet import PointNetDecoder, PointNetEncoder
from soft_intro_vae_tpu.parallel import mesh as pmesh
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps
from soft_intro_vae_tpu.utils.checkpoint import Checkpointer
from soft_intro_vae_tpu.utils.tracker import LossTracker


@dataclasses.dataclass
class ThreeDConfig:
    """Mirrors config/soft_intro_vae_hp.json."""

    data_dir: str = "./datasets/shapenet_data"
    classes: Tuple[str, ...] = ("car", "airplane")
    n_points: int = 2048
    batch_size: int = 32
    max_epochs: int = 2000
    beta_rec: float = 20.0
    beta_kl: float = 1.0
    beta_neg: float = 256.0
    gamma_r: float = 1e-8
    num_vae: int = 0
    z_size: int = 128
    prior_std: float = 0.2
    lr_e: float = 5e-4
    lr_d: float = 5e-4
    seed: int = -1
    save_frequency: int = 50
    valid_frequency: int = 2
    apply_random_rotation: bool = False
    nan_check_iter: int = 200   # sub-epoch NaN-abort cadence; 0 disables
    reconstruction_loss: str = "chamfer"
    save_figures: bool = False
    results_dir: str = "./results_3d"
    use_synthetic: bool = False     # hermetic fallback dataset
    synthetic_n: int = 256
    num_devices: Optional[int] = None
    verbose: bool = True
    resume: bool = True

    @classmethod
    def from_json(cls, path: str) -> "ThreeDConfig":
        """Load the reference's JSON config schema."""
        with open(path) as f:
            c = json.load(f)
        opt_e = c.get("optimizer", {}).get("E", {}).get("hyperparams", {})
        opt_d = c.get("optimizer", {}).get("D", {}).get("hyperparams", {})
        return cls(
            data_dir=c.get("data_dir", cls.data_dir),
            classes=tuple(c.get("classes", cls.classes)),
            n_points=c.get("n_points", cls.n_points),
            batch_size=c.get("batch_size", cls.batch_size),
            max_epochs=c.get("max_epochs", cls.max_epochs),
            beta_rec=c.get("beta_rec", cls.beta_rec),
            beta_kl=c.get("beta_kl", cls.beta_kl),
            beta_neg=c.get("beta_neg", cls.beta_neg),
            gamma_r=c.get("gamma_r", cls.gamma_r),
            num_vae=c.get("num_vae", cls.num_vae),
            z_size=c.get("z_size", cls.z_size),
            prior_std=c.get("prior_std", cls.prior_std),
            lr_e=opt_e.get("lr", cls.lr_e),
            lr_d=opt_d.get("lr", cls.lr_d),
            seed=c.get("seed", cls.seed),
            save_frequency=c.get("save_frequency", cls.save_frequency),
            valid_frequency=c.get("valid_frequency", cls.valid_frequency),
            apply_random_rotation="rotate" in c.get("transforms", []),
            reconstruction_loss=c.get("reconstruction_loss", cls.reconstruction_loss),
            results_dir=os.path.join(c.get("results_root", "./results"), c.get("arch", "vae"),
                                     c.get("experiment_name", "soft_intro_vae")),
            # extensions beyond the reference schema (hermetic smoke runs /
            # TPU knobs) — absent from reference configs, harmless defaults
            use_synthetic=c.get("use_synthetic", cls.use_synthetic),
            synthetic_n=c.get("synthetic_n", cls.synthetic_n),
            verbose=c.get("verbose", cls.verbose),
            num_devices=c.get("num_devices", cls.num_devices),
        )


def build_3d_training(cfg: ThreeDConfig):
    if cfg.reconstruction_loss.lower() != "chamfer":
        raise ValueError(f"Invalid reconstruction loss. Accepted `chamfer`, got: {cfg.reconstruction_loss}")
    enc = PointNetEncoder(z_dim=cfg.z_size)
    dec = PointNetDecoder(z_dim=cfg.z_size, n_points=cfg.n_points)

    def encode(params, stats, x):
        (mu, lv), upd = enc.apply({"params": params, "batch_stats": stats}, x,
                                  train=True, mutable=["batch_stats"])
        return (mu, lv), upd["batch_stats"]

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    seed = cfg.seed if cfg.seed != -1 else int(time.time()) % (2**31)
    root = jax.random.key(seed)
    k_e, k_d, k_state = jax.random.split(root, 3)
    ve = enc.init(k_e, jnp.zeros((1, cfg.n_points, 3)), train=False)
    vd = dec.init(k_d, jnp.zeros((1, cfg.z_size)))

    opt = optim.adam()
    state = TrainState.create(
        params_e=ve["params"],
        params_d=vd["params"],
        stats_e=ve.get("batch_stats", {}),
        opt_e=opt.init(ve["params"]),
        opt_d=opt.init(vd["params"]),
        rng=k_state,
        lr_e=cfg.lr_e,
        lr_d=cfg.lr_d,
    )
    step_cfg = StepConfig(
        z_dim=cfg.z_size,
        beta_rec=cfg.beta_rec,
        beta_kl=cfg.beta_kl,
        beta_neg=cfg.beta_neg,
        gamma_r=cfg.gamma_r,
        scale=1.0 / (3 * cfg.n_points),
        loss_type="chamfer",
        prior_logvar=float(np.log(cfg.prior_std**2)),
        prior_std=cfg.prior_std,
        fresh_z_in_d=True,
        detach_expelbo_targets=True,
    )
    vanilla_step, intro_step = build_train_steps(encode=encode, decode=decode, optimizer=opt, cfg=step_cfg)
    mesh = pmesh.make_data_mesh(cfg.num_devices)
    state = pmesh.shard_state(state, mesh)
    return enc, dec, state, vanilla_step, intro_step, mesh


def calc_jsd_valid(dec: PointNetDecoder, state: TrainState, valid_points: np.ndarray,
                   cfg: ThreeDConfig, trials: int = 3) -> float:
    """Valid-set JSD: mean of 3 trials, 3x samples each (3d:36-73)."""
    n = valid_points.shape[0]
    results = []
    decode = jax.jit(lambda p, z: dec.apply({"params": p}, z))
    for t in range(trials):
        k = jax.random.fold_in(state.rng, 777 + t)
        noise = cfg.prior_std * jax.random.normal(k, (3 * n, cfg.z_size), jnp.float32)
        x_g = np.asarray(decode(state.params_d, noise))
        results.append(jsd_between_point_cloud_sets(x_g, valid_points, voxels=28))
    return float(np.mean(results))


def train_soft_intro_vae_3d(cfg: ThreeDConfig):
    """Run the 3D recipe; returns (state, summary)."""
    if cfg.use_synthetic:
        train_pts, _ = SyntheticClouds(cfg.synthetic_n, cfg.n_points, seed=max(cfg.seed, 0)).load_all()
        valid_pts = SyntheticClouds(max(cfg.synthetic_n // 8, 8), cfg.n_points, seed=max(cfg.seed, 0) + 1).load_all()[0]
    else:
        train_pts, _ = ShapeNetDataset(cfg.data_dir, cfg.classes, "train").load_all()
        valid_pts, _ = ShapeNetDataset(cfg.data_dir, cfg.classes, "valid").load_all()

    enc, dec, state, vanilla_step, intro_step, mesh = build_3d_training(cfg)
    weights_dir = os.path.join(cfg.results_dir, "weights")
    ckpt = Checkpointer(weights_dir)
    tracker = LossTracker(cfg.results_dir)
    lr_e_sched = optim.multistep_lr(cfg.lr_e, (350, 450, 550), 0.5)
    lr_d_sched = optim.multistep_lr(cfg.lr_d, (350, 450, 550), 0.5)
    # per-epoch seeding (below) instead of one sequential stream: a resumed
    # run at epoch E replays the exact shuffle/augment draws of an
    # uninterrupted run — same replay-identical upgrade as the style
    # streaming shuffle (the reference's DataLoader resume is not replayable)
    data_seed = max(cfg.seed, 0) + 2

    starting_epoch = 1
    if cfg.resume:
        latest = ckpt.load_latest(state)
        if latest is not None:
            state, ep, _ = latest
            # restored arrays arrive with host/default placement; re-shard
            # onto the mesh exactly like build_3d_training's initial state so
            # the compiled step sees identical input shardings at N>1
            state = pmesh.shard_state(state, mesh)
            starting_epoch = ep + 1
            if cfg.verbose:
                print(f"resumed from epoch {ep}")

    best = {"epoch": 0, "jsd": None}
    summary = dict(best_jsd=None, epochs_run=0)
    n = train_pts.shape[0]
    for epoch in range(starting_epoch, cfg.max_epochs + 1):
        step_fn = vanilla_step if epoch < cfg.num_vae else intro_step
        data_rng = np.random.default_rng((data_seed, epoch))
        idx = data_rng.permutation(n)
        device_metrics = []
        for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
            x = train_pts[idx[i : i + cfg.batch_size]]
            if cfg.apply_random_rotation:
                x = rotate_z(x, data_rng.random(x.shape[0]) * 180.0)
            x = pmesh.shard_batch(jnp.asarray(x), mesh)
            state, m = step_fn(state, x)
            device_metrics.append(m)
            # sub-epoch NaN abort (see train/image.py nan_check_iter): a
            # small host sync every nan_check_iter steps bounds diverged-run waste
            if cfg.nan_check_iter and len(device_metrics) % cfg.nan_check_iter == 0:
                last = jax.device_get(m)
                if any(not np.all(np.isfinite(v)) for v in last.values()):
                    raise SystemError("loss is NaN")
        host = jax.device_get(device_metrics)
        ep_mean = {k: float(np.mean([h[k] for h in host])) for k in host[0]} if host else {}
        tracker.update(ep_mean)
        tracker.register_means(epoch)
        if any(np.isnan(v) for v in ep_mean.values()):
            raise SystemError("loss is NaN")
        state = state.replace(
            lr_e=jnp.asarray(lr_e_sched(epoch), jnp.float32),
            lr_d=jnp.asarray(lr_d_sched(epoch), jnp.float32),
        )
        if cfg.verbose and ep_mean:
            shown = {k: round(v, 3) for k, v in ep_mean.items() if k in ("rec", "kl_real", "kl_fake", "diff_kl")}
            print(f"epoch {epoch}: {shown}")

        if cfg.save_figures:
            # per-epoch 3x5 real/rec/sample panel (3d:396-426)
            from soft_intro_vae_tpu.utils.plotting import save_pointcloud_panel

            x5 = jnp.asarray(train_pts[:5])
            mu, _ = enc.apply({"params": state.params_e, "batch_stats": state.stats_e},
                              x5, train=False)
            rec5 = np.asarray(dec.apply({"params": state.params_d}, mu))
            k = jax.random.fold_in(state.rng, 31337 + epoch)
            noise5 = cfg.prior_std * jax.random.normal(k, (5, cfg.z_size), jnp.float32)
            fake5 = np.asarray(dec.apply({"params": state.params_d}, noise5))
            save_pointcloud_panel(
                [np.asarray(x5), rec5, fake5],
                os.path.join(cfg.results_dir, "samples", f"figure_{epoch}.png"))

        if epoch % cfg.valid_frequency == 0:
            jsd = calc_jsd_valid(dec, state, valid_pts, cfg)
            if cfg.verbose:
                print(f"epoch: {epoch}, jsd: {jsd:.4f}")
            if best["jsd"] is None or jsd < best["jsd"]:
                best.update(epoch=epoch, jsd=jsd)
                ckpt.save(state, epoch, 0, tag=f"_jsd_{jsd:.4f}")
            summary["best_jsd"] = best["jsd"]
        if epoch % cfg.save_frequency == 0:
            ckpt.save(state, epoch, 0)
        summary["epochs_run"] = epoch
    return state, summary
