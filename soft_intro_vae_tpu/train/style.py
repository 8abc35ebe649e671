"""Style-SoftIntroVAE trainer: progressive LOD, EMA, per-LOD compiled steps.

Capability parity with /root/reference/style_soft_intro_vae/train_style_soft_intro_vae.py:113-431
and launcher.py/defaults.py: yacs-style config (YAML + KEY VALUE overrides),
per-LOD beta_neg switch (:278-286), per-LOD batch tables and LR
(scheduler.py:61-73), optimizer reset on LOD switch, sine-blend transitions
with input blending (:330-346), EMA shadow model updated every iteration with
beta = 0.5^(batch/10000) (:399-401), FID on the EMA model every 10 epochs at
max LOD (:287-299), async checkpoints, CSV tracker.

TPU-first: one compiled (vanilla|intro) step per (lod, in_transition); data
parallelism via the mesh (params replicated, batch sharded) instead of DDP;
the EMA update runs inside the compiled step on every replica.
"""

from __future__ import annotations

import dataclasses
import os
import time
from bisect import bisect_right
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.parallel import mesh as pmesh
from soft_intro_vae_tpu.train.lod import LODDriver, pick_batch_table
from soft_intro_vae_tpu.train.lreq_adam import scale_by_lreq_adam
from soft_intro_vae_tpu.train.style_step import (
    StyleModel,
    StyleModelConfig,
    StyleStepConfig,
    StyleTrainState,
    build_style_steps,
)
from soft_intro_vae_tpu.utils.checkpoint import Checkpointer
from soft_intro_vae_tpu.utils.tracker import LossTracker


@dataclasses.dataclass
class StyleConfig:
    """Flattened mirror of defaults.py's yacs schema."""

    name: str = ""
    output_dir: str = "results_style"
    # DATASET
    dataset_path: str = ""
    dataset_size: int = 70000
    max_resolution_level: int = 8
    flip_images: bool = True
    # MODEL
    layer_count: int = 6
    start_channel_count: int = 64
    max_channel_count: int = 512
    latent_space_size: int = 256
    dlatent_avg_beta: float = 0.995
    truncation_psi: float = 0.7
    truncation_cutoff: int = 8
    style_mixing_prob: float = 0.9
    mapping_layers: int = 5
    channels: int = 3
    encoder: str = "EncoderDefault"  # MODEL.ENCODER (defaults.py:60)
    beta_kl: float = 1.0
    beta_rec: float = 1.0
    beta_neg: Tuple[float, ...] = (2048, 2048, 1024, 512, 512, 128, 128, 64, 64)
    scale: float = 1.0 / (3 * 256**2)
    # TRAIN
    epochs_per_lod: int = 15
    base_learning_rate: float = 0.0015
    adam_beta2: float = 0.99
    learning_decay_rate: float = 0.1
    learning_decay_steps: Tuple[int, ...] = ()
    train_epochs: int = 110
    num_vae: int = 1
    learning_rates: Tuple[float, ...] = (0.002,)
    lod_2_batch_tables: Optional[Dict[str, List[int]]] = None
    report_freq: Tuple[int, ...] = (100, 80, 60, 30, 20, 10, 10, 5, 5)
    snapshot_freq: Tuple[int, ...] = (300, 300, 300, 100, 50, 30, 20, 20, 10)
    part_count: int = 1
    # runtime
    seed: int = 0
    num_devices: Optional[int] = None
    use_synthetic: bool = False
    synthetic_n: int = 512
    fid_every: int = 10
    nan_check_iter: int = 200  # sub-epoch NaN-abort cadence; 0 disables
    fid_num_images: int = 50000  # reference protocol (train_style_soft_intro_vae.py:292)
    with_fid: bool = False
    save_figures: bool = False
    verbose: bool = True
    resume: bool = True
    buffer_size_mb: int = 200
    # None = auto: this process's position in the jax runtime
    # (process_index / process_count). Explicit values always win — set
    # world_size=1 on a pod to deliberately stream the full dataset per host.
    rank: Optional[int] = None
    world_size: Optional[int] = None
    compute_dtype: str = "float32"  # "bfloat16": conv-path activations
    remat: bool = False  # jax.checkpoint subnet forwards (512px+/large-batch)
    # host-side pixel storage for the input feed: "uint8" ships source bytes
    # (4x less host RAM churn + H2D traffic; lossless — per-LOD TFRecords
    # store uint8) and normalizes to [-1,1] ON DEVICE via a 256-entry LUT
    # that is bit-exact vs the host /127.5-1 path (tests/test_style_uint8.py).
    # "float32" = normalize on host (the reference dataloader's layout).
    host_storage: str = "uint8"

    @classmethod
    def from_yaml(cls, path: str, overrides: Sequence[str] = ()) -> "StyleConfig":
        """Load a reference-format YAML (configs/ffhq256.yaml) + KEY VALUE
        override list (launcher.py:42-50 merge semantics)."""
        import yaml

        with open(path) as f:
            y = yaml.safe_load(f) or {}
        if len(overrides) % 2 != 0:
            # yacs merge_from_list asserts even length (launcher.py:42-50);
            # a dangling key is always a CLI typo — fail loudly
            raise ValueError(
                f"KEY VALUE overrides must come in pairs, got odd-length {list(overrides)}")
        for i in range(0, len(overrides) - 1, 2):
            key, val = overrides[i], overrides[i + 1]
            node = y
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = yaml.safe_load(val)
        d = y.get("DATASET", {})
        m = y.get("MODEL", {})
        t = y.get("TRAIN", {})
        tables = {k.replace("LOD_2_BATCH_", ""): v for k, v in t.items() if k.startswith("LOD_2_BATCH_")}
        return cls(
            name=y.get("NAME", ""),
            output_dir=y.get("OUTPUT_DIR", "results_style"),
            dataset_path=d.get("PATH", ""),
            dataset_size=d.get("SIZE", 70000),
            part_count=d.get("PART_COUNT", 1),
            max_resolution_level=d.get("MAX_RESOLUTION_LEVEL", 8),
            flip_images=d.get("FLIP_IMAGES", True),
            layer_count=m.get("LAYER_COUNT", 6),
            start_channel_count=m.get("START_CHANNEL_COUNT", 64),
            max_channel_count=m.get("MAX_CHANNEL_COUNT", 512),
            latent_space_size=m.get("LATENT_SPACE_SIZE", 256),
            dlatent_avg_beta=m.get("DLATENT_AVG_BETA", 0.995),
            truncation_psi=m.get("TRUNCATIOM_PSI", 0.7),
            truncation_cutoff=m.get("TRUNCATIOM_CUTOFF", 8),
            style_mixing_prob=m.get("STYLE_MIXING_PROB", 0.9),
            mapping_layers=m.get("MAPPING_LAYERS", 5),
            channels=m.get("CHANNELS", 3),
            encoder=m.get("ENCODER", "EncoderDefault"),
            beta_kl=m.get("BETA_KL", 1.0),
            beta_rec=m.get("BETA_REC", 1.0),
            beta_neg=tuple(m.get("BETA_NEG", cls.beta_neg)),
            scale=m.get("SCALE", 1.0 / (3 * 256**2)),
            epochs_per_lod=t.get("EPOCHS_PER_LOD", 15),
            base_learning_rate=t.get("BASE_LEARNING_RATE", 0.0015),
            adam_beta2=t.get("ADAM_BETA_1", 0.99),
            learning_decay_rate=t.get("LEARNING_DECAY_RATE", 0.1),
            learning_decay_steps=tuple(t.get("LEARNING_DECAY_STEPS", ())),
            train_epochs=t.get("TRAIN_EPOCHS", 110),
            num_vae=t.get("NUM_VAE", 1),
            learning_rates=tuple(t.get("LEARNING_RATES", (0.002,))),
            lod_2_batch_tables=tables or None,
            # extensions beyond the reference schema (smoke runs / TPU knobs),
            # reachable from the CLI's KEY VALUE overrides
            use_synthetic=d.get("SYNTHETIC", False),
            synthetic_n=d.get("SYNTHETIC_N", 512),
            with_fid=t.get("WITH_FID", False),
            compute_dtype=t.get("COMPUTE_DTYPE", "float32"),
            remat=t.get("REMAT", False),
            seed=y.get("SEED", 0),
        )


class MultiResImages:
    """Per-LOD image feed: base images at max resolution, box-downscaled to
    the LOD's power-of-two size (the reference reads per-LOD TFRecords
    prepared offline; same pixels, computed on the fly here).
    Values are float32 in [0, 255] (reference feeds uint8 then /127.5-1)."""

    def __init__(self, images_u8: np.ndarray, seed: int = 0, flip: bool = True,
                 storage: str = "float32"):
        assert images_u8.ndim == 4
        if storage == "uint8":
            # keep source bytes; per-LOD views are box-cascaded in float with
            # one final rint in at_resolution — identical pixels to
            # data/streaming.py's _downscale_u8_to. (cli/prepare_tfrecords.py's
            # multires writer re-quantizes to uint8 at EVERY level instead, so
            # its shards can differ by ±1 LSB after 2+ downscales — both are
            # valid encodings of the reference's per-LOD prep.)
            self.base = (images_u8 if images_u8.dtype == np.uint8
                         else np.clip(np.rint(images_u8), 0, 255).astype(np.uint8))
        else:
            self.base = images_u8.astype(np.float32)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.flip = flip
        self._cache: Dict[int, np.ndarray] = {}

    def __len__(self):
        return self.base.shape[0]

    @classmethod
    def from_tfrecords(cls, paths, rank: int = 0, world_size: int = 1, seed: int = 0,
                       flip: bool = True, storage: str = "float32") -> "MultiResImages":
        """Build from max-resolution TFRecord shards (the reference's data
        path, dataloader.py:30-102), with per-rank shard assignment."""
        from soft_intro_vae_tpu.data.tfrecords import load_uint8_images, shard_paths_for_rank

        mine = shard_paths_for_rank(list(paths), rank, world_size)
        imgs = load_uint8_images(mine)  # NHWC uint8
        return cls(imgs, seed=seed, flip=flip, storage=storage)

    @classmethod
    def synthetic(cls, n: int, resolution: int, channels: int = 3, seed: int = 0):
        rng = np.random.default_rng(seed)
        base = rng.random((n, 8, 8, channels)).astype(np.float32)
        reps = resolution // 8
        img = np.repeat(np.repeat(base, reps, 1), reps, 2)
        noise = rng.random((n, resolution, resolution, channels)).astype(np.float32)
        return cls(np.clip(0.85 * img + 0.15 * noise, 0, 1) * 255.0, seed=seed)

    def at_resolution(self, res: int) -> np.ndarray:
        if res not in self._cache:
            u8 = self.base.dtype == np.uint8
            cur = self.base.astype(np.float32) if u8 else self.base
            while cur.shape[1] > res:
                b, h, w, c = cur.shape
                cur = cur.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            # uint8 storage: float box cascade, single final rint — the same
            # per-record semantics as data/streaming.py _box_downscale
            self._cache[res] = (np.clip(np.rint(cur), 0, 255).astype(np.uint8)
                                if u8 else cur.astype(np.float32))
        return self._cache[res]

    def epoch(self, res: int, batch_size: int, drop_last: bool = True,
              epoch_index: Optional[int] = None):
        """One shuffled pass. With ``epoch_index`` the shuffle/flip stream is
        a pure function of (seed, epoch_index) so kill-and-resume replays the
        exact batches of an uninterrupted run."""
        data = self.at_resolution(res)
        rng = self.rng if epoch_index is None else np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch_index]))
        n = data.shape[0]
        idx = rng.permutation(n)
        end = n - (n % batch_size) if drop_last else n
        for i in range(0, end, batch_size):
            batch = data[idx[i : i + batch_size]]
            if self.flip:
                flip = rng.random(batch.shape[0]) < 0.5
                batch = batch.copy()
                batch[flip] = batch[flip][:, :, ::-1, :]
            yield batch


def _lr_for(cfg: StyleConfig, epoch: int, lod: int) -> float:
    base = cfg.learning_rates[min(lod, len(cfg.learning_rates) - 1)]
    return base * cfg.learning_decay_rate ** bisect_right(list(cfg.learning_decay_steps), epoch)


def build_style_training(cfg: StyleConfig):
    mc = StyleModelConfig(
        startf=cfg.start_channel_count, maxf=cfg.max_channel_count,
        layer_count=cfg.layer_count, latent_size=cfg.latent_space_size,
        mapping_layers=cfg.mapping_layers, channels=cfg.channels,
        dlatent_avg_beta=cfg.dlatent_avg_beta, style_mixing_prob=cfg.style_mixing_prob,
        truncation_psi=cfg.truncation_psi, truncation_cutoff=cfg.truncation_cutoff,
        encoder_variant=cfg.encoder, compute_dtype=cfg.compute_dtype,
        remat=cfg.remat,
    )
    model = StyleModel(mc)
    opt = scale_by_lreq_adam(beta2=cfg.adam_beta2)
    root = jax.random.key(cfg.seed)
    k_init, k_state = jax.random.split(root)
    params_e, params_d, buffers = model.init_params(k_init)
    copy = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)
    state = StyleTrainState(
        step=jnp.zeros((), jnp.int32),
        params_e=params_e, params_d=params_d, buffers=buffers,
        ema_e=copy(params_e), ema_d=copy(params_d), ema_buffers=copy(buffers),
        opt_e=opt.init(params_e), opt_d=opt.init(params_d),
        lr=jnp.asarray(cfg.base_learning_rate, jnp.float32),
        ema_beta=jnp.asarray(0.5 ** (32 / 10000.0), jnp.float32),
        rng=k_state,
    )
    mesh = pmesh.make_data_mesh(cfg.num_devices)
    state = pmesh.shard_state(state, mesh)
    return model, opt, state, mesh


def make_style_dataset(cfg: StyleConfig):
    """Dataset from the config: per-LOD streaming TFRecords when
    DATASET.PATH is a reference-style ``%``-pattern (dataloader.py:60-67),
    else synthetic (tests/smokes). rank/world_size select this host's shard
    subset (multi-host pods; single-host jit-DP needs no sharded input)."""
    max_res = 2 ** cfg.max_resolution_level
    model_res = 2 ** (cfg.layer_count + 1)
    if cfg.use_synthetic:
        return MultiResImages.synthetic(cfg.synthetic_n, min(max_res, model_res),
                                        cfg.channels, seed=cfg.seed)
    if cfg.dataset_path and "%" in cfg.dataset_path:
        from soft_intro_vae_tpu.data.streaming import StreamingTFRecords

        # rank/world_size None = this process's position in the jax runtime
        # (launcher.py:26-29 equivalent — no launcher needed, every host runs
        # the same program); explicit config values always win, including an
        # explicit world_size=1 on a multi-process pod.
        world = cfg.world_size if cfg.world_size is not None else jax.process_count()
        rank = cfg.rank if cfg.rank is not None else jax.process_index()
        return StreamingTFRecords(
            cfg.dataset_path, part_count=cfg.part_count, dataset_size=cfg.dataset_size,
            max_resolution_level=cfg.max_resolution_level, rank=rank,
            world_size=world, buffer_size_mb=cfg.buffer_size_mb,
            channels=cfg.channels, seed=cfg.seed, flip=cfg.flip_images,
            storage=cfg.host_storage)
    raise ValueError(
        "DATASET.PATH must be a per-LOD TFRecord %-pattern "
        "(e.g. 'ffhq-r%02d.tfrecords.%03d'); set use_synthetic=True "
        "(CLI: DATASET.SYNTHETIC true) for smoke runs")


def train_style_soft_intro_vae(cfg: StyleConfig, dataset: Optional[MultiResImages] = None):
    """Run the style recipe; returns (state, summary)."""
    if dataset is None:
        dataset = make_style_dataset(cfg)

    model, opt, state, mesh = build_style_training(cfg)
    tables = cfg.lod_2_batch_tables or {"1GPU": [128, 128, 128, 32, 16, 8, 4]}
    world = mesh.devices.size
    lod2batch = LODDriver(
        lod_2_batch=pick_batch_table(tables, world),
        epochs_per_lod=cfg.epochs_per_lod, layer_count=cfg.layer_count,
        dataset_size=len(dataset), world_size=world,
        report_freq=cfg.report_freq, snapshot_freq=cfg.snapshot_freq,
    )
    ckpt = Checkpointer(os.path.join(cfg.output_dir, "training_artifacts"), prefix=cfg.name + "_")
    tracker = LossTracker(cfg.output_dir)

    summary = dict(best_fid=None, epochs_run=0, lods_seen=[])

    # Resume (reference train_style_soft_intro_vae.py:233-234 checkpointer.load()
    # + :268,277 epoch loop starting at scheduler.start_epoch(), LOD state
    # restored by set_epoch). Mid-epoch snapshots resume from that epoch's start.
    start_epoch = 0
    if cfg.resume:
        loaded = ckpt.load_latest(state)
        if loaded is not None:
            restored, saved_epoch, _ = loaded
            state = pmesh.shard_state(restored, mesh)
            aux = ckpt.latest_aux() or {}
            # end-of-epoch anchors resume at the next epoch; mid-epoch
            # snapshots restart the interrupted epoch
            start_epoch = saved_epoch + 1 if aux.get("epoch_completed", True) else saved_epoch
            # fast-forward the LOD driver WITHOUT signalling an optimizer
            # reset: the checkpoint already holds post-switch opt state
            lod2batch.set_epoch(max(0, start_epoch - 1))
            if aux.get("tracker"):
                tracker.load_state_dict(aux["tracker"])
            summary["best_fid"] = aux.get("best_fid")
            summary["lods_seen"] = list(aux.get("lods_seen", []))
            if cfg.verbose:
                print(f"resumed from epoch {saved_epoch} (lod {lod2batch.lod}); "
                      f"starting at epoch {start_epoch}")

    step_cache: Dict[Tuple[int, bool, float], Tuple] = {}

    def get_steps(lod: int, blended: bool, beta_neg: float):
        key = (lod, blended, beta_neg)
        if key not in step_cache:
            scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=cfg.beta_rec,
                                   beta_kl=cfg.beta_kl, beta_neg=beta_neg,
                                   gamma_r=1e-8, scale=cfg.scale)
            step_cache[key] = build_style_steps(model, scfg, lod, blended, opt)
        return step_cache[key]

    fid_fn = None
    fid_name = "fid"
    if cfg.with_fid:
        from soft_intro_vae_tpu.metrics.fid import fid_weights_path

        fid_fn = _make_style_fid(model, cfg)
        if fid_weights_path() is None:
            fid_name = "fid_selfconsistent"
            print("! WARNING: pt_inception weights not found — style FID uses a "
                  "RANDOM-INIT Inception;\n! logged as 'fid_selfconsistent', NOT "
                  "comparable to published FID.")

    from soft_intro_vae_tpu.data.prefetch import device_prefetch

    # device-side [-1,1] normalization for uint8 feeds: a 256-entry LUT
    # gather, bit-exact vs the host x/127.5-1 path on every backend (TPU f32
    # division is reciprocal-based, 1 ULP off — the LUT sidesteps it).
    # Hoisted out of the epoch loop so jit traces once per batch shape.
    _lut = np.arange(256, dtype=np.float32) / 127.5 - 1.0
    cast = jax.jit(lambda u: jnp.asarray(_lut)[u.astype(jnp.int32)])

    start = time.time()
    for epoch in range(start_epoch, cfg.train_epochs):
        switched = lod2batch.set_epoch(epoch)
        if switched:
            # optimizer state reset on LOD switch (lod_driver.py:111-112)
            state = state.replace(opt_e=opt.init(state.params_e), opt_d=opt.init(state.params_d))
            if lod2batch.lod not in summary["lods_seen"]:
                summary["lods_seen"].append(lod2batch.lod)
        lod = lod2batch.lod
        beta_neg = float(cfg.beta_neg[min(lod, len(cfg.beta_neg) - 1)])
        global_bs = lod2batch.get_batch_size()
        per_dev_total = global_bs  # jit-DP: feed the GLOBAL batch, mesh shards it
        res = model.layer_to_resolution[lod]

        state = state.replace(
            lr=jnp.asarray(_lr_for(cfg, epoch, lod), jnp.float32),
            ema_beta=jnp.asarray(0.5 ** (global_bs / 10000.0), jnp.float32),
        )

        if fid_fn is not None and epoch > cfg.epochs_per_lod * (cfg.layer_count - 1) \
                and epoch % cfg.fid_every == 0:
            fid = fid_fn(state, dataset, lod)
            if cfg.verbose:
                print(f"epoch {epoch} {fid_name}: {fid:.2f}")
            tracker.update({fid_name: fid})
            if summary["best_fid"] is None or fid < summary["best_fid"]:
                summary["best_fid"] = fid
                # epoch E hasn't trained yet (FID runs at the top of the
                # epoch): resume must restart E, not skip to E+1
                ckpt.save(state, epoch, int(state.step), tag=f"_lod{lod}_{fid_name}_{fid:.2f}",
                          aux={"tracker": tracker.state_dict(), "best_fid": summary["best_fid"],
                               "lods_seen": summary["lods_seen"], "lod": lod,
                               "epoch_completed": False})

        vanilla = epoch < cfg.num_vae
        device_metrics = []

        # Input feed: a prefetch thread prepares and ships batches ahead of
        # the (async-dispatched) step, so host gather/augment + H2D overlap
        # chip compute (the reference overlaps via DataLoader workers,
        # dataloader.py/launcher.py). Blends are precomputed per batch index
        # (pure function of the driver state — blend_factor_at), so the
        # producer never mutates lod2batch; the loop's own step() cadence
        # stays authoritative for report/snapshot ticks. uint8 batches are
        # normalized to [-1,1] ON DEVICE via a 256-entry LUT (bit-exact vs
        # the host /127.5-1 path, tests/test_style_uint8.py); float batches
        # and transition epochs (which blend two resolutions) keep the host
        # math unchanged.
        # capture epoch-constant driver state into locals so the prefetch
        # worker thread never reads mutable LODDriver fields concurrently
        # with the main loop's step()/is_time_to_save() calls
        in_transition = lod2batch.in_transition

        def feed():
            it = 0
            for raw in dataset.epoch(res, per_dev_total, epoch_index=epoch):
                yield raw, lod2batch.blend_factor_at(it)
                it += global_bs

        def put(item):
            raw, blend = item
            blended_ = in_transition and blend < 1.0 and lod > 0
            if raw.dtype == np.uint8 and not blended_:
                xb = cast(pmesh.shard_batch(jnp.asarray(raw), mesh))
            else:
                x = raw.astype(np.float32) / 127.5 - 1.0
                if blended_:
                    # progressive-growth input blend (:342-346)
                    b, h, w, c = x.shape
                    x_prev = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
                    x_prev2x = np.repeat(np.repeat(x_prev, 2, 1), 2, 2)
                    x = x * blend + x_prev2x * (1.0 - blend)
                xb = pmesh.shard_batch(jnp.asarray(x, jnp.float32), mesh)
            return xb, blend, blended_

        for xb, blend, blended in device_prefetch(feed(), size=2, put_fn=put):
            vanilla_step, intro_step = get_steps(lod, blended, beta_neg)
            step_fn = vanilla_step if vanilla else intro_step
            state, m = step_fn(state, xb, jnp.asarray(blend, jnp.float32))
            device_metrics.append(m)
            lod2batch.step()
            if lod2batch.is_time_to_save():
                # mid-epoch snapshot: resume restarts THIS epoch (reference
                # model_tmp_intermediate semantics — scheduler not stepped yet)
                ckpt.save(state, epoch, int(jax.device_get(state.step)), async_save=True,
                          aux={"tracker": tracker.state_dict(), "best_fid": summary["best_fid"],
                               "lods_seen": summary["lods_seen"], "lod": lod,
                               "epoch_completed": False})
            if cfg.save_figures and lod2batch.is_time_to_report():
                _save_style_samples(model, cfg, state, lod, epoch, lod2batch.iteration)
            # sub-epoch NaN abort: one small host sync every nan_check_iter
            # iterations bounds a diverged run to that many steps of chip time
            # (the reference aborts per-iteration at a sync per step; the
            # epoch-mean check below still catches anything in between)
            if cfg.nan_check_iter and len(device_metrics) % cfg.nan_check_iter == 0:
                last = jax.device_get(m)
                if any(not np.all(np.isfinite(v)) for v in last.values()):
                    raise SystemError("loss is NaN")

        if not device_metrics:
            raise ValueError(
                f"epoch {epoch}: zero batches — global batch {global_bs} exceeds "
                f"dataset size {len(dataset)} (check LOD batch tables)")
        host = jax.device_get(device_metrics)
        ep_mean = {k: float(np.mean([h[k] for h in host])) for k in host[0]} if host else {}
        tracker.update(ep_mean)
        tracker.register_means(epoch)
        if any(np.isnan(v) for v in ep_mean.values()):
            raise SystemError("loss is NaN")
        summary["epochs_run"] = epoch + 1
        # end-of-epoch checkpoint (reference model_tmp_lod%d save,
        # train_style_soft_intro_vae.py:425) — the resume anchor
        ckpt.save(state, epoch, int(jax.device_get(state.step)), async_save=True,
                  aux={"tracker": tracker.state_dict(), "best_fid": summary["best_fid"],
                       "lods_seen": summary["lods_seen"], "lod": lod,
                       "epoch_completed": True})
        if cfg.verbose and ep_mean:
            shown = {k: round(v, 4) for k, v in ep_mean.items()
                     if k in ("rec_loss", "real_kl", "fake_kl", "kl_diff")}
            print(f"epoch {epoch} lod {lod} res {res} bs {global_bs}: {shown} "
                  f"({time.time() - start:.1f}s)")

    if summary["epochs_run"] > 0 or ckpt.latest_path() is None:
        # skip the redundant _final rewrite when resume found nothing to do
        ckpt.save(state, cfg.train_epochs - 1, int(jax.device_get(state.step)), tag="_final",
                  aux={"tracker": tracker.state_dict(), "best_fid": summary["best_fid"],
                       "lods_seen": summary["lods_seen"], "epoch_completed": True})
    ckpt.wait()
    tracker.plot()
    return state, summary


def _save_style_samples(model: StyleModel, cfg: StyleConfig, state, lod: int,
                        epoch: int, nimg: int, count: int = 16):
    """EMA sample grid at report cadence (reference save_sample,
    train_style_soft_intro_vae.py:408-413)."""
    import jax.random as jr

    from soft_intro_vae_tpu.utils.plotting import save_image_grid

    k = jr.fold_in(state.rng, 40000 + epoch * 1000 + nimg // 1000)
    z = jr.normal(k, (count, cfg.latent_space_size), jnp.float32)
    rec, _ = model.generate(state.ema_d, state.ema_buffers, jr.fold_in(k, 1), lod, None, z,
                            mixing=False, truncation=True, update_avg=False)
    img = np.clip(np.asarray(rec) * 0.5 + 0.5, 0, 1)
    path = os.path.join(cfg.output_dir, "samples", f"epoch{epoch}_nimg{nimg}.jpg")
    save_image_grid(img, path, nrow=4)


def _make_style_fid(model: StyleModel, cfg: StyleConfig):
    """FID on the EMA model (reference :287-299): dataset at the LOD's
    resolution vs EMA samples with truncation disabled, [-1,1] -> [0,1]."""
    from soft_intro_vae_tpu.metrics.fid import compute_statistics_streaming, frechet_distance, load_fid_network

    apply_fn, _ = load_fid_network()
    real_cache: Dict[int, Tuple] = {}

    # hoisted out of fid_fn and keyed on (lod, batch_size) as static args so
    # repeated FID evaluations at the same LOD reuse ONE compiled sampler
    # (the per-call closure used to retrace+compile every evaluation)
    @partial(jax.jit, static_argnums=(3, 4))
    def sample(params_d, buffers, k, lod, batch_size):
        z = jax.random.normal(k, (batch_size, cfg.latent_space_size), jnp.float32)
        rec, _ = model.generate(params_d, buffers, jax.random.fold_in(k, 1), lod, None, z,
                                mixing=False, truncation=False, update_avg=False)
        return jnp.clip(rec * 0.5 + 0.5, 0.0, 1.0)

    def fid_fn(state, dataset: MultiResImages, lod: int, batch_size: int = 32):
        res = model.layer_to_resolution[lod]
        if res not in real_cache:
            def real_iter():
                seen = 0
                for b in dataset.epoch(res, batch_size):
                    if seen >= cfg.fid_num_images:
                        break
                    seen += b.shape[0]
                    # uint8 batches pass through raw — the streaming-stats
                    # layer normalizes them on device (metrics/fid.py)
                    yield b if b.dtype == np.uint8 else b / 255.0
            real_cache[res] = compute_statistics_streaming(apply_fn, real_iter())
        mu1, s1 = real_cache[res]

        def fake_iter():
            made = 0
            i = 0
            while made < cfg.fid_num_images:
                k = jax.random.fold_in(state.rng, 9000 + i)
                yield np.asarray(sample(state.ema_d, state.ema_buffers, k, lod, batch_size))
                made += batch_size
                i += 1

        mu2, s2 = compute_statistics_streaming(apply_fn, fake_iter())
        return frechet_distance(mu1, s1, mu2, s2)

    return fid_fn
