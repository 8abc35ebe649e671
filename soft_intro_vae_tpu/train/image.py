"""Image trainer — the flagship CIFAR/CelebA Soft-IntroVAE recipe.

Capability parity with train_soft_intro_vae
(/root/reference/soft_intro_vae/train_soft_intro_vae.py:337-702) and its
bootstrap sibling: epoch loop, vanilla warm-up, two-phase introspective step,
MultiStepLR(350,) gamma 0.1 per epoch (:453-454), per-pixel loss scale
(:456), exit_on_negative_diff kill-switch (:652-657), NaN abort (:625-626),
periodic checkpoints with the reference's filename pattern (:491-495),
optional FID cadence (:472-487), bootstrap target-decoder sync
(bootstrap:680-682).

TPU-first: the E+D double update is ONE jitted donated-buffer program; the
same step runs on 1..N chips via jax.sharding (params replicated, batch
sharded — XLA inserts the gradient all-reduce). Per-iteration metrics stay on
device and are fetched once per epoch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.data.images import ArrayDataset, ImageSpec, augment_mirror, make_dataset
from soft_intro_vae_tpu.models.conv import ConvDecoder, ConvEncoder
from soft_intro_vae_tpu.parallel import mesh as pmesh
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps
from soft_intro_vae_tpu.utils.checkpoint import Checkpointer
from soft_intro_vae_tpu.utils.tracker import LossTracker


@dataclasses.dataclass
class ImageConfig:
    """Mirrors the reference trainer kwargs (train_soft_intro_vae.py:337-341)."""

    dataset: str = "cifar10"
    z_dim: int = 128
    lr_e: float = 2e-4
    lr_d: float = 2e-4
    batch_size: int = 128
    num_epochs: int = 250
    num_vae: int = 0
    save_interval: int = 50
    recon_loss_type: str = "mse"
    beta_kl: float = 1.0
    beta_rec: float = 1.0
    beta_neg: float = 1.0
    gamma_r: float = 1e-8
    test_iter: int = 1000
    seed: int = -1
    start_epoch: int = 0
    exit_on_negative_diff: bool = False
    with_fid: bool = False
    fid_num_images: int = 50000
    pretrained: Optional[str] = None
    data_root: str = "./data"
    result_dir: str = "./results_image"
    bootstrap: bool = False          # bootstrap variant (target decoder)
    copy_to_target_freq: int = 1     # bootstrap weight-sync cadence
    mirror_augment: bool = False
    save_figures: bool = False
    num_row: int = 8
    num_devices: Optional[int] = None  # data-parallel mesh size (None = all)
    compute_dtype: str = "float32"   # "bfloat16" for TPU speed
    # None = TPU default (bf16 MXU passes — fast, VAE-safe); "float32" opts
    # into full-precision matmuls for strict numerical parity runs
    matmul_precision: Optional[str] = None
    remat: bool = False  # jax.checkpoint each subnet forward (celeb1024 scale)
    # fuse K reference-exact steps into one XLA program via lax.scan: amortizes
    # the per-launch dispatch floor (the bf16 bs=32 step is launch-bound on
    # v5e — see BENCH_NOTES.md). 1 = one launch per step (reference cadence).
    scan_steps: int = 1
    synthetic_fallback: bool = True
    synthetic_n: int = 2048  # images in the synthetic-fallback dataset
    # sub-epoch NaN abort cadence: every N iterations fetch the LAST step's
    # device metrics (one small host sync) and abort on nonfinite. The
    # reference aborts per iteration (train_soft_intro_vae.py:625-626) but
    # pays a host sync each step; this bounds a diverged run to ~N steps of
    # wasted chip time while keeping the hot loop sync-free. The epoch-mean
    # check still catches anything in between (NaN propagates through means).
    # 0 disables.
    nan_check_iter: int = 200
    # host-side pixel storage: "uint8" (default) keeps source bytes on host —
    # 4x less RAM + 4x fewer H2D bytes, normalized to f32 [0,1] ON DEVICE
    # (data/prefetch.py normalizing_put_fn; exact round-trip, see
    # data/images.py to_unit_float). "float32" = normalize on host (the
    # reference DataLoader's layout, dataset.py:129-134). Only consulted when
    # the trainer builds its own dataset; a caller-passed dataset keeps its dtype.
    host_storage: str = "uint8"
    verbose: bool = True


def build_image_models(spec: ImageSpec, cfg: ImageConfig):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    kw = dict(cdim=spec.cdim, zdim=cfg.z_dim, channels=spec.channels,
              image_size=spec.image_size, dtype=dtype)
    return ConvEncoder(**kw), ConvDecoder(**kw)


def make_model_fns(enc: ConvEncoder, dec: ConvDecoder, remat: bool = False):
    """Functional applies that thread BN batch_stats (torch-train-mode parity).

    ``remat=True`` wraps each subnet forward in jax.checkpoint: the 12-forward
    introspective step keeps only subnet boundaries live and recomputes
    activations in backward — the memory lever for celeb1024-scale models
    (trades ~30% FLOPs for O(depth) less live memory).
    """

    def encode(params, stats, x):
        (mu, lv), upd = enc.apply(
            {"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
        )
        return (mu, lv), upd["batch_stats"]

    def decode(params, stats, z):
        y, upd = dec.apply(
            {"params": params, "batch_stats": stats}, z, train=True, mutable=["batch_stats"]
        )
        return y, upd["batch_stats"]

    if remat:
        encode = jax.checkpoint(encode)
        decode = jax.checkpoint(decode)
    return encode, decode


def build_image_training(cfg: ImageConfig, spec: ImageSpec):
    """Models, steps, mesh, and initial (sharded) state."""
    if cfg.matmul_precision:
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
    enc, dec = build_image_models(spec, cfg)
    encode, decode = make_model_fns(enc, dec, remat=cfg.remat)

    seed = cfg.seed if cfg.seed != -1 else int(time.time()) % (2**31)
    root = jax.random.key(seed)
    k_e, k_d, k_t, k_state = jax.random.split(root, 4)
    dummy_x = jnp.zeros((1, spec.image_size, spec.image_size, spec.cdim))
    dummy_z = jnp.zeros((1, cfg.z_dim))
    ve = enc.init(k_e, dummy_x, train=False)
    vd = dec.init(k_d, dummy_z, train=False)

    opt = optim.adam()
    params_d_target = stats_d_target = None
    if cfg.bootstrap:
        vt = dec.init(k_t, dummy_z, train=False)
        params_d_target, stats_d_target = vt["params"], vt.get("batch_stats", {})

    state = TrainState.create(
        params_e=ve["params"],
        params_d=vd["params"],
        stats_e=ve.get("batch_stats", {}),
        stats_d=vd.get("batch_stats", {}),
        params_d_target=params_d_target,
        stats_d_target=stats_d_target,
        opt_e=opt.init(ve["params"]),
        opt_d=opt.init(vd["params"]),
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
        scale=spec.scale,
        loss_type=cfg.recon_loss_type,
        bootstrap=cfg.bootstrap,
    )
    # uint8 host storage: the step normalizes raw bytes in-program via a LUT
    # gather (bit-exact vs host /255; see build_train_steps) — the feed is one
    # device_put, no separate normalize dispatch. Float datasets pass through.
    lut = (np.arange(256, dtype=np.float32) / 255.0
           if cfg.host_storage == "uint8" else None)
    vanilla_step, intro_step = build_train_steps(
        encode=encode, decode=decode, optimizer=opt, cfg=step_cfg,
        decode_target=decode if cfg.bootstrap else None,
        scan_steps=cfg.scan_steps,
        input_lut=lut,
    )

    mesh = pmesh.make_data_mesh(cfg.num_devices)
    state = pmesh.shard_state(state, mesh)
    return enc, dec, state, vanilla_step, intro_step, mesh


def sync_target_decoder(state: TrainState) -> TrainState:
    """bootstrap weight sync: target <- online (bootstrap:680-682).

    Must be a REAL buffer copy (`.copy()`), not a tree identity: the train
    step donates its input state, and two state leaves aliasing one buffer
    (params_d and params_d_target after an identity "copy") is rejected by
    the TPU runtime with an InvalidArgument at the next step's dispatch.
    CPU ignores donation, which is why only real-chip runs ever saw it."""
    copy = jax.tree_util.tree_map(lambda x: x.copy(), state.params_d)
    stats = jax.tree_util.tree_map(lambda x: x.copy(), state.stats_d)
    return state.replace(params_d_target=copy, stats_d_target=stats)


def _save_sample_grid(enc, dec, state: TrainState, batch: "np.ndarray", cfg: ImageConfig, cur_iter: int):
    """[real | deterministic rec | fake] grid every test_iter
    (train_soft_intro_vae.py:641-646)."""
    from soft_intro_vae_tpu.utils.plotting import save_image_grid

    n = min(batch.shape[0], 16)
    sample = batch[:n]
    if sample.dtype == np.uint8:  # raw-byte feed path: normalize on host
        sample = sample.astype(np.float32) / 255.0
    x = jnp.asarray(sample)
    mu, _ = enc.apply({"params": state.params_e, "batch_stats": state.stats_e}, x, train=False)
    rec_det = dec.apply({"params": state.params_d, "batch_stats": state.stats_d}, mu, train=False)
    k = jax.random.fold_in(state.rng, 2**20 + cur_iter)
    z = jax.random.normal(k, (n, cfg.z_dim), jnp.float32)
    fake = dec.apply({"params": state.params_d, "batch_stats": state.stats_d}, z, train=False)
    grid = np.concatenate([np.asarray(x), np.asarray(rec_det), np.asarray(fake)], axis=0)
    fig_dir = os.path.join(cfg.result_dir, f"figures_{cfg.dataset}")
    save_image_grid(grid, os.path.join(fig_dir, f"image_{cur_iter}.jpg"), nrow=cfg.num_row)


def train_soft_intro_vae(cfg: ImageConfig, dataset: Optional[ArrayDataset] = None,
                         spec: Optional[ImageSpec] = None) -> Tuple[TrainState, dict]:
    """Run the image recipe; returns (state, summary dict)."""
    if dataset is None or spec is None:
        spec, dataset = make_dataset(cfg.dataset, cfg.data_root, seed=max(cfg.seed, 0),
                                     synthetic_fallback=cfg.synthetic_fallback,
                                     synthetic_n=cfg.synthetic_n,
                                     storage=cfg.host_storage)
    from soft_intro_vae_tpu.data.images import SyntheticImages

    if jax.process_count() > 1:
        # multi-host pod: each process keeps a disjoint contiguous slice and
        # contributes it as its local shard of the global batch (mesh._place)
        from soft_intro_vae_tpu.parallel.multihost import per_host_slice

        sl = per_host_slice(len(dataset))
        if hasattr(dataset, "images"):  # in-RAM ArrayDataset
            dataset.images = dataset.images[sl]
        else:  # out-of-core FolderDataset: shard the file list
            dataset.files = dataset.files[sl]
    synthetic_data = isinstance(dataset, SyntheticImages)
    if synthetic_data:
        print("!" * 72)
        print(f"! WARNING: no local {cfg.dataset!r} data found — training on "
              f"SYNTHETIC images.\n! Metrics below are NOT {cfg.dataset} "
              "results. Use --no-synthetic-fallback to fail instead.")
        print("!" * 72)
    enc, dec, state, vanilla_step, intro_step, mesh = build_image_training(cfg, spec)
    if cfg.bootstrap:
        state = sync_target_decoder(state)  # target starts equal to online

    ckpt = Checkpointer(os.path.join(cfg.result_dir, "saves"),
                        prefix=f"{cfg.dataset}_soft_intro_betas_{cfg.beta_kl}_{cfg.beta_neg}_{cfg.beta_rec}_")
    tracker = LossTracker(cfg.result_dir)
    if cfg.pretrained:
        from soft_intro_vae_tpu.utils.checkpoint import load_checkpoint
        state, _, _ = load_checkpoint(cfg.pretrained, state)
        # re-shard the restored state onto the mesh (same as style.py resume)
        # so multi-chip runs don't recompile against host-placed params
        state = pmesh.shard_state(state, mesh)

    lr_e_sched = optim.multistep_lr(cfg.lr_e, (350,), 0.1)
    lr_d_sched = optim.multistep_lr(cfg.lr_d, (350,), 0.1)
    aug_seed = max(cfg.seed, 0) + 1  # per-epoch reseeded (replay-identical resume)

    fid_fn = None
    fid_name = "fid"
    if cfg.with_fid:
        from soft_intro_vae_tpu.metrics.fid import fid_weights_path, make_training_fid  # lazy: heavy
        fid_fn = make_training_fid(dec, spec, cfg)
        if fid_weights_path() is None:
            # random-init Inception: self-consistent ordering, NOT comparable
            # to published FID (reference loads pt_inception weights,
            # metrics/inception.py:17,184-206)
            fid_name = "fid_selfconsistent"
            print("!" * 72)
            print("! WARNING: pt_inception weights not found — FID uses a "
                  "RANDOM-INIT Inception.\n! The metric is logged as "
                  "'fid_selfconsistent' and is NOT comparable to published "
                  "FID.\n! Provide pt_inception-2015-12-05-6726825d.pth (see "
                  "metrics/fid.py) for real FID.")
            print("!" * 72)

    summary = dict(best_fid=None, epochs_run=0, fid_metric=fid_name)
    cur_iter = 0
    start = time.time()
    from soft_intro_vae_tpu.data.prefetch import device_prefetch, sharding_put_fn

    # built ONCE and reused across epochs. Shard-only put: uint8 batches ship
    # as raw bytes and the STEP normalizes them in-program (input_lut in
    # build_image_training) — one H2D put per batch, no extra dispatch.
    put_fn = sharding_put_fn(mesh, scan=cfg.scan_steps > 1)
    for epoch in range(cfg.start_epoch, cfg.num_epochs):
        if fid_fn is not None and (epoch == 0 or (epoch >= 100 and epoch % 20 == 0) or epoch == cfg.num_epochs - 1):
            fid = fid_fn(state, dataset, num_images=min(cfg.fid_num_images, len(dataset)))
            if cfg.verbose:
                print(f"epoch {epoch} {fid_name}: {fid:.3f}")
            tracker.update({fid_name: fid})
            if summary["best_fid"] is None or fid < summary["best_fid"]:
                summary["best_fid"] = fid
                ckpt.save(state, epoch, cur_iter, tag=f"_{fid_name}_{fid:.3f}")
        if epoch % cfg.save_interval == 0 and epoch > 0:
            ckpt.save(state, epoch, cur_iter, async_save=True)

        step_fn = vanilla_step if epoch < cfg.num_vae else intro_step

        def host_batches():
            # epoch-index seeding makes shuffle/augment draws a pure function
            # of (seed, epoch): a resumed run replays the uninterrupted run
            aug_rng = np.random.default_rng((aug_seed, epoch))
            for batch in dataset.epoch(cfg.batch_size, drop_last=True, epoch_index=epoch):
                if cfg.mirror_augment:
                    batch = augment_mirror(batch, aug_rng)
                yield batch

        def host_chunks():
            """Stack scan_steps batches into one (K, B, ...) H2D transfer; a
            short trailing chunk re-specializes the same jitted scan fn."""
            buf = []
            for batch in host_batches():
                buf.append(batch)
                if len(buf) == cfg.scan_steps:
                    yield np.stack(buf)
                    buf = []
            if buf:
                yield np.stack(buf)

        device_metrics = []
        # uint8-aware put: ships source bytes, normalizes to f32 on device
        # (no-op passthrough for float datasets)
        raw_iter = device_prefetch(
            host_chunks() if cfg.scan_steps > 1 else host_batches(),
            size=2, put_fn=put_fn)
        for x in raw_iter:
            k = int(x.shape[0]) if cfg.scan_steps > 1 else 1
            state, m = step_fn(state, x)
            device_metrics.append(m)
            # fire when a multiple of test_iter lies in [cur_iter, cur_iter+k);
            # at k=1 this reproduces the reference's `cur_iter % test_iter == 0`
            if cfg.save_figures and (cur_iter == 0
                                     or (cur_iter + k - 1) // cfg.test_iter != (cur_iter - 1) // cfg.test_iter):
                grid_x = np.asarray(x)[0] if cfg.scan_steps > 1 else np.asarray(x)
                _save_sample_grid(enc, dec, state, grid_x, cfg, cur_iter)
            if (cfg.nan_check_iter and
                    (cur_iter + k - 1) // cfg.nan_check_iter != (cur_iter - 1) // cfg.nan_check_iter):
                last = jax.device_get(m)
                if any(not np.all(np.isfinite(v)) for v in last.values()):
                    raise SystemError("loss is NaN")
            cur_iter += k

        # one host sync per epoch
        host = jax.device_get(device_metrics)
        # with scan_steps > 1 each entry holds (k,)-stacked per-step values;
        # concatenate so every step weighs equally in the epoch mean
        ep_mean = ({k: float(np.mean(np.concatenate([np.atleast_1d(h[k]) for h in host])))
                    for k in host[0]} if host else {})
        tracker.update(ep_mean)
        tracker.register_means(epoch)
        if any(np.isnan(v) for v in ep_mean.values()):
            raise SystemError("loss is NaN")
        if (cfg.exit_on_negative_diff and epoch > 50 and "diff_kl" in ep_mean
                and ep_mean["diff_kl"] < -1.0):
            raise SystemError("Negative KL Difference — lower beta_neg")

        if cfg.bootstrap and epoch % cfg.copy_to_target_freq == 0:
            state = sync_target_decoder(state)

        # per-epoch LR schedule (:649-650)
        state = state.replace(
            lr_e=jnp.asarray(lr_e_sched(epoch + 1), jnp.float32),
            lr_d=jnp.asarray(lr_d_sched(epoch + 1), jnp.float32),
        )
        summary["epochs_run"] = epoch + 1
        if cfg.verbose and ep_mean:
            keys = ("rec", "kl_real", "kl_fake", "kl_rec", "diff_kl")
            msg = ", ".join(f"{k}: {ep_mean[k]:.3f}" for k in keys if k in ep_mean)
            print(f"epoch {epoch}: {msg} ({time.time() - start:.1f}s)")

    ckpt.save(state, cfg.num_epochs - 1, cur_iter)
    ckpt.wait()
    tracker.plot()
    tracker.save_pickle()  # loss-curve pickle parity (:695-697)
    return state, summary
