"""Deeper integration checks: BN stat threading, bf16 path, async ckpt, toy metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.data.images import ImageSpec
from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training
from soft_intro_vae_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast profile


def _tiny_cfg(**kw):
    base = dict(dataset="cifar10", z_dim=8, batch_size=16, seed=0, beta_neg=16.0)
    base.update(kw)
    return ImageConfig(**base)


class TestBNStatThreading:
    def test_intro_step_updates_both_stats_collections(self):
        spec = ImageSpec("t", 16, (8, 16), 3)
        cfg = _tiny_cfg()
        _, _, state, _, intro, mesh = build_image_training(cfg, spec)
        # snapshot to host first: the jitted step donates the input state
        old_e = jax.tree_util.tree_map(np.asarray, state.stats_e)
        old_d = jax.tree_util.tree_map(np.asarray, state.stats_d)
        x = pmesh.shard_batch(jax.random.uniform(jax.random.key(1), (16, 16, 16, 3)), mesh)
        new_state, _ = intro(state, x)
        for old, new, name in [(old_e, new_state.stats_e, "enc"),
                               (old_d, new_state.stats_d, "dec")]:
            pairs = zip(jax.tree_util.tree_leaves(old), jax.tree_util.tree_leaves(new))
            assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in pairs), name

    def test_vanilla_step_also_updates_stats(self):
        spec = ImageSpec("t", 16, (8, 16), 3)
        cfg = _tiny_cfg()
        _, _, state, vanilla, _, mesh = build_image_training(cfg, spec)
        old_d = jax.tree_util.tree_map(np.asarray, state.stats_d)
        x = pmesh.shard_batch(jax.random.uniform(jax.random.key(2), (16, 16, 16, 3)), mesh)
        new_state, _ = vanilla(state, x)
        pairs = zip(jax.tree_util.tree_leaves(old_d),
                    jax.tree_util.tree_leaves(new_state.stats_d))
        assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in pairs)


class TestBf16Path:
    def test_intro_step_finite_in_bf16(self):
        spec = ImageSpec("t", 16, (8, 16), 3)
        cfg = _tiny_cfg(compute_dtype="bfloat16")
        _, _, state, _, intro, mesh = build_image_training(cfg, spec)
        x = pmesh.shard_batch(jax.random.uniform(jax.random.key(3), (16, 16, 16, 3)), mesh)
        for _ in range(3):
            state, m = intro(state, x)
        assert all(np.isfinite(float(v)) for v in m.values())
        # params stay f32 even with bf16 compute
        assert all(l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(state.params_e))


class TestCheckpointAsync:
    def test_async_save_and_pointer(self, tmp_path):
        from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

        ck = Checkpointer(str(tmp_path))
        payload = {"a": jnp.ones((4,)), "rng": jax.random.key(1)}
        ck.save(payload, epoch=3, iteration=30, async_save=True)
        ck.wait()
        assert os.path.exists(os.path.join(str(tmp_path), "last_checkpoint"))
        restored, ep, it = ck.load_latest(payload)
        assert (ep, it) == (3, 30)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.ones(4))

    def test_tag_and_best_selection(self, tmp_path):
        from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

        ck = Checkpointer(str(tmp_path))
        ck.save({"a": jnp.zeros(1)}, epoch=1, iteration=10)
        ck.save({"a": jnp.ones(1)}, epoch=2, iteration=20, tag="_fid_12.3")
        restored, ep, _ = ck.load_latest({"a": jnp.zeros(1)})
        assert ep == 2  # pointer tracks the most recent save


class TestToyMetricSemantics:
    def test_same_distribution_low_kl(self):
        from soft_intro_vae_tpu.data.toy import ToyDataset
        from soft_intro_vae_tpu.metrics.toy import sample_kl_2d

        ds = ToyDataset("8Gaussians", seed=3)
        other = ToyDataset("8Gaussians", seed=4)

        def fake_sampler(n):
            return other.next_batch(n)

        kl_same = sample_kl_2d(fake_sampler, ds, num_samples=5000, xy_range=(-2, 2))
        shifted = ToyDataset("checkerboard", seed=5)

        def fake_diff(n):
            return shifted.next_batch(n)

        kl_diff = sample_kl_2d(fake_diff, ds, num_samples=5000, xy_range=(-2, 2))
        assert kl_same < kl_diff


class TestRemat:
    def test_remat_matches_no_remat(self):
        """jax.checkpoint must not change values, only memory/FLOPs."""
        from soft_intro_vae_tpu.train.image import build_image_training

        spec = ImageSpec("t", 16, (8, 16), 3)
        results = []
        for remat in (False, True):
            cfg = _tiny_cfg(remat=remat)
            _, _, state, _, intro, mesh = build_image_training(cfg, spec)
            x = pmesh.shard_batch(jax.random.uniform(jax.random.key(7), (16, 16, 16, 3)), mesh)
            _, m = intro(state, x)
            results.append({k: float(v) for k, v in m.items()})
        for k in results[0]:
            assert results[0][k] == pytest.approx(results[1][k], rel=1e-5), k


class TestTrainerScanSteps:
    def test_trainer_scan_matches_sequential(self, tmp_path):
        """A full trainer epoch with scan_steps=3 (chunks 3+3+2 — the trailing
        chunk re-specializes the scan) equals the scan_steps=1 run."""
        from soft_intro_vae_tpu.data.images import ArrayDataset
        from soft_intro_vae_tpu.train.image import train_soft_intro_vae

        spec = ImageSpec("t", 16, (8, 16), 3)
        imgs = np.random.default_rng(5).random((128, 16, 16, 3)).astype(np.float32)

        def run(scan_steps):
            cfg = _tiny_cfg(num_epochs=1, num_vae=0, scan_steps=scan_steps,
                            result_dir=str(tmp_path / f"scan{scan_steps}"),
                            verbose=False)
            state, summary = train_soft_intro_vae(
                cfg, dataset=ArrayDataset(imgs.copy(), seed=3), spec=spec)
            return state, summary

        s1, _ = run(1)
        s3, _ = run(3)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params_e),
                        jax.tree_util.tree_leaves(s3.params_e)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params_d),
                        jax.tree_util.tree_leaves(s3.params_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestBootstrapTargetSyncAliasing:
    def test_sync_makes_fresh_buffers(self):
        """Regression: sync_target_decoder must COPY, not alias — the donated
        train step rejects two state leaves sharing one buffer on TPU
        (InvalidArgument at the next dispatch; CPU ignores donation, so only
        real-chip runs crashed)."""
        from soft_intro_vae_tpu.train.image import build_image_training, sync_target_decoder

        spec = ImageSpec("t", 16, (8, 16), 3)
        cfg = _tiny_cfg(bootstrap=True, gamma_r=1.0)
        _, _, state, _, _, _ = build_image_training(cfg, spec)
        synced = sync_target_decoder(state)
        for a, b in zip(jax.tree_util.tree_leaves(synced.params_d),
                        jax.tree_util.tree_leaves(synced.params_d_target)):
            assert a is not b  # the old identity tree_map returned the SAME object
            for sa, sb in zip(a.addressable_shards, b.addressable_shards):
                assert (sa.data.unsafe_buffer_pointer()
                        != sb.data.unsafe_buffer_pointer())
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNaNAbort:
    def test_diverged_run_aborts_mid_epoch(self, tmp_path):
        # absurd LR drives the losses nonfinite within a few steps; the
        # sub-epoch nan_check_iter fetch (train/image.py) must abort with the
        # reference's message (train_soft_intro_vae.py:625-626) well before
        # the 128-step epoch completes
        from soft_intro_vae_tpu.train.image import train_soft_intro_vae

        cfg = ImageConfig(dataset="mnist", z_dim=8, batch_size=16, num_epochs=1,
                          num_vae=0, seed=0, lr_e=1e12, lr_d=1e12,
                          nan_check_iter=5, result_dir=str(tmp_path / "out"),
                          synthetic_fallback=True)
        with pytest.raises(SystemError, match="NaN"):
            train_soft_intro_vae(cfg)
