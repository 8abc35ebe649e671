"""Style variant tests: lreq layers vs torch, blocks, LOD driver, short run."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from soft_intro_vae_tpu.models.lreq import LreqConv2d, LreqConvTranspose2d, LreqDense
from soft_intro_vae_tpu.models.style import (
    StyleEncoder,
    StyleGenerator,
    MappingFromLatent,
    MappingToLatent,
    blur3x3,
    instance_norm,
    pixel_norm,
    style_mod,
    upscale2d,
)
from soft_intro_vae_tpu.train.lod import LODDriver, pick_batch_table
from soft_intro_vae_tpu.train.lreq_adam import scale_by_lreq_adam

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast profile


class TestLreqLayers:
    def test_dense_explicit_scaling_matches_torch_formula(self):
        x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
        layer = LreqDense(8, gain=math.sqrt(2.0), lrmul=0.5)
        v = layer.init(jax.random.key(1), jnp.array(x))
        w = np.asarray(v["params"]["kernel"])
        b = np.asarray(v["params"]["bias"])
        std = math.sqrt(2.0) / math.sqrt(16) * 0.5
        expect = x @ (w * std) + b * 0.5
        got = np.asarray(layer.apply(v, jnp.array(x)))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_conv_matches_torch(self):
        rs = np.random.RandomState(1)
        x = rs.randn(2, 8, 8, 4).astype(np.float32)
        layer = LreqConv2d(6, 3, 1, 1, gain=math.sqrt(2.0))
        v = layer.init(jax.random.key(0), jnp.array(x))
        w = np.asarray(v["params"]["kernel"])  # HWIO
        std = math.sqrt(2.0) / math.sqrt(3 * 3 * 4)
        ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                       torch.tensor((w * std).transpose(3, 2, 0, 1)), padding=1)
        got = np.asarray(layer.apply(v, jnp.array(x)))
        np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    def test_fused_downscale_conv_halves_resolution(self):
        x = jnp.ones((1, 16, 16, 4))
        layer = LreqConv2d(8, 3, 2, 1, transform_kernel=True)
        v = layer.init(jax.random.key(0), x)
        y = layer.apply(v, x)
        assert y.shape == (1, 8, 8, 8)

    def test_transpose_conv_doubles_resolution_and_matches_torch(self):
        rs = np.random.RandomState(2)
        x = rs.randn(1, 4, 4, 3).astype(np.float32)
        layer = LreqConvTranspose2d(5, 3, 2, 1, transform_kernel=True, gain=1.0)
        v = layer.init(jax.random.key(0), jnp.array(x))
        y = np.asarray(layer.apply(v, jnp.array(x)))
        assert y.shape == (1, 8, 8, 5)
        # torch oracle: same kernel transform + conv_transpose2d
        w = np.asarray(v["params"]["kernel"])  # (3,3,in,out)
        wt = torch.tensor(w.transpose(2, 3, 0, 1))  # (in,out,3,3)
        wt = F.pad(wt, (1, 1, 1, 1))
        wt = wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]
        std = 1.0 / math.sqrt(3 * 3 * 3)
        ref = F.conv_transpose2d(torch.tensor(x.transpose(0, 3, 1, 2)), wt * std, stride=2, padding=1)
        np.testing.assert_allclose(y, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


class TestStyleOps:
    def test_pixel_norm_unit_scale(self):
        x = np.random.RandomState(3).randn(4, 32).astype(np.float32)
        y = np.asarray(pixel_norm(jnp.array(x)))
        np.testing.assert_allclose(np.mean(y**2, axis=-1), 1.0, rtol=1e-4)

    def test_style_mod_identity_at_zero_style(self):
        x = np.random.RandomState(4).randn(2, 4, 4, 8).astype(np.float32)
        s = np.zeros((2, 16), np.float32)
        np.testing.assert_allclose(np.asarray(style_mod(jnp.array(x), jnp.array(s))), x, rtol=1e-6)

    def test_blur_matches_torch_depthwise(self):
        x = np.random.RandomState(5).randn(2, 6, 6, 3).astype(np.float32)
        got = np.asarray(blur3x3(jnp.array(x)))
        f = np.array([1, 2, 1], np.float32)
        k = np.outer(f, f) / 16.0
        w = torch.tensor(np.tile(k[None, None], (3, 1, 1, 1)))
        ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), w, padding=1, groups=3)
        np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    def test_instance_norm_matches_torch(self):
        x = np.random.RandomState(6).randn(2, 5, 5, 4).astype(np.float32)
        got = np.asarray(instance_norm(jnp.array(x), 1e-5))
        ref = F.instance_norm(torch.tensor(x.transpose(0, 3, 1, 2)), eps=1e-5)
        np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


class TestStyleNets:
    def setup_method(self):
        self.kw = dict(startf=8, maxf=32, layer_count=3, latent_size=16, channels=3)

    def test_encoder_all_lods(self):
        enc = StyleEncoder(**self.kw)
        x_full = jnp.zeros((2, 16, 16, 3))
        v = enc.init(jax.random.key(0), x_full, method=StyleEncoder.init_all)
        for lod in range(3):
            res = 2 ** (lod + 2)
            out = enc.apply(v, jnp.zeros((2, res, res, 3)), lod, None)
            assert out.shape == (2, 1, 16)

    def test_encoder_blend_path(self):
        enc = StyleEncoder(**self.kw)
        v = enc.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)), method=StyleEncoder.init_all)
        out = enc.apply(v, jnp.zeros((2, 16, 16, 3)), 2, jnp.float32(0.3))
        assert out.shape == (2, 1, 16)

    def test_generator_all_lods_and_blend(self):
        gen = StyleGenerator(**self.kw)
        styles = jnp.zeros((2, 6, 16))
        v = gen.init(jax.random.key(0), styles, jax.random.key(1), method=StyleGenerator.init_all)
        for lod in range(3):
            y = gen.apply(v, styles, lod, jax.random.key(2))
            assert y.shape == (2, 2 ** (lod + 2), 2 ** (lod + 2), 3)
        yb = gen.apply(v, styles, 2, jax.random.key(2), jnp.float32(0.5))
        assert yb.shape == (2, 16, 16, 3)

    def test_generator_noise_free_deterministic(self):
        gen = StyleGenerator(**self.kw)
        styles = jnp.ones((1, 6, 16)) * 0.1
        v = gen.init(jax.random.key(0), styles, jax.random.key(1), method=StyleGenerator.init_all)
        y1 = gen.apply(v, styles, 1, None, None, "none")
        y2 = gen.apply(v, styles, 1, None, None, "none")
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_mappings(self):
        mtl = MappingToLatent(latent_size=16, dlatent_size=16, mapping_fmaps=16, mapping_layers=3)
        v = mtl.init(jax.random.key(0), jnp.zeros((2, 1, 16)))
        y = mtl.apply(v, jnp.zeros((2, 1, 16)))
        assert y.shape == (2, 2, 16)
        mfl = MappingFromLatent(num_layers=6, latent_size=16, dlatent_size=16,
                                mapping_fmaps=16, mapping_layers=4)
        v2 = mfl.init(jax.random.key(1), jnp.zeros((2, 16)))
        s = mfl.apply(v2, jnp.zeros((2, 16)))
        assert s.shape == (2, 6, 16)


class TestLreqAdam:
    def test_matches_reference_formula(self):
        opt = scale_by_lreq_adam(beta2=0.99, eps=1e-8)
        p = {"w": jnp.ones((3,))}
        g = {"w": jnp.array([0.1, -0.2, 0.3])}
        st = opt.init(p)
        upd, st = opt.update(g, st, p)
        v = 0.01 * np.asarray(g["w"]) ** 2
        expect = math.sqrt(1 - 0.99) * np.asarray(g["w"]) / (np.sqrt(v) + 1e-8)
        np.testing.assert_allclose(np.asarray(upd["w"]), expect, rtol=1e-5)

    def test_sign_following_behavior(self):
        # with beta1=0 the first step is ~sign(g)/1 * sqrt(1-beta2)/sqrt(1-beta2) = sign(g)
        opt = scale_by_lreq_adam()
        p = {"w": jnp.zeros((4,))}
        g = {"w": jnp.array([1.0, -2.0, 0.5, -0.1])}
        upd, _ = opt.update(g, opt.init(p), p)
        np.testing.assert_allclose(np.asarray(upd["w"]), np.sign(np.asarray(g["w"])), rtol=1e-3)


class TestLODDriver:
    def _driver(self, **kw):
        args = dict(lod_2_batch=[128, 128, 128, 32], epochs_per_lod=4, layer_count=4,
                    dataset_size=1000, world_size=1)
        args.update(kw)
        return LODDriver(**args)

    def test_lod_progression_and_switch_signal(self):
        d = self._driver()
        switches = [d.set_epoch(e) for e in range(16)]
        assert switches[0] and switches[4] and switches[8] and switches[12]
        assert not any(switches[1:4]) and not any(switches[5:8])
        assert d.lod == 3

    def test_lod_capped_at_layer_count(self):
        d = self._driver()
        d.set_epoch(100)
        assert d.lod == 3

    def test_blend_rises_during_transition(self):
        d = self._driver()
        d.set_epoch(4)  # lod 1, in transition
        assert d.in_transition
        b0 = d.get_blend_factor()
        d.iteration = 900
        b1 = d.get_blend_factor()
        assert 0.0 <= b0 < b1 <= 1.0
        d.set_epoch(6)  # second half of cycle -> transition over
        assert not d.in_transition
        assert d.get_blend_factor() == 1.0

    def test_batch_table_pick(self):
        tables = {"8GPU": [512], "1GPU": [128]}
        assert pick_batch_table(tables, 8) == [512]
        assert pick_batch_table(tables, 1) == [128]
        # no 16-chip table: largest table <= mesh size, used as-is (global batch)
        assert pick_batch_table(tables, 16) == [512]
        assert pick_batch_table({"1GPU": [64]}, 4) == [64]


class TestStyleTraining:
    def test_short_style_run(self, tmp_path):
        from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae

        cfg = StyleConfig(
            layer_count=3, start_channel_count=8, max_channel_count=32,
            latent_space_size=16, mapping_layers=2, epochs_per_lod=2,
            train_epochs=3, num_vae=1, beta_neg=(32, 32, 32),
            scale=1.0 / (3 * 16**2), use_synthetic=True, synthetic_n=64,
            max_resolution_level=4, output_dir=str(tmp_path / "style_out"),
            lod_2_batch_tables={"1GPU": [16, 16, 16]}, verbose=False, seed=0,
        )
        state, summary = train_style_soft_intro_vae(cfg)
        assert summary["epochs_run"] == 3
        assert int(jax.device_get(state.step)) > 0, "no training steps executed"
        # EMA diverged from zero-init direction but stays finite
        leaves = jax.tree_util.tree_leaves(state.ema_d)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_yaml_config_roundtrip(self, tmp_path):
        from soft_intro_vae_tpu.train.style import StyleConfig

        y = """
NAME: test
MODEL:
  LATENT_SPACE_SIZE: 512
  LAYER_COUNT: 7
  BETA_KL: 0.2
  BETA_NEG: [2048, 1024]
TRAIN:
  EPOCHS_PER_LOD: 16
  LOD_2_BATCH_1GPU: [128, 64]
  LEARNING_RATES: [0.0015, 0.002]
"""
        p = tmp_path / "cfg.yaml"
        p.write_text(y)
        cfg = StyleConfig.from_yaml(str(p), overrides=["MODEL.BETA_KL", "0.5"])
        assert cfg.latent_space_size == 512
        assert cfg.layer_count == 7
        assert cfg.beta_kl == 0.5  # override applied
        assert cfg.beta_neg == (2048, 1024)
        assert cfg.lod_2_batch_tables == {"1GPU": [128, 64]}


class TestEncodeBlockGradSafety:
    def test_near_constant_channel_grads_finite(self):
        """Regression: the one-pass clamped variance sqrt(max(E[x^2]-m^2, 0))
        had an inf*0=NaN backward whenever the clamp engaged (near-constant
        channel with large mean); the +1e-12 sqrt offset keeps it finite."""
        import jax
        from soft_intro_vae_tpu.models.style import EncodeBlock

        blk = EncodeBlock(inputs=4, outputs=8, latent_size=8, fused_scale=False)
        x = jnp.full((2, 8, 8, 4), 100.0, jnp.float32)
        x = x.at[0, 0, 0, 0].add(1e-3)  # variance cancels to <=0 in f32
        params = blk.init(jax.random.key(0), x)["params"]

        def loss(p, x):
            h, w1, w2 = blk.apply({"params": p}, x)
            return jnp.sum(h) + jnp.sum(w1) + jnp.sum(w2)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        for leaf in jax.tree_util.tree_leaves((gp, gx)):
            assert np.isfinite(np.asarray(leaf)).all()
