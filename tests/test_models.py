"""Shape/behavior tests for every encoder/decoder config in SURVEY §2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.models import (
    ConvDecoder,
    ConvEncoder,
    DecoderMLP,
    EncoderMLP,
    PointNetDecoder,
    PointNetEncoder,
    SoftIntroVAE,
    SoftIntroVAE3D,
    upsample_nearest_2x,
)

# the reference dataset registry's (image_size, channels, cdim) table
# (train_soft_intro_vae.py:376-440)
IMAGE_CONFIGS = [
    ("cifar10", 32, (64, 128, 256), 3, 128),
    ("mnist", 28, (64, 128), 1, 32),
    ("celeb128", 128, (64, 128, 256, 512, 512), 3, 128),
]
BIG_CONFIGS = [
    ("celeb256", 256, (64, 128, 256, 512, 512, 512), 3, 256),
    ("celeb1024", 1024, (16, 32, 64, 128, 256, 512, 512, 512), 3, 256),
]


class TestMLP:
    def test_shapes(self):
        enc = EncoderMLP(x_dim=2, z_dim=2, n_layers=3, num_hidden=256)
        dec = DecoderMLP(x_dim=2, z_dim=2, n_layers=3, num_hidden=256)
        x = jnp.zeros((16, 2))
        pe = enc.init(jax.random.key(0), x)["params"]
        mu, logvar = enc.apply({"params": pe}, x)
        assert mu.shape == logvar.shape == (16, 2)
        pd = dec.init(jax.random.key(1), mu)["params"]
        out = dec.apply({"params": pd}, mu)
        assert out.shape == (16, 2)

    def test_param_count_matches_reference_arch(self):
        # 3 hidden layers x 256: input(2->256) + 3x(256->256) + out(256->4)
        enc = EncoderMLP(x_dim=2, z_dim=2, n_layers=3, num_hidden=256)
        pe = enc.init(jax.random.key(0), jnp.zeros((1, 2)))["params"]
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(pe))
        expect = (2 * 256 + 256) + 3 * (256 * 256 + 256) + (256 * 4 + 4)
        assert n == expect


class TestConvModels:
    @pytest.mark.parametrize("name,size,channels,cdim,zdim", IMAGE_CONFIGS)
    def test_encoder_decoder_shapes(self, name, size, channels, cdim, zdim):
        # pure shape test: eval_shape traces the whole model (catching any
        # sizing bug) without paying an XLA compile per config — the larger
        # configs cost ~30s each to compile on this 1-core host
        enc = ConvEncoder(cdim=cdim, zdim=zdim, channels=channels, image_size=size)
        dec = ConvDecoder(cdim=cdim, zdim=zdim, channels=channels, image_size=size)
        x = jax.ShapeDtypeStruct((2, size, size, cdim), jnp.float32)
        variables = jax.eval_shape(lambda k, x: enc.init(k, x, train=False),
                                   jax.random.key(0), x)
        mu, logvar = jax.eval_shape(lambda v, x: enc.apply(v, x, train=False),
                                    variables, x)
        assert mu.shape == logvar.shape == (2, zdim)
        s = size // (2 ** len(channels))
        assert enc.conv_output_spatial == s
        dvars = jax.eval_shape(lambda k, m: dec.init(k, m, train=False),
                               jax.random.key(1), mu)
        y = jax.eval_shape(lambda v, m: dec.apply(v, m, train=False), dvars, mu)
        assert y.shape == (2, size, size, cdim)

    def test_batch_stats_update_in_train_mode(self):
        enc = ConvEncoder(cdim=3, zdim=16, channels=(8,), image_size=8)
        x = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))
        variables = enc.init(jax.random.key(0), x, train=False)
        _, upd = enc.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(upd["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_composed_model_forward(self):
        m = SoftIntroVAE(cdim=3, zdim=16, channels=(8, 16), image_size=16)
        x = jnp.zeros((2, 16, 16, 3))
        variables = m.init(jax.random.key(0), x, deterministic=True, train=False)
        mu, logvar, z, rec = m.apply(variables, x, deterministic=True, train=False)
        assert rec.shape == x.shape
        np.testing.assert_array_equal(np.asarray(z), np.asarray(mu))

    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = upsample_nearest_2x(x)
        assert y.shape == (1, 4, 4, 1)
        expect = [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]
        np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]), expect)

    def test_conditional_encoder(self):
        enc = ConvEncoder(cdim=1, zdim=8, channels=(8, 16), image_size=28, conditional=True, cond_dim=10)
        x = jnp.zeros((2, 28, 28, 1))
        cond = jnp.zeros((2, 10))
        variables = enc.init(jax.random.key(0), x, cond, train=False)
        mu, logvar = enc.apply(variables, x, cond, train=False)
        assert mu.shape == (2, 8)


class TestPointNet:
    def test_shapes(self):
        # shape-only: eval_shape avoids the ~27s PointNet compile; real
        # execution is covered by test_maxpool_invariant_to_point_permutation
        m = SoftIntroVAE3D(z_dim=128, n_points=256)
        x = jax.ShapeDtypeStruct((2, 256, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda k, x: m.init(k, x, deterministic=True, train=False),
            jax.random.key(0), x)
        rec, mu, logvar = jax.eval_shape(
            lambda v, x: m.apply(v, x, deterministic=True, train=False),
            variables, x)
        assert rec.shape == (2, 256, 3)
        assert mu.shape == logvar.shape == (2, 128)

    def test_maxpool_invariant_to_point_permutation(self):
        enc = PointNetEncoder(z_dim=16)
        x = jax.random.normal(jax.random.key(1), (1, 64, 3))
        variables = enc.init(jax.random.key(0), x, train=False)
        mu1, _ = enc.apply(variables, x, train=False)
        perm = jax.random.permutation(jax.random.key(2), 64)
        mu2, _ = enc.apply(variables, x[:, perm], train=False)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-4, atol=1e-5)

    def test_decoder_output_range_unbounded(self):
        dec = PointNetDecoder(z_dim=8, n_points=128)
        z = jax.random.normal(jax.random.key(3), (2, 8))
        variables = dec.init(jax.random.key(0), z)
        y = dec.apply(variables, z)
        assert y.shape == (2, 128, 3)
