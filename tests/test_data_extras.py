"""Tests for transforms3d, DCGAN pair, augments, TFRecord dataset prep."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.data.transforms3d import (
    Compose,
    RotateAxisAngle,
    axis_angle_matrix,
    check_valid_rotation_matrix,
    euler_matrix,
    jitter,
    rotate_points,
    unit_sphere_normalize,
)


class TestTransforms3D:
    def test_axis_angle_valid_rotations(self):
        for ax in "XYZ":
            m = axis_angle_matrix(ax, np.array([0.0, 45.0, 90.0, 180.0]))
            assert check_valid_rotation_matrix(m)

    def test_z_rotation_90(self):
        m = axis_angle_matrix("Z", np.array([90.0]))
        p = np.array([[[1.0, 0.0, 0.5]]], np.float32)
        out = rotate_points(p, m)
        np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 0.5], atol=1e-6)

    def test_reference_call_signature(self):
        angle = np.random.RandomState(0).rand(4) * 180
        t = RotateAxisAngle(angle, axis="Z")
        x = np.random.RandomState(1).randn(4, 32, 3).astype(np.float32)
        y = t.transform_points(x)
        np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                                   np.linalg.norm(x, axis=-1), rtol=1e-4)

    def test_euler_composition(self):
        m = euler_matrix(np.array([[30.0, 40.0, 50.0]]))
        assert check_valid_rotation_matrix(m)

    def test_normalize_and_jitter_and_compose(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 3.0, (2, 64, 3)).astype(np.float32)
        t = Compose([unit_sphere_normalize, lambda p: jitter(p, rng, sigma=0.0)])
        y = t(x)
        assert (np.linalg.norm(y, axis=-1) <= 0.5 + 1e-5).all()


class TestDCGAN:
    def test_roundtrip_shapes(self):
        from soft_intro_vae_tpu.models.dcgan import DCGANEncoder, DCGANGenerator

        gen = DCGANGenerator()
        z = jnp.zeros((2, 24))
        gv = gen.init(jax.random.key(0), z, train=False)
        x = gen.apply(gv, z, train=False)
        assert x.shape == (2, 32, 32, 3)
        assert float(jnp.max(jnp.abs(x))) <= 1.0  # tanh output
        enc = DCGANEncoder()
        ev = enc.init(jax.random.key(1), x, train=False)
        out = enc.apply(ev, x, train=False)
        assert out.shape == (2, 24)


class TestAugments:
    def test_hue_preserves_range_and_changes_colors(self):
        from soft_intro_vae_tpu.data.images import augment_hue

        rng = np.random.default_rng(0)
        x = rng.random((4, 8, 8, 3)).astype(np.float32)
        y = augment_hue(x, rng)
        assert y.min() >= 0 and y.max() <= 1
        assert not np.allclose(x, y)

    def test_translate_keeps_shape(self):
        from soft_intro_vae_tpu.data.images import augment_translate

        rng = np.random.default_rng(1)
        x = rng.random((3, 16, 16, 3)).astype(np.float32)
        y = augment_translate(x, rng)
        assert y.shape == x.shape


class TestDatasetPrep:
    def test_multires_shards_roundtrip(self, tmp_path):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import write_multires_shards
        from soft_intro_vae_tpu.train.style import MultiResImages

        rng = np.random.default_rng(0)
        imgs = (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8)
        paths = write_multires_shards(imgs, str(tmp_path), "toy", max_level=4, parts=2)
        # levels 4,3,2 x 2 parts
        assert len(paths) == 6
        max_paths = [p for p in paths if "-r04" in p]
        ds = MultiResImages.from_tfrecords(max_paths, rank=0, world_size=1, flip=False)
        assert len(ds) == 8
        # shards interleave images round-robin; compare as unordered sets
        got = sorted(im.tobytes() for im in ds.at_resolution(16).astype(np.uint8))
        want = sorted(im.tobytes() for im in imgs)
        assert got == want
        # per-rank split
        ds0 = MultiResImages.from_tfrecords(max_paths, rank=0, world_size=2, flip=False)
        ds1 = MultiResImages.from_tfrecords(max_paths, rank=1, world_size=2, flip=False)
        assert len(ds0) == len(ds1) == 4

    def test_downscale_u8(self):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import downscale_u8

        img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        out = downscale_u8(img)
        assert out.shape == (2, 2, 3)


class TestStyleEncoderVariants:
    def test_last_block_dense_variant(self):
        from soft_intro_vae_tpu.models.style import StyleEncoder

        enc = StyleEncoder(startf=8, maxf=32, layer_count=3, latent_size=16,
                           last_block_dense=True)
        x = jnp.zeros((2, 16, 16, 3))
        v = enc.init(jax.random.key(0), x, method=StyleEncoder.init_all)
        out = enc.apply(v, x, 2, None)
        assert out.shape == (2, 1, 16)

    def test_with_fc_head_variant(self):
        from soft_intro_vae_tpu.models.style import StyleEncoder

        enc = StyleEncoder(startf=8, maxf=32, layer_count=3, latent_size=16,
                           with_fc_head=True)
        x = jnp.zeros((2, 16, 16, 3))
        v = enc.init(jax.random.key(0), x, method=StyleEncoder.init_all)
        styles, fc = enc.apply(v, x, 2, None)
        assert styles.shape == (2, 1, 16)
        assert fc.shape == (2, 1)
