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
        z = jnp.zeros((1, 24))
        gv = gen.init(jax.random.key(0), z, train=False)
        x = gen.apply(gv, z, train=False)
        assert x.shape == (1, 32, 32, 3)
        assert float(jnp.max(jnp.abs(x))) <= 1.0  # tanh output
        # encoder leg is shape-only -> eval_shape (skips a ~15s compile)
        enc = DCGANEncoder()
        ev = jax.eval_shape(lambda k, x: enc.init(k, x, train=False),
                            jax.random.key(1), x)
        out = jax.eval_shape(lambda v, x: enc.apply(v, x, train=False), ev, x)
        assert out.shape == (1, 24)


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
        # shape-only plumbing check -> eval_shape (no XLA compile)
        x = jax.ShapeDtypeStruct((2, 16, 16, 3), jnp.float32)
        v = jax.eval_shape(lambda x: enc.init(jax.random.key(0), x,
                                              method=StyleEncoder.init_all), x)
        out = jax.eval_shape(lambda v, x: enc.apply(v, x, 2, None), v, x)
        assert out.shape == (2, 1, 16)

    def test_with_fc_head_variant(self):
        from soft_intro_vae_tpu.models.style import StyleEncoder

        enc = StyleEncoder(startf=8, maxf=32, layer_count=3, latent_size=16,
                           with_fc_head=True)
        x = jax.ShapeDtypeStruct((2, 16, 16, 3), jnp.float32)
        v = jax.eval_shape(lambda x: enc.init(jax.random.key(0), x,
                                              method=StyleEncoder.init_all), x)
        styles, fc = jax.eval_shape(lambda v, x: enc.apply(v, x, 2, None), v, x)
        assert styles.shape == (2, 1, 16)
        assert fc.shape == (2, 1)


class TestSVHN:
    def test_load_svhn_mat(self, tmp_path):
        from scipy.io import savemat

        from soft_intro_vae_tpu.data.images import load_svhn

        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, (32, 32, 3, 10), dtype=np.uint8)
        savemat(tmp_path / "train_32x32.mat", {"X": x, "y": np.ones((10, 1))})
        arr = load_svhn(str(tmp_path))
        assert arr.shape == (10, 32, 32, 3)
        np.testing.assert_allclose(arr[3], x[..., 3] / 255.0)

    def test_make_dataset_svhn_real_files(self, tmp_path):
        from scipy.io import savemat

        from soft_intro_vae_tpu.data.images import ArrayDataset, SyntheticImages, make_dataset

        rng = np.random.default_rng(1)
        x = rng.integers(0, 256, (32, 32, 3, 8), dtype=np.uint8)
        (tmp_path / "svhn").mkdir()
        savemat(tmp_path / "svhn" / "train_32x32.mat", {"X": x})
        spec, ds = make_dataset("svhn", str(tmp_path))
        assert isinstance(ds, ArrayDataset) and not isinstance(ds, SyntheticImages)
        assert len(ds) == 8 and ds.images.shape[1:] == (32, 32, 3)


class TestLoudFallback:
    def test_missing_data_warns(self, tmp_path):
        import pytest as _pytest

        from soft_intro_vae_tpu.data.images import SyntheticImages, make_dataset

        with _pytest.warns(UserWarning, match="SUBSTITUTING"):
            spec, ds = make_dataset("svhn", str(tmp_path / "nope"))
        assert isinstance(ds, SyntheticImages)

    def test_no_fallback_raises(self, tmp_path):
        import pytest as _pytest

        from soft_intro_vae_tpu.data.images import make_dataset

        with _pytest.raises(FileNotFoundError):
            make_dataset("cifar10", str(tmp_path / "nope"), synthetic_fallback=False)


class TestMonstersAugments:
    def test_translate_white_fill(self):
        from soft_intro_vae_tpu.data.images import augment_translate

        rng = np.random.default_rng(3)
        x = np.zeros((8, 16, 16, 3), np.float32)  # black images
        y = augment_translate(x, rng, max_shift=5, fill=1.0)
        assert y.shape == x.shape
        # vacated border pixels are white for at least one shifted image
        assert y.max() == 1.0

    def test_monsters_augment_pipeline(self):
        from soft_intro_vae_tpu.data.images import monsters_augment

        rng = np.random.default_rng(4)
        x = rng.random((4, 32, 32, 3)).astype(np.float32)
        y = monsters_augment(x, rng)
        assert y.shape == x.shape
        assert y.min() >= 0 and y.max() <= 1
        assert not np.allclose(x, y)

    def test_make_dataset_monsters_wires_augment(self, tmp_path):
        from PIL import Image

        from soft_intro_vae_tpu.data.images import make_dataset, monsters_augment

        d = tmp_path / "monsters128"
        d.mkdir()
        rng = np.random.default_rng(5)
        for i in range(3):
            img = Image.fromarray(rng.integers(0, 256, (128, 128, 3), dtype=np.uint8))
            img.save(d / f"{i}.png")
        spec, ds = make_dataset("monsters128", str(tmp_path))
        assert ds.augment_fn is monsters_augment
        batch = next(ds.epoch(2))
        assert batch.shape == (2, 128, 128, 3)


class TestSplitAndStreamingPrep:
    def test_split_tfrecords(self, tmp_path):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import split_tfrecords
        from soft_intro_vae_tpu.data.tfrecords import (
            TFRecordFile, make_example, write_tfrecord)

        # one source file per level with 10 records each
        for level in (2, 3):
            exs = [make_example({"shape": [3, 2, 2], "data": bytes([level * 10 + i] * 12)})
                   for i in range(10)]
            write_tfrecord(str(tmp_path / f"src-r{level:02d}.tfrecords"), exs)
        src = str(tmp_path / "src-r%02d.tfrecords")
        out = str(tmp_path / "split" / "out-r%02d.tfrecords.%03d")
        out_test = str(tmp_path / "split" / "test-r%02d.tfrecords.%03d")
        n = split_tfrecords(src, out, part_count=2, train_size=8,
                            min_level=2, max_level=3, out_test_pattern=out_test)
        assert n == 20
        for level in (2, 3):
            for part in range(2):
                recs = list(TFRecordFile(out % (level, part)).records())
                assert len(recs) == 4  # 8 train records over 2 parts
            test_recs = list(TFRecordFile(out_test % (level, 0)).records())
            assert len(test_recs) == 2  # the remainder

    def test_streaming_prep_matches_batch_prep(self, tmp_path):
        from PIL import Image

        from soft_intro_vae_tpu.cli.prepare_tfrecords import (
            write_multires_shards, write_multires_shards_streaming)
        from soft_intro_vae_tpu.data.tfrecords import load_uint8_images

        rng = np.random.default_rng(9)
        imgs = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        files = []
        for i, im in enumerate(imgs):
            p = img_dir / f"{i:03d}.png"
            Image.fromarray(im).save(p)
            files.append(str(p))

        write_multires_shards(imgs, str(tmp_path / "batch"), "d", 4, parts=2)
        write_multires_shards_streaming(files, str(tmp_path / "stream"), "d", 4, parts=2)

        for level in (2, 3, 4):
            for part in range(2):
                a = load_uint8_images([str(tmp_path / "batch" / f"d-r{level:02d}.tfrecords.{part:03d}")])
                b = load_uint8_images([str(tmp_path / "stream" / f"d-r{level:02d}.tfrecords.{part:03d}")])
                # same multiset of images (batch splits round-robin too)
                ka = sorted(tuple(x.ravel()) for x in a)
                kb = sorted(tuple(x.ravel()) for x in b)
                assert ka == kb, (level, part)


@pytest.mark.slow  # StyleModel init_params compiles per variant
class TestStyleEncoderVariantPlumbing:
    def test_encoder_variants_through_model_encode(self):
        import jax
        import jax.numpy as jnp

        from soft_intro_vae_tpu.train.style_step import StyleModel, StyleModelConfig

        for variant in ("EncoderDefault", "EncoderWithStatistics", "EncoderWithFC"):
            mc = StyleModelConfig(startf=8, maxf=16, layer_count=2, latent_size=8,
                                  mapping_layers=2, encoder_variant=variant)
            model = StyleModel(mc)
            # plumbing/shape check: tracing via eval_shape exercises every
            # Python branch of the variant wiring without 3 XLA compiles
            pe, pd, buf = jax.eval_shape(model.init_params, jax.random.key(0))
            x = jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32)
            eps = jax.ShapeDtypeStruct((2, 8), jnp.float32)
            # lod/blend stay static (they select blocks in Python)
            z, mu, logvar = jax.eval_shape(
                lambda pe, x, eps: model.encode(pe, x, 1, None, eps), pe, x, eps)
            assert z.shape == (2, 8) and mu.shape == (2, 8)

    def test_unknown_variant_raises(self):
        import pytest as _pytest

        from soft_intro_vae_tpu.train.style_step import StyleModel, StyleModelConfig

        with _pytest.raises(ValueError, match="MODEL.ENCODER"):
            StyleModel(StyleModelConfig(encoder_variant="EncoderBogus"))

    def test_yaml_encoder_key(self, tmp_path):
        from soft_intro_vae_tpu.train.style import StyleConfig

        p = tmp_path / "c.yaml"
        p.write_text("MODEL:\n  ENCODER: EncoderWithStatistics\n")
        cfg = StyleConfig.from_yaml(str(p))
        assert cfg.encoder == "EncoderWithStatistics"


class TestSeparableConvs:
    def test_separable_conv_matches_torch(self):
        import jax
        import jax.numpy as jnp
        import torch
        import torch.nn.functional as TF

        from soft_intro_vae_tpu.models.lreq import LreqSeparableConv2d

        rng = np.random.default_rng(40)
        x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        layer = LreqSeparableConv2d(6, kernel_size=3, stride=1, padding=1)
        params = layer.init(jax.random.key(0), jnp.asarray(x))["params"]
        y = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

        # torch oracle: depthwise (gain 1, std 1/k) then 1x1 (std sqrt2/sqrt(in))
        wd = np.asarray(params["depthwise_kernel"])  # (3,3,1,4)
        wp = np.asarray(params["pointwise"]["kernel"])  # (1,1,4,6)
        bp = np.asarray(params["pointwise"]["bias"])
        tx = torch.tensor(x.transpose(0, 3, 1, 2))
        twd = torch.tensor(wd.transpose(3, 2, 0, 1)) * (1.0 / 3.0)  # (4,1,3,3)
        ty = TF.conv2d(tx, twd, None, stride=1, padding=1, groups=4)
        twp = torch.tensor(wp.transpose(3, 2, 0, 1)) * (np.sqrt(2.0) / np.sqrt(4))
        ty = TF.conv2d(ty, twp, torch.tensor(bp))
        np.testing.assert_allclose(y, ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    def test_separable_transpose_upscales(self):
        import jax
        import jax.numpy as jnp

        from soft_intro_vae_tpu.models.lreq import LreqSeparableConvTranspose2d

        x = jnp.ones((1, 4, 4, 3))
        layer = LreqSeparableConvTranspose2d(5, kernel_size=3, stride=2, padding=1)
        params = layer.init(jax.random.key(1), x)["params"]
        y = layer.apply({"params": params}, x)
        assert y.shape == (1, 7, 7, 5)  # (in-1)*2 - 2 + 3
