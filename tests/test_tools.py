"""Tests for offline tools: plotting, style figures, 3D eval scripts, CLI."""

import os

import numpy as np
import pytest

from soft_intro_vae_tpu.utils.plotting import make_grid, save_image_grid, save_scatter_2d


class TestPlotting:
    def test_make_grid_tiles(self):
        imgs = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3) / 48
        grid = make_grid(imgs, nrow=2, pad=1)
        assert grid.shape == (2 * 3 + 1, 2 * 3 + 1, 3)

    def test_save_image_grid(self, tmp_path):
        imgs = np.random.RandomState(0).rand(8, 8, 8, 3).astype(np.float32)
        p = save_image_grid(imgs, str(tmp_path / "g.png"), nrow=4)
        assert p is None or os.path.exists(p)

    def test_save_scatter(self, tmp_path):
        pts = np.random.RandomState(1).randn(100, 2).astype(np.float32)
        p = save_scatter_2d(pts, str(tmp_path / "s.png"))
        assert p is None or os.path.exists(p)


@pytest.fixture(scope="module")
def style_ckpt(tmp_path_factory):
    """Train a tiny style model for 1 epoch and save a checkpoint."""
    from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae

    out = str(tmp_path_factory.mktemp("style_tools"))
    cfg = StyleConfig(
        layer_count=3, start_channel_count=8, max_channel_count=32,
        latent_space_size=16, mapping_layers=2, epochs_per_lod=0,  # fixed max lod
        train_epochs=1, num_vae=0, beta_neg=(16, 16, 16), scale=1.0 / (3 * 16**2),
        use_synthetic=True, synthetic_n=32, max_resolution_level=4,
        output_dir=out, lod_2_batch_tables={"1GPU": [8, 8, 8]}, verbose=False, seed=0,
    )
    train_style_soft_intro_vae(cfg)
    from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(os.path.join(out, "training_artifacts"), prefix="_")
    path = ckpt.latest_path()
    assert path
    return cfg, path


@pytest.mark.slow  # style model compiles
class TestStyleFigures:
    def test_generate_samples(self, style_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.figures import generate_samples

        cfg, ckpt = style_ckpt
        out = generate_samples(cfg, ckpt, str(tmp_path / "samples.png"), count=8, seed=1)
        assert out is None or os.path.exists(out)

    def test_interpolation(self, style_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.figures import interpolation_figure

        cfg, ckpt = style_ckpt
        out = interpolation_figure(cfg, ckpt, str(tmp_path / "interp.png"), steps=4)
        assert out is None or os.path.exists(out)

    def test_style_mixing(self, style_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.figures import style_mixing_figure

        cfg, ckpt = style_ckpt
        out = style_mixing_figure(cfg, ckpt, str(tmp_path / "mix.png"), n_src=2, n_dst=2)
        assert out is None or os.path.exists(out)

    def test_reconstruction_figure(self, style_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.figures import reconstruction_figure
        from soft_intro_vae_tpu.train.style import MultiResImages

        cfg, ckpt = style_ckpt
        ds = MultiResImages.synthetic(16, 16, 3, seed=3)
        out = reconstruction_figure(cfg, ckpt, ds, str(tmp_path / "rec.png"), count=4)
        assert out is None or os.path.exists(out)

    @pytest.fixture
    def samples_dir(self, tmp_path):
        """PNG folder at 2x the model resolution (exercises the avg-pool)."""
        from PIL import Image

        d = tmp_path / "samples"
        d.mkdir()
        rng = np.random.RandomState(7)
        for i in range(21):
            arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
        return str(d)

    def test_multires_reconstruction(self, style_ckpt, samples_dir, tmp_path):
        from soft_intro_vae_tpu.cli.figures import multires_reconstruction_figure

        cfg, ckpt = style_ckpt
        out = multires_reconstruction_figure(
            cfg, ckpt, samples_dir, str(tmp_path / "multires.png"))
        assert os.path.exists(out)
        # 4 column groups: full-res pair (2*16) + layout padding, concatenated
        import matplotlib.image as mpimg

        img = mpimg.imread(out)
        assert img.shape[1] == 4 * (2 * 16 + 4 + 10)

    def test_paged_reconstruction(self, style_ckpt, samples_dir, tmp_path):
        from soft_intro_vae_tpu.cli.figures import paged_reconstruction_figure

        cfg, ckpt = style_ckpt
        paths = paged_reconstruction_figure(
            cfg, ckpt, samples_dir, str(tmp_path / "pages"), per_page=12)
        # 21 images -> 2 pages (reference pages by 24 over the full folder)
        assert len(paths) == 2
        assert all(p is None or os.path.exists(p) for p in paths)

    def test_interpolation_2_images(self, style_ckpt, samples_dir, tmp_path):
        from soft_intro_vae_tpu.cli.figures import interpolation_2_images_figure

        cfg, ckpt = style_ckpt
        out = interpolation_2_images_figure(
            cfg, ckpt, samples_dir, "img_000.png", "img_001.png",
            str(tmp_path / "interp2.png"), steps=4)
        assert out is None or os.path.exists(out)


@pytest.fixture(scope="module")
def threed_ckpt(tmp_path_factory):
    from soft_intro_vae_tpu.train.threed import ThreeDConfig, train_soft_intro_vae_3d

    out = str(tmp_path_factory.mktemp("threed_tools"))
    cfg = ThreeDConfig(
        n_points=64, batch_size=8, max_epochs=2, num_vae=0, z_size=8,
        beta_neg=16.0, seed=0, valid_frequency=1, save_frequency=1,
        use_synthetic=True, synthetic_n=16, verbose=False,
        results_dir=out, resume=False,
    )
    train_soft_intro_vae_3d(cfg)
    from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

    path = Checkpointer(os.path.join(out, "weights")).latest_path()
    assert path
    return cfg, path


@pytest.mark.slow  # 3D model compiles
class TestEval3D:
    def test_test_jsd(self, threed_ckpt):
        from soft_intro_vae_tpu.cli.eval_3d import test_jsd

        cfg, ckpt = threed_ckpt
        v = test_jsd(cfg, ckpt)
        assert 0.0 <= v <= 1.0

    def test_find_best_epoch(self, threed_ckpt):
        from soft_intro_vae_tpu.cli.eval_3d import find_best_epoch

        cfg, ckpt = threed_ckpt
        path, jsd = find_best_epoch(cfg)
        assert os.path.exists(path) and np.isfinite(jsd)

    def test_dump_metrics_data(self, threed_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.eval_3d import generate_data_for_metrics

        cfg, ckpt = threed_ckpt
        paths = generate_data_for_metrics(cfg, ckpt, str(tmp_path / "m"))
        assert len(paths) == 3
        x = np.load(paths[0])
        assert x.shape[-1] == 3

    def test_render_data(self, threed_ckpt, tmp_path):
        from soft_intro_vae_tpu.cli.eval_3d import generate_for_rendering

        cfg, ckpt = threed_ckpt
        paths = generate_for_rendering(cfg, ckpt, str(tmp_path / "r"), num_samples=3, num_interp=3)
        assert all(os.path.exists(p) for p in paths)
        assert np.load(paths[1]).shape == (3, 64, 3)


class TestCLI:
    def test_parser_accepts_reference_flags(self):
        from soft_intro_vae_tpu.cli.main import build_parser

        p = build_parser()
        a = p.parse_args(["image", "-d", "cifar10", "-n", "250", "-z", "128", "-l", "2e-4",
                          "-b", "32", "-v", "0", "-r", "1.0", "-k", "1.0", "-e", "256",
                          "-g", "1e-8", "-s", "92", "-f"])
        assert a.dataset == "cifar10" and a.beta_neg == 256 and a.fid

    def test_bootstrap_has_freq_flag(self):
        from soft_intro_vae_tpu.cli.main import build_parser

        a = build_parser().parse_args(["bootstrap", "-d", "cifar10", "-o", "2"])
        assert a.freq == 2 and a.gamma_r == 1.0  # bootstrap default gamma_r

    def test_toy_flags(self):
        from soft_intro_vae_tpu.cli.main import build_parser

        a = build_parser().parse_args(["toy", "-d", "8Gaussians", "-n", "30000"])
        assert a.num_vae == 2000  # reference 2D default


class TestMitsubaXML:
    def test_scene_generation(self, tmp_path):
        from soft_intro_vae_tpu.utils.mitsuba import pointcloud_to_xml, standardize_bbox

        rng = np.random.default_rng(0)
        pcl = rng.normal(size=(256, 3)).astype(np.float32)
        std = standardize_bbox(pcl, 128)
        assert std.shape == (128, 3)
        assert std.min() >= -0.5 - 1e-6 and std.max() <= 0.5 + 1e-6
        xml = pointcloud_to_xml(pcl, points_per_object=64)
        assert xml.count('<shape type="sphere">') == 64
        assert xml.startswith("<scene") and xml.rstrip().endswith("</scene>")
        # camera/material parameters match the reference scene
        assert 'lookat origin="6,6,3"' in xml and 'value="0.05"' in xml

    def test_render_pointclouds_npy(self, tmp_path):
        from soft_intro_vae_tpu.utils.mitsuba import render_pointclouds

        clouds = np.random.default_rng(1).normal(size=(2, 128, 3)).astype(np.float32)
        p = tmp_path / "samples.npy"
        np.save(p, clouds)
        out = render_pointclouds(str(p), str(tmp_path), points_per_object=64)
        assert len(out) == 2
        for f in out:
            assert os.path.exists(f)
            assert "<scene" in open(f).read()

    def test_cli_render_xml(self, tmp_path):
        from soft_intro_vae_tpu.cli.eval_3d import main as eval3d_main

        clouds = np.random.default_rng(2).normal(size=(64, 3)).astype(np.float32)
        p = tmp_path / "one.npy"
        np.save(p, clouds)
        eval3d_main(["render-xml", "-i", str(p), "--points", "32"])
        assert os.path.exists(tmp_path / "one_00.xml")
