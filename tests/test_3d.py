"""Tests for the 3D stack: JSD metric, synthetic clouds, short training run."""

import numpy as np
import pytest

from soft_intro_vae_tpu.data.shapenet import SyntheticClouds, rotate_z
from soft_intro_vae_tpu.metrics.jsd import (
    entropy_of_occupancy_grid,
    js_divergence,
    jsd_between_point_cloud_sets,
    unit_cube_grid,
)


class TestJSD:
    def test_grid_shape_and_clipping(self):
        full, _ = unit_cube_grid(8, clip_sphere=False)
        clipped, _ = unit_cube_grid(8, clip_sphere=True)
        assert full.shape == (512, 3)
        assert clipped.shape[0] < 512
        assert (np.linalg.norm(clipped, axis=1) <= 0.5 + 1e-6).all()

    def test_jsd_zero_for_identical_sets(self):
        pts = SyntheticClouds(8, 128, seed=0).points
        assert jsd_between_point_cloud_sets(pts, pts, voxels=14) == pytest.approx(0.0, abs=1e-9)

    def test_jsd_positive_and_bounded_for_different_sets(self):
        a = SyntheticClouds(8, 128, seed=0).points
        b = SyntheticClouds(8, 128, seed=99).points * 0.5
        v = jsd_between_point_cloud_sets(a, b, voxels=14)
        assert 0.0 < v <= 1.0  # base-2 JSD is bounded by 1

    def test_js_divergence_symmetric(self):
        p = np.random.RandomState(0).rand(100)
        q = np.random.RandomState(1).rand(100)
        assert js_divergence(p, q) == pytest.approx(js_divergence(q, p), abs=1e-12)

    def test_occupancy_counts_total(self):
        pts = SyntheticClouds(4, 64, seed=2).points
        _, counts = entropy_of_occupancy_grid(pts, 14, True)
        assert counts.sum() == 4 * 64  # every point lands in exactly one cell

    def test_matches_reference_semantics_on_toy_grid(self):
        # two single-cloud sets concentrated in opposite octants -> JSD near 1
        a = np.full((1, 64, 3), 0.4, np.float32) * np.array([1, 1, 1], np.float32)
        b = -a
        v = jsd_between_point_cloud_sets(a, b, voxels=10)
        assert v == pytest.approx(1.0, abs=1e-6)


class TestData3D:
    def test_synthetic_in_sphere(self):
        pts = SyntheticClouds(4, 256, seed=1).points
        assert pts.shape == (4, 256, 3)
        assert (np.linalg.norm(pts, axis=-1) <= 0.5 + 1e-5).all()

    def test_rotate_z_preserves_norms_and_z(self):
        pts = SyntheticClouds(2, 64, seed=3).points
        out = rotate_z(pts, np.array([90.0, 45.0]))
        np.testing.assert_allclose(out[..., 2], pts[..., 2], atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(out[..., :2], axis=-1), np.linalg.norm(pts[..., :2], axis=-1), atol=1e-5
        )


@pytest.mark.slow  # short 3D training run
class TestTrain3D:
    def test_short_training_runs_and_improves(self):
        from soft_intro_vae_tpu.train.threed import ThreeDConfig, train_soft_intro_vae_3d

        cfg = ThreeDConfig(
            n_points=128, batch_size=16, max_epochs=2, num_vae=1, z_size=16,
            beta_rec=20.0, beta_kl=1.0, beta_neg=32.0, seed=0, valid_frequency=2,
            save_frequency=2, use_synthetic=True, synthetic_n=32, verbose=False,
            results_dir="/tmp/test_3d_results", resume=False,
        )
        state, summary = train_soft_intro_vae_3d(cfg)
        assert summary["epochs_run"] == 2
        assert summary["best_jsd"] is not None and np.isfinite(summary["best_jsd"])

    def test_config_from_json_roundtrip(self, tmp_path):
        from soft_intro_vae_tpu.train.threed import ThreeDConfig

        ref = {
            "data_dir": "/x", "classes": ["chair"], "n_points": 2048, "batch_size": 32,
            "max_epochs": 10, "beta_rec": 20.0, "beta_kl": 1.0, "beta_neg": 256,
            "z_size": 128, "gamma_r": 1e-8, "num_vae": 0, "prior_std": 0.2,
            "seed": -1, "save_frequency": 50, "valid_frequency": 2,
            "reconstruction_loss": "chamfer", "transforms": ["rotate"],
            "results_root": "/tmp/r", "arch": "vae", "experiment_name": "e",
            "optimizer": {"E": {"hyperparams": {"lr": 5e-4}}, "D": {"hyperparams": {"lr": 5e-4}}},
        }
        p = tmp_path / "cfg.json"
        p.write_text(__import__("json").dumps(ref))
        cfg = ThreeDConfig.from_json(str(p))
        assert cfg.classes == ("chair",)
        assert cfg.prior_std == 0.2
        assert cfg.apply_random_rotation
        assert cfg.lr_e == 5e-4
