"""Evaluation metrics: FID (patched Inception), voxel JSD, 2D grid metrics."""

from soft_intro_vae_tpu.metrics.jsd import jsd_between_point_cloud_sets
from soft_intro_vae_tpu.metrics.toy import grid_normalized_elbo, sample_kl_2d, setup_grid, vae_density

__all__ = [
    "jsd_between_point_cloud_sets",
    "grid_normalized_elbo",
    "sample_kl_2d",
    "setup_grid",
    "vae_density",
]
