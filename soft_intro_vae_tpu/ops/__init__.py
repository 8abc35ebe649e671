"""TPU compute primitives: fused loss math, chamfer, upsampling, pallas kernels."""

from soft_intro_vae_tpu.ops.losses import (
    exp_elbo,
    kl_divergence,
    per_sample_recon,
    reconstruction_loss,
    reparameterize,
)
from soft_intro_vae_tpu.ops.chamfer import chamfer_distance, chamfer_distance_tiled
from soft_intro_vae_tpu.ops.chamfer_pallas import chamfer_distance_pallas

__all__ = [
    "chamfer_distance_pallas",
    "exp_elbo",
    "kl_divergence",
    "per_sample_recon",
    "reconstruction_loss",
    "reparameterize",
    "chamfer_distance",
    "chamfer_distance_tiled",
]
