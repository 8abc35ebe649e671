"""PointNet-style Soft-IntroVAE for 3D point clouds.

Capability parity with /root/reference/soft_intro_vae_3d/models/vae.py:21-229.
Canonical layout here is (B, N, 3) — channels-last, so the per-point 1x1
convs become plain Dense layers batched over points, which XLA maps onto the
MXU as one big (B*N, C) matmul. (The reference uses (B, 3, N) Conv1d.)

Faithful quirk: the reference encoder applies ReLU *before* BatchNorm
(vae.py:104-129 ordering conv -> ReLU -> BN); reproduced here.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.models.initializers import torch_kaiming_uniform, torch_bias_uniform

Array = jax.Array


def _dense(features: int, fan_in: int, use_bias: bool = True, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(fan_in),
        name=name,
    )


class PointNetEncoder(nn.Module):
    """(B, N, 3) -> (mu, logvar); per-point MLP 3->64->128->256->256->512
    (+BN), global max-pool over points, FC 512->256, two z heads."""

    z_dim: int = 128
    conv_channels: Sequence[int] = (64, 128, 256, 256, 512)
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Tuple[Array, Array]:
        h = x
        in_ch = x.shape[-1]
        for i, ch in enumerate(self.conv_channels):
            is_last = i == len(self.conv_channels) - 1
            h = _dense(ch, in_ch, use_bias=not self.use_batchnorm, name=f"conv_{i}")(h)
            if self.use_batchnorm:
                # reference order: conv -> ReLU -> BN, and the final conv is
                # followed by ReLU+BN too (vae.py:124-129)
                h = nn.relu(h)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn_{i}"
                )(h)
            elif not is_last:
                h = nn.relu(h)
            in_ch = ch
        g = jnp.max(h, axis=1)  # global max-pool over points
        g = nn.relu(_dense(256, self.conv_channels[-1], name="fc")(g))
        mu = _dense(self.z_dim, 256, name="mu_layer")(g)
        logvar = _dense(self.z_dim, 256, name="std_layer")(g)
        return mu, logvar


class PointNetDecoder(nn.Module):
    """z -> (B, N, 3); MLP z->64->128->512->1024->(N*3) (vae.py:28-47)."""

    z_dim: int = 128
    n_points: int = 2048
    hidden: Sequence[int] = (64, 128, 512, 1024)
    use_bias: bool = True

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = z.reshape(z.shape[0], -1)
        in_ch = self.z_dim
        for i, ch in enumerate(self.hidden):
            h = nn.relu(_dense(ch, in_ch, use_bias=self.use_bias, name=f"fc_{i}")(h))
            in_ch = ch
        out = _dense(self.n_points * 3, in_ch, use_bias=self.use_bias, name="out")(h)
        return out.reshape(-1, self.n_points, 3)


class SoftIntroVAE3D(nn.Module):
    """Composed 3D model (vae.py:148-181): forward -> (rec, mu, logvar)."""

    z_dim: int = 128
    n_points: int = 2048
    use_batchnorm: bool = True

    def setup(self):
        self.encoder = PointNetEncoder(z_dim=self.z_dim, use_batchnorm=self.use_batchnorm)
        self.decoder = PointNetDecoder(z_dim=self.z_dim, n_points=self.n_points)

    def __call__(self, x, deterministic=False, rng=None, train: bool = True):
        mu, logvar = self.encoder(x, train=train)
        if deterministic:
            z = mu
        else:
            assert rng is not None
            eps = jax.random.normal(rng, mu.shape, dtype=jnp.float32)
            z = mu + eps * jnp.exp(0.5 * logvar)
        y = self.decoder(z)
        return y, mu, logvar

    def encode(self, x, train: bool = True):
        return self.encoder(x, train=train)

    def decode(self, z):
        return self.decoder(z)
