"""DCGAN encoder/generator pair.

Capability parity with the reference's registered-but-unused DCGAN nets
(/root/reference/style_soft_intro_vae/net.py:613-671): 64x64, z=24,
ConvTranspose generator with BN+ReLU+tanh, strided-conv encoder with
BN+LeakyReLU. NHWC layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.models.initializers import torch_kaiming_uniform, torch_bias_uniform

Array = jax.Array
NZ = 24


def _convT(features, k, s, p, in_ch, name=None):
    return nn.ConvTranspose(
        features, (k, k), strides=(s, s), padding=[(k - 1 - p, k - 1 - p)] * 2,
        transpose_kernel=True,
        kernel_init=torch_kaiming_uniform, bias_init=torch_bias_uniform(k * k * in_ch),
        name=name,
    )


def _conv(features, k, s, p, in_ch, name=None):
    return nn.Conv(features, (k, k), strides=(s, s), padding=p,
                   kernel_init=torch_kaiming_uniform, bias_init=torch_bias_uniform(k * k * in_ch),
                   name=name)


class DCGANGenerator(nn.Module):
    """z (B, 24) -> (B, 32, 32, 3) via stride-2 transpose convs (net.py:613-641)."""

    nz: int = NZ
    nc: int = 3

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        x = z.reshape(z.shape[0], 1, 1, self.nz)
        x = _convT(512, 4, 1, 0, self.nz, "deconv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn0")(x)
        x = nn.relu(x)
        x = _convT(256, 4, 2, 1, 512, "deconv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.relu(x)
        x = _convT(128, 4, 2, 1, 256, "deconv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.relu(x)
        x = _convT(self.nc, 4, 2, 1, 128, "deconv3")(x)
        return jnp.tanh(x)


class DCGANEncoder(nn.Module):
    """(B, 32, 32, 3) -> (B, 24) via stride-2 convs (net.py:644-671)."""

    nz: int = NZ
    nc: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = _conv(64, 4, 2, 1, self.nc, "conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _conv(128, 4, 2, 1, 64, "conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _conv(256, 4, 2, 1, 128, "conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _conv(self.nz, 4, 1, 0, 256, "conv3")(x)
        return nn.leaky_relu(x, 0.01).reshape(x.shape[0], -1)
