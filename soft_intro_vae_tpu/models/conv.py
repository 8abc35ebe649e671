"""Convolutional ResNet Soft-IntroVAE for images — the flagship image models.

Capability parity with the reference image nets
(/root/reference/soft_intro_vae/train_soft_intro_vae.py:38-223):
ResidualBlock (conv3x3-BN-LReLU(0.2)-conv3x3-BN, 1x1 skip when channels
change, LReLU after add), strided-by-pooling encoder, nearest-upsample
decoder, optional conditional concat.

TPU-first differences from the reference:
  * NHWC layout throughout (native for TPU convs).
  * conv output spatial size computed analytically —
    image_size // 2**len(channels) — instead of a dummy forward probe
    (reference :111-114).
  * optional bf16 compute dtype (params stay f32); BN statistics in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.models.initializers import torch_kaiming_uniform, torch_bias_uniform

Array = jax.Array
Dtype = Any


def _conv(out_ch, kernel, in_ch, *, use_bias=False, dtype=jnp.float32, name=None):
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(1, 1),
        padding=kernel // 2,
        use_bias=use_bias,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(kernel * kernel * in_ch),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _bn(train: bool, dtype, name=None):
    # torch BatchNorm2d defaults: momentum 0.1 (=> flax retention 0.9), eps 1e-5
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def avg_pool_2x(x: Array) -> Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample (reference decoder's nn.Upsample)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class ResidualBlock(nn.Module):
    """Reference ResidualBlock (:38-75): BN on branch output pre-add,
    1x1 conv_expand skip iff inc != outc, LeakyReLU(0.2) activations."""

    inc: int
    outc: int
    scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        midc = int(self.outc * self.scale)
        if self.inc != self.outc:
            identity = _conv(self.outc, 1, self.inc, dtype=self.dtype, name="conv_expand")(x)
        else:
            identity = x
        y = _conv(midc, 3, self.inc, dtype=self.dtype, name="conv1")(x)
        y = _bn(train, self.dtype, name="bn1")(y)
        y = nn.leaky_relu(y, 0.2)
        y = _conv(self.outc, 3, midc, dtype=self.dtype, name="conv2")(y)
        y = _bn(train, self.dtype, name="bn2")(y)
        return nn.leaky_relu(y + identity, 0.2)


class ConvEncoder(nn.Module):
    """Image encoder (:78-122): conv5x5 stem + BN + LReLU + AvgPool2, then
    (ResBlock -> AvgPool2) per channel entry, final ResBlock, FC -> 2*zdim."""

    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    conditional: bool = False
    cond_dim: int = 10
    dtype: Dtype = jnp.float32

    @property
    def conv_output_spatial(self) -> int:
        return self.image_size // (2 ** len(self.channels))

    @nn.compact
    def __call__(self, x: Array, o_cond: Optional[Array] = None, train: bool = True) -> Tuple[Array, Array]:
        cc = self.channels[0]
        y = _conv(cc, 5, self.cdim, dtype=self.dtype, name="stem_conv")(x.astype(self.dtype))
        y = _bn(train, self.dtype, name="stem_bn")(y)
        y = nn.leaky_relu(y, 0.2)
        y = avg_pool_2x(y)
        for i, ch in enumerate(self.channels[1:]):
            y = ResidualBlock(cc, ch, dtype=self.dtype, name=f"res_{i}")(y, train)
            y = avg_pool_2x(y)
            cc = ch
        y = ResidualBlock(cc, cc, dtype=self.dtype, name="res_final")(y, train)
        y = y.reshape(y.shape[0], -1).astype(jnp.float32)
        if self.conditional and o_cond is not None:
            y = jnp.concatenate([y, o_cond.astype(jnp.float32)], axis=1)
        s = self.conv_output_spatial
        fan_in = s * s * self.channels[-1] + (self.cond_dim if self.conditional else 0)
        y = nn.Dense(
            2 * self.zdim,
            kernel_init=torch_kaiming_uniform,
            bias_init=torch_bias_uniform(fan_in),
            name="fc",
        )(y)
        mu, logvar = jnp.split(y, 2, axis=-1)
        return mu, logvar


class ConvDecoder(nn.Module):
    """Image decoder (:125-169): FC + ReLU -> reshape to the encoder's conv
    output shape -> mirrored (ResBlock -> nearest-upsample 2x) stack ->
    final ResBlock -> conv5x5 predict head (with bias)."""

    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    conditional: bool = False
    cond_dim: int = 10
    dtype: Dtype = jnp.float32

    @property
    def conv_input_spatial(self) -> int:
        return self.image_size // (2 ** len(self.channels))

    @nn.compact
    def __call__(self, z: Array, y_cond: Optional[Array] = None, train: bool = True) -> Array:
        z = z.reshape(z.shape[0], -1).astype(jnp.float32)
        if self.conditional and y_cond is not None:
            z = jnp.concatenate([z, y_cond.reshape(y_cond.shape[0], -1).astype(jnp.float32)], axis=1)
        cc = self.channels[-1]
        s = self.conv_input_spatial
        num_fc = s * s * cc
        fan_in = self.zdim + (self.cond_dim if self.conditional else 0)
        y = nn.Dense(
            num_fc,
            kernel_init=torch_kaiming_uniform,
            bias_init=torch_bias_uniform(fan_in),
            name="fc",
        )(z)
        y = nn.relu(y)
        y = y.reshape(y.shape[0], s, s, cc).astype(self.dtype)
        for i, ch in enumerate(reversed(self.channels)):
            y = ResidualBlock(cc, ch, dtype=self.dtype, name=f"res_{i}")(y, train)
            y = upsample_nearest_2x(y)
            cc = ch
        y = ResidualBlock(cc, cc, dtype=self.dtype, name="res_final")(y, train)
        y = _conv(self.cdim, 5, cc, use_bias=True, dtype=self.dtype, name="predict")(y)
        return y.astype(jnp.float32)


class SoftIntroVAE(nn.Module):
    """Composed model (:172-223) — convenience wrapper for eval/sampling.

    Training uses the functional encode/decode applies directly (see
    train/step.py); this module exists for the public model API:
    forward(x) -> (mu, logvar, z, rec), sample(z), encode(x), decode(z).
    """

    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    conditional: bool = False
    cond_dim: int = 10
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(
            cdim=self.cdim,
            zdim=self.zdim,
            channels=self.channels,
            image_size=self.image_size,
            conditional=self.conditional,
            cond_dim=self.cond_dim,
            dtype=self.dtype,
        )
        self.encoder = ConvEncoder(**kw)
        self.decoder = ConvDecoder(**kw)

    def __call__(self, x, o_cond=None, deterministic=False, rng=None, train: bool = True):
        mu, logvar = self.encoder(x, o_cond, train=train)
        if deterministic:
            z = mu
        else:
            assert rng is not None, "stochastic forward needs an rng"
            eps = jax.random.normal(rng, mu.shape, dtype=jnp.float32)
            z = mu + eps * jnp.exp(0.5 * logvar)
        y = self.decoder(z, o_cond if self.conditional else None, train=train)
        return mu, logvar, z, y

    def encode(self, x, o_cond=None, train: bool = True):
        return self.encoder(x, o_cond, train=train)

    def decode(self, z, y_cond=None, train: bool = True):
        return self.decoder(z, y_cond, train=train)

    def sample(self, z, y_cond=None, train: bool = False):
        return self.decoder(z, y_cond, train=train)
