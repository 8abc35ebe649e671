"""Equalized-learning-rate (lreq) layers, explicit-scaling formulation.

Capability parity with /root/reference/style_soft_intro_vae/lreq.py. The
reference defaults to *implicit* mode: weights stored at He-scale and a
``lr_equalization_coef`` tag consumed by LREQAdam (lreq.py:70-75,
custom_adam.py:91-92). Here we use the *explicit* mode the same file also
implements (lreq.py:86,165): raw weights ~ N(0, 1/lrmul), forward multiplies
by std = gain/sqrt(fan_in) * lrmul and biases by lrmul.

Equivalence: with beta1=0 Adam the normalized update direction is invariant
to a constant gradient scale, so stepping the raw weight by lr and scaling at
forward time produces exactly the implicit mode's effective-weight step
lr * coef — no per-parameter optimizer state tags needed, which is the
natural fit for optax (one transform for the whole pytree).

Layout: NHWC / HWIO (TPU-native).
"""

from __future__ import annotations

import math
from typing import Any
import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _normal_init(stddev: float):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


class LreqDense(nn.Module):
    """lreq.Linear (lreq.py:52-88): y = x @ (W * std) + b * lrmul."""

    features: int
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    dtype: Any = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        std = self.gain / math.sqrt(in_features) * self.lrmul
        w = self.param("kernel", _normal_init(1.0 / self.lrmul), (in_features, self.features))
        y = x.astype(self.dtype) @ (w * std).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b * self.lrmul).astype(self.dtype)
        return y


class LreqConv2d(nn.Module):
    """lreq.Conv2d (lreq.py:91-169). ``transform_kernel`` applies the 2x2
    box filter to the kernel (fused downscale, lreq.py:158-160)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    transform_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = self.kernel_size * self.kernel_size * in_ch
        std = self.gain / math.sqrt(fan_in) * self.lrmul
        w = self.param(
            "kernel", _normal_init(1.0 / self.lrmul),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        if self.transform_kernel:
            w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
            w = 0.25 * (w[1:, 1:] + w[:-1, 1:] + w[1:, :-1] + w[:-1, :-1])
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (w * std).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b * self.lrmul).astype(self.dtype)[None, None, None, :]
        return y


class LreqSeparableConv2d(nn.Module):
    """lreq.SeparableConv2d (lreq.py:191-200): depthwise spatial conv
    (groups=in, gain=1, no bias) followed by a 1x1 pointwise conv.

    Documented deviation: the reference passes ``bias`` into the pointwise
    conv's *stride* slot and 1 into *padding* (lreq.py:197 — a latent bug in
    code no config instantiates); here the pointwise conv is the intended
    stride-1 / padding-0 1x1.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    gain: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        # depthwise: grouped fan_in = k*k (in/groups channels each), gain=1
        std_dw = 1.0 / self.kernel_size
        w_dw = self.param("depthwise_kernel", _normal_init(1.0),
                          (self.kernel_size, self.kernel_size, 1, in_ch))
        y = jax.lax.conv_general_dilated(
            x, w_dw * std_dw,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=in_ch,
        )
        return LreqConv2d(self.features, 1, 1, 0, use_bias=self.use_bias,
                          gain=self.gain, name="pointwise")(y)


class LreqSeparableConvTranspose2d(nn.Module):
    """lreq.SeparableConvTranspose2d (lreq.py:203-207): depthwise transposed
    spatial conv + 1x1 pointwise (same bug-fix deviation as above)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    gain: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        std_dw = 1.0 / self.kernel_size
        w_dw = self.param("depthwise_kernel", _normal_init(1.0),
                          (self.kernel_size, self.kernel_size, 1, in_ch))
        k = self.kernel_size
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w_dw * std_dw, (0, 1)),
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=in_ch,
        )
        return LreqConv2d(self.features, 1, 1, 0, use_bias=self.use_bias,
                          gain=self.gain, name="pointwise")(y)


class LreqConvTranspose2d(nn.Module):
    """lreq.ConvTranspose2d: stride-2 fused upscale; transform_kernel sums
    the four shifted copies (lreq.py:142-147, no 0.25 factor on transpose)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    transform_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        # torch transpose-conv fan_in uses kernel^2 * in_channels (lreq.py:113)
        fan_in = self.kernel_size * self.kernel_size * in_ch
        std = self.gain / math.sqrt(fan_in) * self.lrmul
        w = self.param(
            "kernel", _normal_init(1.0 / self.lrmul),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
        )
        if self.transform_kernel:
            w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
            w = w[1:, 1:] + w[:-1, 1:] + w[1:, :-1] + w[:-1, :-1]
        k = w.shape[0]  # post-transform size (transform_kernel: 3 -> 4)
        # torch F.conv_transpose2d(stride=s, padding=p): out = (in-1)s - 2p + k.
        # Equivalent lax form: dilate input by s, pad (k-1-p) both sides, flip
        # the kernel spatially: out = (in-1)s + 1 + 2(k-1-p) - (k-1)  — equal.
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip((w * std).astype(self.dtype), (0, 1)),
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b * self.lrmul).astype(self.dtype)[None, None, None, :]
        return y
