"""ALAE/StyleGAN-style networks for Style-SoftIntroVAE.

Capability parity with /root/reference/style_soft_intro_vae/net.py and
model.py: pixel_norm, style_mod (AdaIN), Blur ([1,2,1]^2 depthwise),
EncodeBlock (per-block style statistics -> w), DecodeBlock (noise inject or
deterministic correction, two AdaIN stages), FromRGB/ToRGB, EncoderDefault
(styles-sum), GeneratorDefault (const 4x4 input, progressive decode with
blend), Mapping{ToLatent,FromLatent,ToLatentNoStyle}.

TPU-first structure: ``lod`` and the blend-path switch are STATIC — the
trainer compiles one XLA program per (lod, in_transition) pair, each with
fully static shapes (SURVEY §5 long-context note). ``blend`` is a traced
scalar inside the transition program. Layout NHWC.

All pixel-level tensors are float32; lreq scaling keeps activations O(1).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.models.lreq import LreqConv2d, LreqConvTranspose2d, LreqDense
from soft_intro_vae_tpu.ops.adain_pallas import fused_bias_act_norm

Array = jax.Array


def pixel_norm(x: Array, epsilon: float = 1e-8) -> Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + epsilon)


def style_mod(x: Array, style: Array) -> Array:
    """AdaIN: style (B, 2C) -> x * (s0 + 1) + s1 (net.py:32-34). NHWC.
    Style vectors stay float32; they are cast to x's compute dtype here."""
    s = style.reshape(style.shape[0], 2, x.shape[-1]).astype(x.dtype)
    return x * (s[:, 0][:, None, None, :] + 1.0) + s[:, 1][:, None, None, :]


def upscale2d(x: Array, factor: int = 2) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def downscale2d(x: Array, factor: int = 2) -> Array:
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))


def blur3x3(x: Array) -> Array:
    """Depthwise [1,2,1]x[1,2,1]/16 blur (net.py:49-60).

    Kept as a grouped conv: an A/B on the v5e measured the "obvious"
    VPU alternative (two separable shifted-add passes over padded copies)
    at ~25-35% LOWER step throughput — the pad copies and cross-sublane
    shifts cost more than XLA's native depthwise lowering."""
    f = jnp.array([1.0, 2.0, 1.0], x.dtype)
    k = (f[:, None] * f[None, :]) / jnp.asarray(16.0, x.dtype)
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, feature_group
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def instance_norm(x: Array, eps: float) -> Array:
    # stats in float32 regardless of compute dtype: bf16 variance loses the
    # cancellation, and eps=1e-8 is below bf16 resolution
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=(1, 2), keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def _spatial_stats(x: Array) -> Array:
    """(mean, std) over spatial dims, concatenated channelwise -> (B, 2C).
    Computed (and returned) in float32 — feeds the f32 style heads."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2))
    std = jnp.sqrt(jnp.mean(jnp.square(xf - m[:, None, None, :]), axis=(1, 2)))
    return jnp.concatenate([m, std], axis=-1)


def _moments(x: Array) -> Tuple[Array, Array]:
    """One-pass spatial (mean, variance) per (batch, channel), float32.

    E[x^2] - m^2 instead of the two-pass E[(x-m)^2]: both reductions read x
    once and XLA's multi-output fusion emits them as a single HBM sweep —
    the style step is HBM-bound (BENCH_NOTES roofline), so reduction passes
    over (B,H,W,C) activations are the scarce resource. f32 accumulation
    keeps the cancellation benign for the O(1)-scale lreq activations; the
    max(., 0) guards the subtraction against tiny negative residue."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2))
    sq = jnp.mean(jnp.square(xf), axis=(1, 2))
    return m, jnp.maximum(sq - jnp.square(m), 0.0)


def _channel_affine(x: Array, a: Array, b: Array) -> Array:
    """y = x * a + b with per-(batch, channel) f32 coefficients — the fused
    form of instance_norm(+style_mod): one elementwise pass, one rounding."""
    y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    return y.astype(x.dtype)


def _fused_norm_on(override: Optional[bool]) -> bool:
    """Use the Pallas fused producer+IN(+AdaIN) kernel? Default OFF: the
    measured A/B (BENCH_NOTES.md "Fused IN+AdaIN Pallas kernel") shows XLA's
    own fusion of these chains beats the hand kernel at every real model
    shape — the ffhq256 max-LOD step regresses 66.8 -> 36.9 img/s with it.
    Kept as an opt-in (SIV_FUSED_NORM=1 or fused_norm=True) with parity
    tests so future TPU generations can re-evaluate cheaply."""
    if override is not None:
        return override
    env = os.environ.get("SIV_FUSED_NORM")
    if env is not None:
        return env.lower() not in ("0", "false", "off")
    return False


class EncodeBlock(nn.Module):
    """net.py:63-126."""

    inputs: int
    outputs: int
    latent_size: int
    last: bool = False
    fused_scale: bool = True
    dtype: Any = jnp.float32  # conv-path compute dtype; style heads stay f32
    fused_norm: Optional[bool] = None  # None = off (A/B in BENCH_NOTES; SIV_FUSED_NORM opts in)

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        x = LreqConv2d(self.inputs, 3, 1, 1, use_bias=False, name="conv_1",
                       dtype=self.dtype)(x)
        bias_1 = self.param("bias_1", nn.initializers.zeros, (self.inputs,))
        # one moment sweep feeds BOTH the style-stats head (mean, std —
        # net.py:97-101) and the instance norm (torch IN default eps=1e-5);
        # the Pallas fused chain (ops/adain_pallas.py) is opt-in only — the
        # measured A/B shows XLA's own fusion wins (BENCH_NOTES.md)
        if _fused_norm_on(self.fused_norm):
            x, m1, v1 = fused_bias_act_norm(x, bias_1, mode="plain", eps=1e-5)
        else:
            x = x + bias_1.astype(self.dtype)
            x = nn.leaky_relu(x, 0.2)
            m1, v1 = _moments(x)
            rstd1 = jax.lax.rsqrt(v1 + 1e-5)
            x = _channel_affine(x, rstd1, -m1 * rstd1)
        # +1e-12 inside the sqrt: at v=0 (clamped one-pass variance of a
        # near-constant channel) sqrt's backward is inf and inf*0 from the
        # clamp's zero cotangent poisons the whole update with NaN; the
        # offset (std error <=1e-6) keeps the gradient finite
        style_1 = jnp.concatenate([m1, jnp.sqrt(v1 + 1e-12)], axis=-1)  # (B, 2*inputs) f32
        if self.last:
            # NB the reference does NOT add bias_2 on the dense path (net.py:103-108)
            x = LreqDense(self.outputs, name="dense",
                          dtype=self.dtype)(x.reshape(x.shape[0], -1))
            x = nn.leaky_relu(x, 0.2)
            w1 = LreqDense(self.latent_size, name="style_1")(style_1)
            w2 = LreqDense(self.latent_size, name="style_2")(x.astype(jnp.float32))
            return x, w1, w2
        if self.fused_scale:
            x = LreqConv2d(self.outputs, 3, 2, 1, use_bias=False,
                           transform_kernel=True, name="conv_2",
                           dtype=self.dtype)(blur3x3(x))
        else:
            x = LreqConv2d(self.outputs, 3, 1, 1, use_bias=False, name="conv_2",
                           dtype=self.dtype)(blur3x3(x))
            x = downscale2d(x)
        bias_2 = self.param("bias_2", nn.initializers.zeros, (self.outputs,))
        if _fused_norm_on(self.fused_norm):
            x, m2, v2 = fused_bias_act_norm(x, bias_2, mode="plain", eps=1e-5)
        else:
            x = x + bias_2.astype(self.dtype)
            x = nn.leaky_relu(x, 0.2)
            m2, v2 = _moments(x)
            rstd2 = jax.lax.rsqrt(v2 + 1e-5)
            x = _channel_affine(x, rstd2, -m2 * rstd2)
        style_2 = jnp.concatenate([m2, jnp.sqrt(v2 + 1e-12)], axis=-1)
        w1 = LreqDense(self.latent_size, name="style_1")(style_1)
        w2 = LreqDense(self.latent_size, name="style_2")(style_2)
        return x, w1, w2


class DecodeBlock(nn.Module):
    """net.py:129-207."""

    inputs: int
    outputs: int
    latent_size: int
    has_first_conv: bool = True
    fused_scale: bool = True
    layer: int = 0
    dtype: Any = jnp.float32  # conv-path compute dtype; style heads stay f32
    fused_norm: Optional[bool] = None  # None = off (A/B in BENCH_NOTES; SIV_FUSED_NORM opts in)

    def _styled_norm(self, x: Array, style_w: Array, nw: Array, bias: Array,
                     rng: Optional[Array], noise_mode: str) -> Array:
        """inject + bias + leaky_relu + IN + AdaIN (net.py:160-181) — a
        single Pallas pass-pair on TPU, the jnp composition elsewhere.
        The fused path draws noise in f32 (the jnp path draws in the
        compute dtype): identical at f32 configs, distribution-identical
        at bf16."""
        g = style_w[:, 0] + 1.0
        bst = style_w[:, 1]
        if _fused_norm_on(self.fused_norm):
            if noise_mode == "none":
                x, _, _ = fused_bias_act_norm(
                    x, bias, g=g, b=bst, mode="corr", eps=1e-8,
                    corr_scale=math.pow(self.layer + 1, 0.5))
            else:
                bn = 1 if noise_mode == "batch_constant" else x.shape[0]
                n = jax.random.normal(rng, (bn, x.shape[1], x.shape[2], 1),
                                      jnp.float32)[..., 0]
                n = jnp.broadcast_to(n, (x.shape[0],) + x.shape[1:3])
                x, _, _ = fused_bias_act_norm(x, bias, g=g, b=bst, n=n, nw=nw,
                                              mode="noise", eps=1e-8)
            return x
        x = self._inject(x, nw, rng, noise_mode)
        x = x + bias.astype(self.dtype)
        x = nn.leaky_relu(x, 0.2)
        m, v = _moments(x)
        a = jax.lax.rsqrt(v + 1e-8) * g
        return _channel_affine(x, a, bst - m * a)

    def _inject(self, x: Array, weight: Array, rng: Optional[Array], noise_mode: str) -> Array:
        if noise_mode == "none":
            # deterministic correction term (net.py:176-178)
            s = math.pow(self.layer + 1, 0.5)
            xf = x.astype(jnp.float32)
            out = xf + s * jnp.exp(-xf * xf / (2.0 * s * s)) / math.sqrt(2 * math.pi) * 0.8
            return out.astype(x.dtype)
        if noise_mode == "batch_constant":
            shape = (1, x.shape[1], x.shape[2], 1)
        else:
            shape = (x.shape[0], x.shape[1], x.shape[2], 1)
        n = jax.random.normal(rng, shape, x.dtype)
        return x + weight.astype(x.dtype) * n

    @nn.compact
    def __call__(self, x: Array, s1: Array, s2: Array, rng: Optional[Array],
                 noise_mode: str = "batch") -> Array:
        x = x.astype(self.dtype)
        if self.has_first_conv:
            if self.fused_scale:
                x = LreqConvTranspose2d(self.outputs, 3, 2, 1, use_bias=False,
                                        transform_kernel=True, name="conv_1",
                                        dtype=self.dtype)(x)
            else:
                x = upscale2d(x)
                x = LreqConv2d(self.outputs, 3, 1, 1, use_bias=False, name="conv_1",
                               dtype=self.dtype)(x)
            x = blur3x3(x)
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        nw1 = self.param("noise_weight_1", nn.initializers.zeros, (self.outputs,))
        bias_1 = self.param("bias_1", nn.initializers.zeros, (self.outputs,))
        # IN (eps=1e-8) + AdaIN (net.py:169-181) folded into one per-channel
        # affine y = x*a + b: a = rstd*(s0+1), b = s1 - m*a
        w1 = LreqDense(2 * self.outputs, gain=1.0, name="style_1")(s1)
        w1 = w1.reshape(w1.shape[0], 2, self.outputs)
        x = self._styled_norm(x, w1, nw1, bias_1, r1, noise_mode)

        x = LreqConv2d(self.outputs, 3, 1, 1, use_bias=False, name="conv_2",
                       dtype=self.dtype)(x)
        nw2 = self.param("noise_weight_2", nn.initializers.zeros, (self.outputs,))
        bias_2 = self.param("bias_2", nn.initializers.zeros, (self.outputs,))
        w2 = LreqDense(2 * self.outputs, gain=1.0, name="style_2")(s2)
        w2 = w2.reshape(w2.shape[0], 2, self.outputs)
        x = self._styled_norm(x, w2, nw2, bias_2, r2, noise_mode)
        return x


class FromRGB(nn.Module):
    outputs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.leaky_relu(LreqConv2d(self.outputs, 1, 1, 0, name="from_rgb",
                                        dtype=self.dtype)(x), 0.2)


class ToRGB(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # output head upcasts to f32: the image feeds f32 losses/blends
        return LreqConv2d(self.channels, 1, 1, 0, gain=0.03, name="to_rgb",
                          dtype=self.dtype)(x).astype(jnp.float32)


class StyleEncoder(nn.Module):
    """EncoderDefault (net.py:234-319): styles-sum output (B, 1, latent).

    ``lod`` is static. ``blend`` is a traced scalar used only on the
    transition path (encode2, net.py:279-300).
    """

    startf: int = 32
    maxf: int = 256
    layer_count: int = 3
    latent_size: int = 128
    channels: int = 3
    with_fc_head: bool = False      # EncoderWithFC variant (net.py:322-409)
    last_block_dense: bool = False  # EncoderWithStatistics variant (net.py:412-497)
    dtype: Any = jnp.float32        # conv-path compute dtype
    fused_norm: Optional[bool] = None

    def setup(self):
        mul = 2
        inputs = self.startf
        resolution = 2 ** (self.layer_count + 1)
        from_rgb, blocks = [], []
        last_dense = self.with_fc_head or self.last_block_dense
        for i in range(self.layer_count):
            outputs = min(self.maxf, self.startf * mul)
            from_rgb.append(FromRGB(inputs, name=f"from_rgb_{i}", dtype=self.dtype))
            blocks.append(EncodeBlock(inputs, outputs, self.latent_size,
                                      last=last_dense and i == self.layer_count - 1,
                                      fused_scale=resolution >= 128, name=f"block_{i}",
                                      dtype=self.dtype, fused_norm=self.fused_norm))
            resolution //= 2
            inputs = outputs
            mul *= 2
        self.from_rgb = from_rgb
        self.encode_block = blocks
        if self.with_fc_head:
            self.fc2 = LreqDense(1, gain=1.0, name="fc2")

    def __call__(self, x: Array, lod: int, blend: Optional[Array] = None) -> Array:
        b = x.shape[0]
        styles = jnp.zeros((b, self.latent_size), jnp.float32)
        first = self.layer_count - lod - 1
        if blend is None:
            h = self.from_rgb[first](x)
            for i in range(first, self.layer_count):
                h, s1, s2 = self.encode_block[i](h)
                styles = styles + s1 + s2
        else:
            h = self.from_rgb[first](x)
            h, s1, s2 = self.encode_block[first](h)
            styles = styles + (s1 + s2) * blend
            h_prev = self.from_rgb[first + 1](downscale2d(x))
            h = h_prev + (h - h_prev) * blend.astype(h.dtype)  # torch.lerp(prev, x, blend)
            for i in range(first + 1, self.layer_count):
                h, s1, s2 = self.encode_block[i](h)
                styles = styles + s1 + s2
        out = styles[:, None, :]
        if self.with_fc_head:
            return out, self.fc2(h)
        return out

    def init_all(self, x_full: Array):
        """Touch every parameter once (init helper): every lod's entry path."""
        out = None
        for lod in range(self.layer_count):
            res = 2 ** (lod + 2)
            x = x_full[:, :res, :res, :]
            out = self(x, lod, None)
        return out


class StyleGenerator(nn.Module):
    """GeneratorDefault (net.py:500-595): const 4x4 start, per-layer styled
    decode blocks, ToRGB head per lod, blended transition path (decode2)."""

    startf: int = 32
    maxf: int = 256
    layer_count: int = 3
    latent_size: int = 128
    channels: int = 3
    dtype: Any = jnp.float32  # conv-path compute dtype
    fused_norm: Optional[bool] = None

    @property
    def layer_to_resolution(self):
        return [2 ** (i + 2) for i in range(self.layer_count)]

    def setup(self):
        mul = 2 ** (self.layer_count - 1)
        inputs = min(self.maxf, self.startf * mul)
        self.const = self.param("const", nn.initializers.ones, (1, 4, 4, inputs))
        blocks, to_rgb = [], []
        resolution = 2
        for i in range(self.layer_count):
            outputs = min(self.maxf, self.startf * mul)
            blocks.append(DecodeBlock(inputs, outputs, self.latent_size,
                                      has_first_conv=i != 0,
                                      fused_scale=resolution * 2 >= 128,
                                      layer=i, name=f"block_{i}", dtype=self.dtype,
                                      fused_norm=self.fused_norm))
            resolution *= 2
            to_rgb.append(ToRGB(self.channels, name=f"to_rgb_{i}", dtype=self.dtype))
            inputs = outputs
            mul //= 2
        self.decode_block = blocks
        self.to_rgb = to_rgb

    def __call__(self, styles: Array, lod: int, rng: Optional[Array],
                 blend: Optional[Array] = None, noise_mode: str = "batch") -> Array:
        b = styles.shape[0]
        x = jnp.broadcast_to(self.const, (b,) + self.const.shape[1:])
        rngs = jax.random.split(rng, self.layer_count) if rng is not None else [None] * self.layer_count
        if blend is None:
            for i in range(lod + 1):
                x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1], rngs[i], noise_mode)
            return self.to_rgb[lod](x)
        for i in range(lod):
            x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1], rngs[i], noise_mode)
        x_prev = self.to_rgb[lod - 1](x)
        x = self.decode_block[lod](x, styles[:, 2 * lod], styles[:, 2 * lod + 1], rngs[lod], noise_mode)
        x = self.to_rgb[lod](x)
        x_prev = upscale2d(x_prev)  # F.interpolate default nearest (net.py:570)
        return x_prev + (x - x_prev) * blend

    def init_all(self, styles: Array, rng: Array):
        out = None
        for lod in range(self.layer_count):
            out = self(styles, lod, rng)
        return out


class MappingToLatent(nn.Module):
    """net.py:707-727: 3 lrmul=0.1 leaky-relu blocks -> (B, 2, dlatent)."""

    latent_size: int = 256
    dlatent_size: int = 256
    mapping_fmaps: int = 256
    mapping_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.reshape(x.shape[0], -1)
        for i in range(self.mapping_layers):
            out = 2 * self.dlatent_size if i == self.mapping_layers - 1 else self.mapping_fmaps
            h = nn.leaky_relu(LreqDense(out, lrmul=0.1, name=f"block_{i + 1}")(h), 0.2)
        return h.reshape(h.shape[0], 2, h.shape[-1] // 2)


class MappingToLatentNoStyle(nn.Module):
    """net.py:730-751: plain lrmul=0.1 linears, no activation."""

    latent_size: int = 256
    dlatent_size: int = 256
    mapping_fmaps: int = 256
    mapping_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.reshape(x.shape[0], -1)
        for i in range(self.mapping_layers):
            out = self.dlatent_size if i == self.mapping_layers - 1 else self.mapping_fmaps
            h = LreqDense(out, lrmul=0.1, name=f"block_{i + 1}")(h)
        return h


class MappingFromLatent(nn.Module):
    """net.py:754-775: pixel_norm + lrmul=0.1 blocks, broadcast to num_layers."""

    num_layers: int = 6
    latent_size: int = 256
    dlatent_size: int = 256
    mapping_fmaps: int = 256
    mapping_layers: int = 5

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = pixel_norm(z)
        for i in range(self.mapping_layers):
            out = self.latent_size if i == self.mapping_layers - 1 else self.mapping_fmaps
            h = nn.leaky_relu(LreqDense(out, lrmul=0.1, name=f"block_{i + 1}")(h), 0.2)
        return jnp.repeat(h[:, None, :], self.num_layers, axis=1)
