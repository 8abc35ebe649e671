"""Style reference-checkpoint converter golden parity (VERDICT round-1 item 3).

Torch twins below implement the reference net.py math verbatim (implicit-lreq
mode: stored weights ARE effective weights — lreq.py:70-88) with the exact
reference module naming (net.py:63-231,500-595), so their ``state_dict()``
keys match a real published checkpoint's. The converter divides by the lreq
std to reach our explicit-mode raw weights; outputs must then agree.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from soft_intro_vae_tpu.models.style import StyleEncoder, StyleGenerator
from soft_intro_vae_tpu.utils.torch_compat import (
    convert_mapping,
    convert_style_encoder,
    convert_style_generator,
    load_reference_style_checkpoint,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast profile

LAYERS, STARTF, MAXF, LATENT, CH = 3, 16, 64, 32, 3


def t_blur(x):
    f = torch.tensor([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    c = x.shape[1]
    return F.conv2d(x, k.view(1, 1, 3, 3).repeat(c, 1, 1, 1), groups=c, padding=1)


def t_style_mod(x, s):
    s = s.view(s.shape[0], 2, x.shape[1], 1, 1)
    return x * (s[:, 0] + 1.0) + s[:, 1]


def t_inorm(x, eps):
    m = x.mean(dim=[2, 3], keepdim=True)
    v = ((x - m) ** 2).mean(dim=[2, 3], keepdim=True)
    return (x - m) / torch.sqrt(v + eps)


class TEncodeBlock(nn.Module):
    """Reference EncodeBlock (net.py:63-126), non-last path."""

    def __init__(self, inputs, outputs, latent):
        super().__init__()
        self.conv_1 = nn.Conv2d(inputs, inputs, 3, 1, 1, bias=False)
        self.bias_1 = nn.Parameter(torch.zeros(1, inputs, 1, 1))
        self.conv_2 = nn.Conv2d(inputs, outputs, 3, 1, 1, bias=False)
        self.bias_2 = nn.Parameter(torch.zeros(1, outputs, 1, 1))
        self.style_1 = nn.Linear(2 * inputs, latent)
        self.style_2 = nn.Linear(2 * outputs, latent)

    def forward(self, x):
        x = self.conv_1(x) + self.bias_1
        x = F.leaky_relu(x, 0.2)
        m = x.mean(dim=[2, 3], keepdim=True)
        std = torch.sqrt(((x - m) ** 2).mean(dim=[2, 3], keepdim=True))
        style_1 = torch.cat((m, std), dim=1)
        x = t_inorm(x, 1e-5)
        x = self.conv_2(t_blur(x))
        x = F.avg_pool2d(x, 2, 2)  # fused_scale=False at these resolutions
        x = x + self.bias_2
        x = F.leaky_relu(x, 0.2)
        m = x.mean(dim=[2, 3], keepdim=True)
        std = torch.sqrt(((x - m) ** 2).mean(dim=[2, 3], keepdim=True))
        style_2 = torch.cat((m, std), dim=1)
        x = t_inorm(x, 1e-5)
        w1 = self.style_1(style_1.flatten(1))
        w2 = self.style_2(style_2.flatten(1))
        return x, w1, w2


class TFromRGB(nn.Module):
    def __init__(self, channels, outputs):
        super().__init__()
        self.from_rgb = nn.Conv2d(channels, outputs, 1, 1, 0)


class TToRGB(nn.Module):
    def __init__(self, inputs, channels):
        super().__init__()
        self.to_rgb = nn.Conv2d(inputs, channels, 1, 1, 0)


class TEncoder(nn.Module):
    """Reference EncoderDefault (net.py:234-307)."""

    def __init__(self):
        super().__init__()
        self.from_rgb = nn.ModuleList()
        self.encode_block = nn.ModuleList()
        mul, inputs = 2, STARTF
        for i in range(LAYERS):
            outputs = min(MAXF, STARTF * mul)
            self.from_rgb.append(TFromRGB(CH, inputs))
            self.encode_block.append(TEncodeBlock(inputs, outputs, LATENT))
            inputs, mul = outputs, mul * 2

    def encode(self, x, lod):
        styles = torch.zeros(x.shape[0], LATENT)
        x = F.leaky_relu(self.from_rgb[LAYERS - lod - 1].from_rgb(x), 0.2)
        for i in range(LAYERS - lod - 1, LAYERS):
            x, s1, s2 = self.encode_block[i](x)
            styles = styles + s1 + s2
        return styles


class TDecodeBlock(nn.Module):
    """Reference DecodeBlock (net.py:129-207), noise=False path,
    fused_scale=False (resolutions < 128)."""

    def __init__(self, inputs, outputs, latent, has_first_conv, layer):
        super().__init__()
        self.has_first_conv = has_first_conv
        self.layer = layer
        if has_first_conv:
            self.conv_1 = nn.Conv2d(inputs, outputs, 3, 1, 1, bias=False)
        self.noise_weight_1 = nn.Parameter(torch.zeros(1, outputs, 1, 1))
        self.bias_1 = nn.Parameter(torch.zeros(1, outputs, 1, 1))
        self.style_1 = nn.Linear(latent, 2 * outputs)
        self.conv_2 = nn.Conv2d(outputs, outputs, 3, 1, 1, bias=False)
        self.noise_weight_2 = nn.Parameter(torch.zeros(1, outputs, 1, 1))
        self.bias_2 = nn.Parameter(torch.zeros(1, outputs, 1, 1))
        self.style_2 = nn.Linear(latent, 2 * outputs)

    @staticmethod
    def _corr(x, layer):
        s = math.pow(layer + 1, 0.5)
        return x + s * torch.exp(-x * x / (2.0 * s * s)) / math.sqrt(2 * math.pi) * 0.8

    def forward(self, x, s1, s2):
        if self.has_first_conv:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.conv_1(x)
            x = t_blur(x)
        x = self._corr(x, self.layer)
        x = F.leaky_relu(x + self.bias_1, 0.2)
        x = t_inorm(x, 1e-8)
        x = t_style_mod(x, self.style_1(s1))
        x = self.conv_2(x)
        x = self._corr(x, self.layer)
        x = F.leaky_relu(x + self.bias_2, 0.2)
        x = t_inorm(x, 1e-8)
        x = t_style_mod(x, self.style_2(s2))
        return x


class TGenerator(nn.Module):
    """Reference GeneratorDefault (net.py:500-595)."""

    def __init__(self):
        super().__init__()
        mul = 2 ** (LAYERS - 1)
        inputs = min(MAXF, STARTF * mul)
        self.const = nn.Parameter(torch.ones(1, inputs, 4, 4))
        self.decode_block = nn.ModuleList()
        self.to_rgb = nn.ModuleList()
        for i in range(LAYERS):
            outputs = min(MAXF, STARTF * mul)
            self.decode_block.append(TDecodeBlock(inputs, outputs, LATENT, i != 0, i))
            self.to_rgb.append(TToRGB(outputs, CH))
            inputs, mul = outputs, mul // 2

    def decode(self, styles, lod):
        x = self.const.expand(styles.shape[0], -1, -1, -1)
        for i in range(lod + 1):
            x = self.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1])
        return self.to_rgb[lod].to_rgb(x)


def _randomize(module, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.25)


class TestStyleConverterParity:
    def test_encoder_golden(self):
        tw = TEncoder().eval()
        _randomize(tw, 20)
        params = convert_style_encoder(tw.state_dict(), LAYERS, STARTF, MAXF)
        enc = StyleEncoder(startf=STARTF, maxf=MAXF, layer_count=LAYERS,
                           latent_size=LATENT, channels=CH)
        for lod in (0, LAYERS - 1):
            res = 2 ** (lod + 2)
            x = np.random.RandomState(21 + lod).randn(2, res, res, CH).astype(np.float32)
            with torch.no_grad():
                y_t = tw.encode(torch.tensor(x.transpose(0, 3, 1, 2)), lod)
            y_j = enc.apply({"params": params}, jnp.asarray(x), lod, None)
            np.testing.assert_allclose(np.asarray(y_j)[:, 0], y_t.numpy(),
                                       rtol=2e-3, atol=2e-4)

    def test_generator_golden(self):
        tw = TGenerator().eval()
        _randomize(tw, 22)
        params = convert_style_generator(tw.state_dict(), LAYERS, STARTF, MAXF)
        gen = StyleGenerator(startf=STARTF, maxf=MAXF, layer_count=LAYERS,
                             latent_size=LATENT, channels=CH)
        styles = np.random.RandomState(23).randn(2, 2 * LAYERS, LATENT).astype(np.float32)
        for lod in (0, LAYERS - 1):
            with torch.no_grad():
                y_t = tw.decode(torch.tensor(styles), lod)
            y_j = gen.apply({"params": params}, jnp.asarray(styles), lod, None,
                            None, "none")
            np.testing.assert_allclose(np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
                                       rtol=2e-3, atol=2e-4)

    def test_mapping_converter(self):
        torch.manual_seed(24)

        class TMap(nn.Module):
            def __init__(self):
                super().__init__()
                self.map_blocks = nn.ModuleList()
                for i in range(3):
                    blk = nn.Module()
                    blk.fc = nn.Linear(LATENT, 2 * LATENT if i == 2 else LATENT)
                    self.map_blocks.append(blk)

        tw = TMap()
        _randomize(tw, 25)
        params = convert_mapping(tw.state_dict(), 3)
        from soft_intro_vae_tpu.models.style import MappingToLatent

        m = MappingToLatent(latent_size=LATENT, dlatent_size=LATENT,
                            mapping_fmaps=LATENT, mapping_layers=3)
        x = np.random.RandomState(26).randn(4, 1, LATENT).astype(np.float32)
        with torch.no_grad():
            h = torch.tensor(x).flatten(1)
            for i in range(3):
                h = F.leaky_relu(tw.map_blocks[i].fc(h), 0.2)
            y_t = h.view(h.shape[0], 2, h.shape[1] // 2)
        y_j = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), rtol=2e-3, atol=2e-4)

    def test_full_checkpoint_roundtrip(self, tmp_path):
        """A reference-format .pth (models dict incl. EMA twins) loads into
        complete StyleModel trees that drive generate()."""
        enc, gen = TEncoder(), TGenerator()
        _randomize(enc, 27)
        _randomize(gen, 28)

        class TMapTL(nn.Module):
            def __init__(self):
                super().__init__()
                self.map_blocks = nn.ModuleList()
                for i in range(3):
                    b = nn.Module()
                    b.fc = nn.Linear(LATENT, 2 * LATENT if i == 2 else LATENT)
                    self.map_blocks.append(b)

        class TMapFL(nn.Module):
            def __init__(self):
                super().__init__()
                self.map_blocks = nn.ModuleList()
                for i in range(5):
                    b = nn.Module()
                    b.fc = nn.Linear(LATENT, LATENT)
                    self.map_blocks.append(b)

        tl, fl = TMapTL(), TMapFL()
        _randomize(tl, 29)
        _randomize(fl, 30)
        blob = {"models": {
            "discriminator": enc.state_dict(), "generator": gen.state_dict(),
            "mapping_tl": tl.state_dict(), "mapping_fl": fl.state_dict(),
            "dlatent_avg": {"buff": torch.zeros(2 * LAYERS, LATENT)},
            "discriminator_s": enc.state_dict(), "generator_s": gen.state_dict(),
            "mapping_tl_s": tl.state_dict(), "mapping_fl_s": fl.state_dict(),
        }}
        p = tmp_path / "model_final.pth"
        torch.save(blob, p)

        out = load_reference_style_checkpoint(str(p), LAYERS, STARTF, MAXF, mapping_layers=5)
        assert set(out) == {"params_e", "params_d", "buffers", "ema_e", "ema_d", "ema_buffers"}

        from soft_intro_vae_tpu.train.style_step import StyleModel, StyleModelConfig

        model = StyleModel(StyleModelConfig(startf=STARTF, maxf=MAXF, layer_count=LAYERS,
                                            latent_size=LATENT, channels=CH))
        z = jnp.asarray(np.random.RandomState(31).randn(2, LATENT), jnp.float32)
        rec, _ = model.generate(out["ema_d"], out["ema_buffers"], jax.random.key(0),
                                LAYERS - 1, None, z, mixing=False, truncation=False,
                                update_avg=False)
        assert rec.shape == (2, 2 ** (LAYERS + 1), 2 ** (LAYERS + 1), CH)
        assert np.isfinite(np.asarray(rec)).all()
