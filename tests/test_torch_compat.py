"""Forward-parity test: reference-named torch image model vs flax ConvEncoder/
ConvDecoder through the checkpoint converter.

A torch model with the reference's exact module naming and architecture
(conv5x5 stem + BN + LReLU + AvgPool, res_in_{sz} blocks, fc / fc.0, predict)
is built here as an oracle; its state_dict is converted with
utils.torch_compat and both models must produce the same outputs in eval
mode. This validates architecture parity AND the .pth interop path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from soft_intro_vae_tpu.models.conv import ConvDecoder, ConvEncoder
from soft_intro_vae_tpu.utils.torch_compat import (
    convert_image_decoder,
    convert_image_encoder,
    convert_mlp,
)

CHANNELS = (8, 16)
IMAGE = 16
CDIM = 3
ZDIM = 8


class TorchResBlock(nn.Module):
    def __init__(self, inc, outc):
        super().__init__()
        if inc != outc:
            self.conv_expand = nn.Conv2d(inc, outc, 1, 1, 0, bias=False)
        else:
            self.conv_expand = None
        self.conv1 = nn.Conv2d(inc, outc, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(outc)
        self.conv2 = nn.Conv2d(outc, outc, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(outc)

    def forward(self, x):
        idt = self.conv_expand(x) if self.conv_expand is not None else x
        y = nn.functional.leaky_relu(self.bn1(self.conv1(x)), 0.2)
        y = self.bn2(self.conv2(y))
        return nn.functional.leaky_relu(y + idt, 0.2)


def build_torch_encoder():
    m = nn.Module()
    main = nn.Sequential(
        nn.Conv2d(CDIM, CHANNELS[0], 5, 1, 2, bias=False),
        nn.BatchNorm2d(CHANNELS[0]),
        nn.LeakyReLU(0.2),
        nn.AvgPool2d(2),
    )
    sz = IMAGE // 2
    cc = CHANNELS[0]
    for ch in CHANNELS[1:]:
        main.add_module(f"res_in_{sz}", TorchResBlock(cc, ch))
        main.add_module(f"down_to_{sz // 2}", nn.AvgPool2d(2))
        cc, sz = ch, sz // 2
    main.add_module(f"res_in_{sz}", TorchResBlock(cc, cc))
    m.main = main
    m.fc = nn.Linear(cc * sz * sz, 2 * ZDIM)
    return m


def build_torch_decoder():
    m = nn.Module()
    cc = CHANNELS[-1]
    sz = IMAGE // (2 ** len(CHANNELS))
    m.fc = nn.Sequential(nn.Linear(ZDIM, cc * sz * sz), nn.ReLU(True))
    main = nn.Sequential()
    for ch in reversed(CHANNELS):
        main.add_module(f"res_in_{sz}", TorchResBlock(cc, ch))
        main.add_module(f"up_to_{sz * 2}", nn.Upsample(scale_factor=2, mode="nearest"))
        cc, sz = ch, sz * 2
    main.add_module(f"res_in_{sz}", TorchResBlock(cc, cc))
    main.add_module("predict", nn.Conv2d(cc, CDIM, 5, 1, 2))
    m.main = main
    m._sz0 = IMAGE // (2 ** len(CHANNELS))
    return m


def _randomize_bn_stats(model, seed):
    rs = np.random.RandomState(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.tensor(rs.randn(mod.num_features) * 0.1, dtype=torch.float32))
            mod.running_var.copy_(torch.tensor(rs.rand(mod.num_features) + 0.5, dtype=torch.float32))


class TestImageModelParity:
    def test_encoder_forward_matches(self):
        torch.manual_seed(0)
        tenc = build_torch_encoder().eval()
        with torch.no_grad():
            _randomize_bn_stats(tenc, 1)
        sd = {("encoder." + k): v for k, v in tenc.state_dict().items()}
        params, stats = convert_image_encoder(sd, CHANNELS, IMAGE)

        x = np.random.RandomState(2).rand(4, IMAGE, IMAGE, CDIM).astype(np.float32)
        with torch.no_grad():
            y = tenc.fc(tenc.main(torch.tensor(x.transpose(0, 3, 1, 2))).flatten(1))
            mu_t, logvar_t = y.chunk(2, dim=1)

        enc = ConvEncoder(cdim=CDIM, zdim=ZDIM, channels=CHANNELS, image_size=IMAGE)
        mu_j, logvar_j = enc.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), rtol=1e-3, atol=1e-4)

    def test_decoder_forward_matches(self):
        torch.manual_seed(3)
        tdec = build_torch_decoder().eval()
        with torch.no_grad():
            _randomize_bn_stats(tdec, 4)
        sd = {("decoder." + k): v for k, v in tdec.state_dict().items()}
        params, stats = convert_image_decoder(sd, CHANNELS, IMAGE)

        z = np.random.RandomState(5).randn(4, ZDIM).astype(np.float32)
        with torch.no_grad():
            h = tdec.fc(torch.tensor(z)).view(4, CHANNELS[-1], tdec._sz0, tdec._sz0)
            y_t = tdec.main(h)

        dec = ConvDecoder(cdim=CDIM, zdim=ZDIM, channels=CHANNELS, image_size=IMAGE)
        y_j = dec.apply({"params": params, "batch_stats": stats}, jnp.asarray(z), train=False)
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


class TestMLPParity:
    def test_mlp_converter(self):
        torch.manual_seed(6)
        tm = nn.Module()
        main = nn.Sequential()
        main.add_module("input", nn.Linear(2, 16))
        main.add_module("act0", nn.ReLU(True))
        for i in range(2):
            main.add_module(f"hidden_{i + 1}", nn.Linear(16, 16))
            main.add_module(f"act_{i + 1}", nn.ReLU(True))
        main.add_module("output", nn.Linear(16, 4))
        tm.main = main
        sd = {("encoder." + k): v for k, v in tm.state_dict().items()}
        params = convert_mlp(sd, 2, "encoder.")

        from soft_intro_vae_tpu.models.mlp import EncoderMLP

        x = np.random.RandomState(7).randn(5, 2).astype(np.float32)
        with torch.no_grad():
            y_t = tm.main(torch.tensor(x))
        enc = EncoderMLP(x_dim=2, z_dim=2, n_layers=2, num_hidden=16)
        mu, logvar = enc.apply({"params": params}, jnp.asarray(x))
        y_j = np.concatenate([np.asarray(mu), np.asarray(logvar)], axis=1)
        np.testing.assert_allclose(y_j, y_t.numpy(), rtol=1e-4, atol=1e-5)


class Torch3DEncoderTwin(nn.Module):
    """Exact reference Encoder naming (soft_intro_vae_3d/models/vae.py:97-146)."""

    def __init__(self, z=8, bn=True):
        super().__init__()
        chans = [3, 64, 128, 256, 256, 512]
        layers = []
        for i in range(5):
            layers.append(nn.Conv1d(chans[i], chans[i + 1], 1, bias=not bn))
            layers.append(nn.ReLU(True))
            if bn:
                layers.append(nn.BatchNorm1d(chans[i + 1]))
        self.conv = nn.Sequential(*layers)
        self.fc = nn.Sequential(nn.Linear(512, 256), nn.ReLU(True))
        self.mu_layer = nn.Linear(256, z)
        self.std_layer = nn.Linear(256, z)

    def forward(self, x):  # x: (B, 3, N)
        h = self.conv(x).max(dim=2)[0]
        h = self.fc(h)
        return self.mu_layer(h), self.std_layer(h)


class Torch3DDecoderTwin(nn.Module):
    """Exact reference Decoder naming (vae.py:21-47)."""

    def __init__(self, z=8, n_points=64):
        super().__init__()
        self.n_points = n_points
        self.model = nn.Sequential(
            nn.Linear(z, 64), nn.ReLU(True),
            nn.Linear(64, 128), nn.ReLU(True),
            nn.Linear(128, 512), nn.ReLU(True),
            nn.Linear(512, 1024), nn.ReLU(True),
            nn.Linear(1024, n_points * 3),
        )

    def forward(self, z):
        return self.model(z).view(-1, 3, self.n_points)


class TestPointNetParity:
    def test_encoder_converter_bn(self):
        from soft_intro_vae_tpu.models.pointnet import PointNetEncoder
        from soft_intro_vae_tpu.utils.torch_compat import convert_pointnet_encoder

        torch.manual_seed(10)
        tm = Torch3DEncoderTwin(z=8, bn=True).eval()
        # randomize BN stats so the test is meaningful
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, nn.BatchNorm1d):
                    m.running_mean.normal_(0, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
                    m.weight.normal_(1, 0.2)
                    m.bias.normal_(0, 0.2)
        sd = {("encoder." + k): v for k, v in tm.state_dict().items()}
        params, stats = convert_pointnet_encoder(sd, use_batchnorm=True)

        x = np.random.RandomState(11).randn(4, 32, 3).astype(np.float32)
        with torch.no_grad():
            mu_t, lv_t = tm(torch.tensor(x.transpose(0, 2, 1)))
        enc = PointNetEncoder(z_dim=8, use_batchnorm=True)
        mu_j, lv_j = enc.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), rtol=1e-3, atol=1e-4)

    def test_decoder_converter_layout(self):
        from soft_intro_vae_tpu.models.pointnet import PointNetDecoder
        from soft_intro_vae_tpu.utils.torch_compat import convert_pointnet_decoder

        torch.manual_seed(12)
        tm = Torch3DDecoderTwin(z=8, n_points=64).eval()
        sd = {("decoder." + k): v for k, v in tm.state_dict().items()}
        params = convert_pointnet_decoder(sd, n_points=64)

        z = np.random.RandomState(13).randn(4, 8).astype(np.float32)
        with torch.no_grad():
            y_t = tm(torch.tensor(z))  # (B, 3, N)
        dec = PointNetDecoder(z_dim=8, n_points=64)
        y_j = dec.apply({"params": params}, jnp.asarray(z))  # (B, N, 3)
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-5)

    def test_load_reference_3d_checkpoint(self, tmp_path):
        from soft_intro_vae_tpu.utils.torch_compat import load_reference_3d_checkpoint

        torch.manual_seed(14)
        full = nn.Module()
        full.encoder = Torch3DEncoderTwin(z=8, bn=True)
        full.decoder = Torch3DDecoderTwin(z=8, n_points=64)
        p = tmp_path / "00042.pth"
        torch.save(full.state_dict(), p)  # bare state_dict (reference :444)
        out = load_reference_3d_checkpoint(str(p), n_points=64)
        assert set(out) == {"params_e", "stats_e", "params_d"}
        assert "conv_4" in out["params_e"] and "bn_4" in out["params_e"]
        assert out["params_d"]["out"]["kernel"].shape == (1024, 64 * 3)
