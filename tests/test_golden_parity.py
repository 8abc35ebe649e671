"""Golden-value parity: identical weights + identical noise -> identical losses.

The SURVEY §7 acceptance test for 'bit-comparable losses at fixed seed':
PyTorch and JAX RNGs differ, so literal bit parity is impossible across
frameworks — instead we inject the SAME eps/noise tensors into a torch twin
of the reference train step and into our jitted intro_step, starting from the
SAME weights (via the tested torch->flax converter), and require the loss
scalars to agree to f32 tolerance across TWO consecutive optimizer steps
(which also validates Adam-update parity).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.test_torch_compat import (
    CDIM,
    CHANNELS,
    IMAGE,
    ZDIM,
    build_torch_decoder,
    build_torch_encoder,
)
from soft_intro_vae_tpu.models.conv import ConvDecoder, ConvEncoder
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps
from soft_intro_vae_tpu.utils.torch_compat import convert_image_decoder, convert_image_encoder

pytestmark = [pytest.mark.slow, pytest.mark.golden]  # compile-heavy; golden = torch-twin parity tier

B = 4
BETAS = dict(beta_rec=1.0, beta_kl=1.0, beta_neg=16.0, gamma_r=1e-8)
SCALE = 1.0 / (CDIM * IMAGE * IMAGE)
LR = 2e-4


def _calc_kl(logvar, mu, reduce="mean"):
    kl = -0.5 * (1 + logvar - logvar.exp() - mu.pow(2)).sum(1)
    return kl.mean() if reduce == "mean" else kl


def _rec_err(x, r, reduction="mean"):
    e = F.mse_loss(r.flatten(1), x.flatten(1), reduction="none").sum(1)
    if reduction == "mean":
        return e.mean()
    return e


def _reparam(mu, logvar, eps):
    return mu + eps * (0.5 * logvar).exp()


def torch_intro_step(enc, dec, opt_e, opt_d, x, nz):
    """Reference image-variant E/D double update with injected noise."""

    def enc_fwd(inp):
        y = enc.fc(enc.main(inp).flatten(1))
        return y.chunk(2, dim=1)

    def dec_fwd(z):
        h = dec.fc(z).view(z.shape[0], CHANNELS[-1], dec._sz0, dec._sz0)
        return dec.main(h)

    # ===== E =====
    for p in enc.parameters():
        p.requires_grad = True
    for p in dec.parameters():
        p.requires_grad = False
    fake = dec_fwd(nz["noise"])
    mu, lv = enc_fwd(x)
    z = _reparam(mu, lv, nz["eps_real"])
    rec = dec_fwd(z)
    loss_rec = _rec_err(x, rec)
    kl_real = _calc_kl(lv, mu)
    rmu, rlv = enc_fwd(rec.detach())
    zr = _reparam(rmu, rlv, nz["eps_e_rec"])
    rr = dec_fwd(zr)
    fmu, flv = enc_fwd(fake.detach())
    zf = _reparam(fmu, flv, nz["eps_e_fake"])
    rf = dec_fwd(zf)
    e_rr = _rec_err(rec, rr, "none")
    e_rf = _rec_err(fake, rf, "none")
    exp_r = (-2 * SCALE * (BETAS["beta_rec"] * e_rr + BETAS["beta_neg"] * _calc_kl(rlv, rmu, "none"))).exp().mean()
    exp_f = (-2 * SCALE * (BETAS["beta_rec"] * e_rf + BETAS["beta_neg"] * _calc_kl(flv, fmu, "none"))).exp().mean()
    lossE = SCALE * (BETAS["beta_rec"] * loss_rec + BETAS["beta_kl"] * kl_real) + 0.25 * (exp_r + exp_f)
    opt_e.zero_grad()
    lossE.backward()
    opt_e.step()

    # ===== D =====
    for p in enc.parameters():
        p.requires_grad = False
    for p in dec.parameters():
        p.requires_grad = True
    fake = dec_fwd(nz["noise"])
    rec = dec_fwd(z.detach())
    loss_rec = _rec_err(x, rec)
    rmu, rlv = enc_fwd(rec)
    zr = _reparam(rmu, rlv, nz["eps_d_rec"])
    fmu, flv = enc_fwd(fake)
    zf = _reparam(fmu, flv, nz["eps_d_fake"])
    rr = dec_fwd(zr.detach())
    rf = dec_fwd(zf.detach())
    lossD = SCALE * (
        BETAS["beta_rec"] * loss_rec
        + 0.5 * BETAS["beta_kl"] * (_calc_kl(rlv, rmu) + _calc_kl(flv, fmu))
        + BETAS["gamma_r"] * 0.5 * BETAS["beta_rec"] * (_rec_err(rec.detach(), rr) + _rec_err(fake.detach(), rf))
    )
    opt_d.zero_grad()
    lossD.backward()
    opt_d.step()
    return float(lossE), float(lossD)


@pytest.mark.parametrize("steps", [2])
def test_intro_step_matches_torch_reference(steps):
    torch.manual_seed(0)
    tenc = build_torch_encoder().train()
    tdec = build_torch_decoder().train()
    opt_e = torch.optim.Adam(tenc.parameters(), lr=LR)
    opt_d = torch.optim.Adam(tdec.parameters(), lr=LR)

    # identical weights via the tested torch->flax converter
    sd_e = {("encoder." + k): v for k, v in tenc.state_dict().items()}
    sd_d = {("decoder." + k): v for k, v in tdec.state_dict().items()}
    pe, se = convert_image_encoder(sd_e, CHANNELS, IMAGE)
    pd, sdd = convert_image_decoder(sd_d, CHANNELS, IMAGE)

    enc = ConvEncoder(cdim=CDIM, zdim=ZDIM, channels=CHANNELS, image_size=IMAGE)
    dec = ConvDecoder(cdim=CDIM, zdim=ZDIM, channels=CHANNELS, image_size=IMAGE)

    def encode(params, stats, x):
        (mu, lv), upd = enc.apply({"params": params, "batch_stats": stats}, x,
                                  train=True, mutable=["batch_stats"])
        return (mu, lv), upd["batch_stats"]

    def decode(params, stats, z):
        y, upd = dec.apply({"params": params, "batch_stats": stats}, z,
                           train=True, mutable=["batch_stats"])
        return y, upd["batch_stats"]

    opt = optim.adam()
    jt = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = TrainState.create(
        params_e=jt(pe), params_d=jt(pd), stats_e=jt(se), stats_d=jt(sdd),
        opt_e=opt.init(jt(pe)), opt_d=opt.init(jt(pd)),
        rng=jax.random.key(0), lr_e=LR, lr_d=LR,
    )
    cfg = StepConfig(z_dim=ZDIM, scale=SCALE, **BETAS)
    _, intro = build_train_steps(encode=encode, decode=decode, optimizer=opt, cfg=cfg, donate=False)

    rs = np.random.RandomState(42)
    for step_i in range(steps):
        x_np = rs.rand(B, IMAGE, IMAGE, CDIM).astype(np.float32)
        nz_np = {k: rs.randn(B, ZDIM).astype(np.float32)
                 for k in ["noise", "eps_real", "eps_e_rec", "eps_e_fake", "eps_d_rec", "eps_d_fake"]}

        lossE_t, lossD_t = torch_intro_step(
            tenc, tdec, opt_e, opt_d,
            torch.tensor(x_np.transpose(0, 3, 1, 2)),
            {k: torch.tensor(v) for k, v in nz_np.items()},
        )
        state, m = intro(state, jnp.asarray(x_np), {k: jnp.asarray(v) for k, v in nz_np.items()})
        lossE_j, lossD_j = float(m["loss_e"]), float(m["loss_d"])

        assert lossE_j == pytest.approx(lossE_t, rel=2e-3), f"step {step_i} lossE"
        assert lossD_j == pytest.approx(lossD_t, rel=2e-3), f"step {step_i} lossD"
