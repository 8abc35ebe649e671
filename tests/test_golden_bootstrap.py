"""Golden-value parity for the BOOTSTRAP variant against a torch twin.

Locks the bootstrap-specific semantics (frozen target decoder in the E-step
full-forwards and D-step extra decodes, non-detached z into the target,
non-detached recon targets in D — bootstrap trainer :617-646) with identical
weights + injected noise, on tiny MLP nets so CPU compile stays cheap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from soft_intro_vae_tpu.models.mlp import DecoderMLP, EncoderMLP
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps
from soft_intro_vae_tpu.utils.torch_compat import convert_mlp

pytestmark = [pytest.mark.slow, pytest.mark.golden]  # compile-heavy; golden = torch-twin parity tier

XDIM, ZDIM, H, NL, B = 2, 2, 16, 2, 8
BETAS = dict(beta_rec=0.2, beta_kl=0.3, beta_neg=0.9, gamma_r=1.0)
SCALE = 0.5
LR = 1e-3


def _torch_mlp(in_dim, out_dim):
    m = nn.Module()
    main = nn.Sequential()
    main.add_module("input", nn.Linear(in_dim, H))
    main.add_module("act0", nn.ReLU(True))
    for i in range(NL):
        main.add_module(f"hidden_{i + 1}", nn.Linear(H, H))
        main.add_module(f"act_{i + 1}", nn.ReLU(True))
    main.add_module("output", nn.Linear(H, out_dim))
    m.main = main
    return m


def _kl(lv, mu, reduce="mean"):
    kl = -0.5 * (1 + lv - lv.exp() - mu.pow(2)).sum(1)
    return kl.mean() if reduce == "mean" else kl


def _rec(x, r, reduction="mean"):
    e = torch.nn.functional.mse_loss(r, x, reduction="none").sum(1)
    return e.mean() if reduction == "mean" else e


def _rp(mu, lv, eps):
    return mu + eps * (0.5 * lv).exp()


def torch_bootstrap_step(enc, dec, tgt, opt_e, opt_d, x, nz):
    def E(inp):
        return enc.main(inp).chunk(2, dim=1)

    # ===== E (bootstrap: full forwards decode through the TARGET) =====
    fake = dec.main(nz["noise"])
    mu, lv = E(x)
    z = _rp(mu, lv, nz["eps_real"])
    rec = dec.main(z)
    loss_rec = _rec(x, rec)
    kl_real = _kl(lv, mu)
    rmu, rlv = E(rec.detach())
    rr = tgt.main(_rp(rmu, rlv, nz["eps_e_rec"]))
    fmu, flv = E(fake.detach())
    rf = tgt.main(_rp(fmu, flv, nz["eps_e_fake"]))
    exp_r = (-2 * SCALE * (BETAS["beta_rec"] * _rec(rec, rr, "none") + BETAS["beta_neg"] * _kl(rlv, rmu, "none"))).exp().mean()
    exp_f = (-2 * SCALE * (BETAS["beta_rec"] * _rec(fake, rf, "none") + BETAS["beta_neg"] * _kl(flv, fmu, "none"))).exp().mean()
    lossE = SCALE * (BETAS["beta_rec"] * loss_rec + BETAS["beta_kl"] * kl_real) + 0.25 * (exp_r + exp_f)
    opt_e.zero_grad()
    lossE.backward()
    opt_e.step()

    # ===== D (extra decodes via frozen target, z NOT detached) =====
    fake = dec.main(nz["noise"])
    rec = dec.main(z.detach())
    loss_rec = _rec(x, rec)
    rmu, rlv = E(rec)
    z_rec = _rp(rmu, rlv, nz["eps_d_rec"])
    fmu, flv = E(fake)
    z_fake = _rp(fmu, flv, nz["eps_d_fake"])
    rr = tgt.main(z_rec)
    rf = tgt.main(z_fake)
    loss_rr = _rec(rec, rr)      # NOT detached targets (bootstrap :641-644)
    loss_rf = _rec(fake, rf)
    lossD = SCALE * (BETAS["beta_rec"] * loss_rec
                     + 0.5 * BETAS["beta_kl"] * (_kl(rlv, rmu) + _kl(flv, fmu))
                     + BETAS["gamma_r"] * 0.5 * BETAS["beta_rec"] * (loss_rr + loss_rf))
    opt_d.zero_grad()
    lossD.backward()
    opt_d.step()
    return float(lossE), float(lossD)


def test_bootstrap_step_matches_torch_twin():
    torch.manual_seed(0)
    for p in []:
        pass
    tenc = _torch_mlp(XDIM, 2 * ZDIM)
    tdec = _torch_mlp(ZDIM, XDIM)
    ttgt = _torch_mlp(ZDIM, XDIM)
    # encoder-only / decoder-only optimizers, target frozen (reference :601-603)
    opt_e = torch.optim.Adam(tenc.parameters(), lr=LR)
    opt_d = torch.optim.Adam(tdec.parameters(), lr=LR)
    for p in ttgt.parameters():
        p.requires_grad = False

    pe = convert_mlp({("e." + k): v for k, v in tenc.state_dict().items()}, NL, "e.")
    pd = convert_mlp({("d." + k): v for k, v in tdec.state_dict().items()}, NL, "d.")
    pt = convert_mlp({("t." + k): v for k, v in ttgt.state_dict().items()}, NL, "t.")

    enc = EncoderMLP(x_dim=XDIM, z_dim=ZDIM, n_layers=NL, num_hidden=H)
    dec = DecoderMLP(x_dim=XDIM, z_dim=ZDIM, n_layers=NL, num_hidden=H)

    def encode(params, stats, x):
        return enc.apply({"params": params}, x), stats

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    opt = optim.adam()
    jt = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = TrainState.create(
        params_e=jt(pe), params_d=jt(pd), params_d_target=jt(pt),
        opt_e=opt.init(jt(pe)), opt_d=opt.init(jt(pd)),
        rng=jax.random.key(0), lr_e=LR, lr_d=LR,
    )
    cfg = StepConfig(z_dim=ZDIM, scale=SCALE, bootstrap=True, **BETAS)
    _, intro = build_train_steps(encode=encode, decode=decode, decode_target=decode,
                                 optimizer=opt, cfg=cfg, donate=False)

    rs = np.random.RandomState(7)
    for step_i in range(2):
        x_np = rs.randn(B, XDIM).astype(np.float32)
        nz = {k: rs.randn(B, ZDIM).astype(np.float32)
              for k in ["noise", "eps_real", "eps_e_rec", "eps_e_fake", "eps_d_rec", "eps_d_fake"]}
        lossE_t, lossD_t = torch_bootstrap_step(
            tenc, tdec, ttgt, opt_e, opt_d, torch.tensor(x_np),
            {k: torch.tensor(v) for k, v in nz.items()})
        state, m = intro(state, jnp.asarray(x_np), {k: jnp.asarray(v) for k, v in nz.items()})
        assert float(m["loss_e"]) == pytest.approx(lossE_t, rel=2e-3), f"step {step_i} lossE"
        assert float(m["loss_d"]) == pytest.approx(lossD_t, rel=2e-3), f"step {step_i} lossD"
