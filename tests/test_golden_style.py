"""Style-variant step-level golden loss parity (VERDICT round-3 item 2).

Torch twin of the reference's loss-computing forward — E-branch, D-branch,
vanilla (/root/reference/style_soft_intro_vae/model.py:215-318) — driven with
converter-loaded identical weights, injected eps/z noise, mixing off, and
LREQAdam on both sides. Loss scalars must agree to f32 tolerance across TWO
consecutive double updates (which also pins LREQAdam-update parity and the
explicit-lreq <-> implicit-lreq + lr_equalization_coef equivalence), at
lod 1 no-blend and lod 2 blend=0.6 (encode2/decode2, net.py:279-300,557-573).

Decoder B-noise runs in the deterministic noise=False mode on both sides
(the correction-term path, net.py:176-178) so the only stochasticity is the
injected tensors; the noise=True path's forward parity is covered by
tests/test_adain_pallas.py and the converter goldens.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.test_style_convert import CH, LATENT, LAYERS, MAXF, STARTF, TEncoder, TGenerator, _randomize
from soft_intro_vae_tpu.train.lreq_adam import scale_by_lreq_adam
from soft_intro_vae_tpu.train.style_step import (
    StyleModel,
    StyleModelConfig,
    StyleStepConfig,
    StyleTrainState,
    build_style_steps,
)
from soft_intro_vae_tpu.utils.torch_compat import (
    convert_mapping,
    convert_style_encoder,
    convert_style_generator,
)

pytestmark = [pytest.mark.slow, pytest.mark.golden]

B = 4
LR = 1.5e-3
BETAS = dict(beta_rec=0.1, beta_kl=0.2, beta_neg=8.0, gamma_r=1e-8)
RES_MAX = 2 ** (LAYERS + 1)
SCALE = 1.0 / (CH * RES_MAX * RES_MAX)
SQRT2 = math.sqrt(2.0)


# --------------------------------------------------------------- torch twin --
class TMap(nn.Module):
    """Bare-linear mapping stack (MappingBlock semantics, net.py:674-681)."""

    def __init__(self, n_layers, last_out):
        super().__init__()
        self.map_blocks = nn.ModuleList()
        inputs = LATENT
        for i in range(n_layers):
            out = last_out if i == n_layers - 1 else LATENT
            self.map_blocks.append(nn.Linear(inputs, out))
            inputs = out


def t_pixel_norm(x):
    return x * torch.rsqrt(torch.mean(x * x, dim=1, keepdim=True) + 1e-8)


def t_mapping_fl(fl, z):
    """VAEMappingFromLatent (net.py:754-775) minus the broadcast."""
    x = t_pixel_norm(z)
    for blk in fl.map_blocks:
        x = F.leaky_relu(blk(x), 0.2)
    return x  # (B, LATENT)


def t_mapping_tl(tl, styles):
    """VAEMappingToLatent_old (net.py:707-727)."""
    h = styles
    for blk in tl.map_blocks:
        h = F.leaky_relu(blk(h), 0.2)
    return h.view(h.shape[0], 2, h.shape[1] // 2)


def t_encoder_fwd(enc, x, lod, blend):
    """EncoderDefault.forward (net.py:267-307): encode or encode2."""
    if blend is None:
        return enc.encode(x, lod)
    first = LAYERS - lod - 1
    h = F.leaky_relu(enc.from_rgb[first].from_rgb(x), 0.2)
    h, s1, s2 = enc.encode_block[first](h)
    styles = (s1 + s2) * blend
    h_prev = F.avg_pool2d(x, 2, 2)
    h_prev = F.leaky_relu(enc.from_rgb[first + 1].from_rgb(h_prev), 0.2)
    h = torch.lerp(h_prev, h, blend)
    for i in range(first + 1, LAYERS):
        h, s1, s2 = enc.encode_block[i](h)
        styles = styles + s1 + s2
    return styles


def t_generator_fwd(gen, styles, lod, blend):
    """GeneratorDefault.forward (net.py:548-581): decode or decode2."""
    if blend is None:
        return gen.decode(styles, lod)
    x = gen.const.expand(styles.shape[0], -1, -1, -1)
    for i in range(lod):
        x = gen.decode_block[i](x, styles[:, 2 * i], styles[:, 2 * i + 1])
    x_prev = gen.to_rgb[lod - 1].to_rgb(x)
    x = gen.decode_block[lod](x, styles[:, 2 * lod], styles[:, 2 * lod + 1])
    x = gen.to_rgb[lod].to_rgb(x)
    x_prev = F.interpolate(x_prev, size=2 ** (lod + 2))  # default nearest
    return torch.lerp(x_prev, x, blend)


def t_generate(gen, fl, z, lod, blend):
    """model.generate with mixing off, truncation off, dlatent_avg off
    (model.py:159-206 at style_mixing_prob=None, no_truncation=True)."""
    s = t_mapping_fl(fl, z)
    styles = s.unsqueeze(1).repeat(1, 2 * LAYERS, 1)
    return t_generator_fwd(gen, styles, lod, blend)


def t_encode(enc, tl, x, lod, blend, eps):
    """model.encode (model.py:208-213) with injected eps."""
    y = t_mapping_tl(tl, t_encoder_fwd(enc, x, lod, blend))
    mu, logvar = y[:, 0], y[:, 1]
    z = mu + eps * torch.exp(0.5 * logvar)
    return z, mu, logvar


def t_kl(logvar, mu, reduce):
    kl = -0.5 * (1 + logvar - mu.pow(2) - logvar.exp()).sum(1)
    return kl.mean() if reduce == "mean" else kl


def t_mse(x, r, reduction):
    e = F.mse_loss(r.flatten(1), x.flatten(1), reduction="none").sum(1)
    return e.mean() if reduction == "mean" else e


def t_lossE(nets, x, lod, blend, nz):
    """model.py:215-263 with injected noise."""
    enc, gen, tl, fl = nets
    fake = t_generate(gen, fl, nz["noise"], lod, blend)
    z_real, mu, logvar = t_encode(enc, tl, x, lod, blend, nz["eps_real"])
    rec = t_generate(gen, fl, z_real, lod, blend)
    loss_rec = t_mse(x, rec, "mean")
    kl_real = t_kl(logvar, mu, "mean")
    z_rec, mu_r, lv_r = t_encode(enc, tl, rec.detach(), lod, blend, nz["eps_e_rec"])
    rec_rec = t_generate(gen, fl, z_rec, lod, blend)
    z_fake, mu_f, lv_f = t_encode(enc, tl, fake.detach(), lod, blend, nz["eps_e_fake"])
    rec_fake = t_generate(gen, fl, z_fake, lod, blend)
    kl_rec = t_kl(lv_r, mu_r, "none")
    kl_fake = t_kl(lv_f, mu_f, "none")
    lrr = t_mse(rec, rec_rec, "none")  # rec NOT detached here (model.py:244)
    lrf = t_mse(fake, rec_fake, "none")
    exp_r = (-2 * SCALE * (BETAS["beta_rec"] * lrr + BETAS["beta_neg"] * kl_rec)).exp().mean()
    exp_f = (-2 * SCALE * (BETAS["beta_rec"] * lrf + BETAS["beta_neg"] * kl_fake)).exp().mean()
    return SCALE * (BETAS["beta_rec"] * loss_rec + BETAS["beta_kl"] * kl_real) + 0.25 * (exp_r + exp_f), z_real


def t_lossD(nets, x, lod, blend, nz, z_real):
    """model.py:265-299 with injected noise (encoder already E-stepped)."""
    enc, gen, tl, fl = nets
    fake = t_generate(gen, fl, nz["noise_d"], lod, blend)
    rec = t_generate(gen, fl, z_real.detach(), lod, blend)
    loss_rec = t_mse(x, rec, "mean")
    z_rec, mu_r, lv_r = t_encode(enc, tl, rec, lod, blend, nz["eps_d_rec"])
    z_fake, mu_f, lv_f = t_encode(enc, tl, fake, lod, blend, nz["eps_d_fake"])
    rec_rec = t_generate(gen, fl, z_rec.detach(), lod, blend)
    rec_fake = t_generate(gen, fl, z_fake.detach(), lod, blend)
    loss_rec_rec = t_mse(rec.detach(), rec_rec, "mean")
    loss_fake_rec = t_mse(fake.detach(), rec_fake, "mean")
    kl_rec = t_kl(lv_r, mu_r, "mean")
    kl_fake = t_kl(lv_f, mu_f, "mean")
    return SCALE * (loss_rec * BETAS["beta_rec"]
                    + (kl_rec + kl_fake) * 0.5 * BETAS["beta_kl"]
                    + BETAS["gamma_r"] * 0.5 * BETAS["beta_rec"] * (loss_rec_rec + loss_fake_rec))


def t_loss_vanilla(nets, x, lod, blend, nz):
    """model.py:300-318 (unscaled ELBO)."""
    enc, gen, tl, fl = nets
    z_real, mu, logvar = t_encode(enc, tl, x, lod, blend, nz["eps_real"])
    rec = t_generate(gen, fl, z_real, lod, blend)
    return BETAS["beta_rec"] * t_mse(x, rec, "mean") + BETAS["beta_kl"] * t_kl(logvar, mu, "mean")


# ------------------------------------------------- implicit-lreq coef tags --
def _tag(layer, gain=SQRT2, lrmul=1.0):
    """Attach lr_equalization_coef exactly as implicit-mode lreq layers do
    (lreq.py:70-75,128-133): weight coef = gain/sqrt(fan_in)*lrmul, bias
    coef = lrmul."""
    w = layer.weight
    fan = w.shape[1] * (w.shape[2] * w.shape[3] if w.dim() == 4 else 1)
    w.lr_equalization_coef = gain / math.sqrt(fan) * lrmul
    if layer.bias is not None:
        layer.bias.lr_equalization_coef = lrmul


def tag_all(enc, gen, tl, fl):
    for fr in enc.from_rgb:
        _tag(fr.from_rgb)
    for blk in enc.encode_block:
        _tag(blk.conv_1)
        _tag(blk.conv_2)
        _tag(blk.style_1)
        _tag(blk.style_2)
    for blk in gen.decode_block:
        if blk.has_first_conv:
            _tag(blk.conv_1)
        _tag(blk.conv_2)
        _tag(blk.style_1, gain=1.0)  # net.py:148,154: style linears gain=1
        _tag(blk.style_2, gain=1.0)
    for rgb in gen.to_rgb:
        _tag(rgb.to_rgb, gain=0.03)  # net.py:228
    for m in (tl, fl):
        for blk in m.map_blocks:
            _tag(blk, lrmul=0.1)  # MappingBlock lrmul=0.1 (net.py:713,764)


class TLREQAdam:
    """custom_adam.py:22-97: beta1=0, no first moment, bias-corrected step
    size, per-param lr_equalization_coef scaling."""

    def __init__(self, params, lr, beta2=0.99, eps=1e-8):
        self.params = [p for p in params if p.requires_grad or True]
        self.lr, self.b2, self.eps = lr, beta2, eps
        self.v = [torch.zeros_like(p) for p in self.params]
        self.t = 0

    def zero_grad(self):
        for p in self.params:
            p.grad = None

    def step(self):
        self.t += 1
        bc2 = math.sqrt(1.0 - self.b2 ** self.t)
        with torch.no_grad():
            for p, v in zip(self.params, self.v):
                if p.grad is None:
                    continue
                g = p.grad
                v.mul_(self.b2).addcmul_(g, g, value=1.0 - self.b2)
                denom = v.sqrt() + self.eps
                step_size = self.lr * bc2 * getattr(p, "lr_equalization_coef", 1.0)
                p.addcdiv_(g, denom, value=-step_size)


def _set_grad(module, val):
    for p in module.parameters():
        p.requires_grad = val


def torch_double_step(nets, opt_e, opt_d, x, lod, blend, nz):
    enc, gen, tl, fl = nets
    _set_grad(enc, True), _set_grad(tl, True), _set_grad(gen, False), _set_grad(fl, False)
    lossE, z_real = t_lossE(nets, x, lod, blend, nz)
    opt_e.zero_grad()
    lossE.backward()
    opt_e.step()
    _set_grad(enc, False), _set_grad(tl, False), _set_grad(gen, True), _set_grad(fl, True)
    lossD = t_lossD(nets, x, lod, blend, nz, z_real)
    opt_d.zero_grad()
    lossD.backward()
    opt_d.step()
    return float(lossE), float(lossD)


# -------------------------------------------------------------------- test --
def _build_pair(seed):
    """(torch nets, jax state + model) with identical converter-loaded weights."""
    enc, gen, tl, fl = TEncoder(), TGenerator(), TMap(3, 2 * LATENT), TMap(5, LATENT)
    for i, m in enumerate((enc, gen, tl, fl)):
        _randomize(m, seed + i)
    tag_all(enc, gen, tl, fl)

    params_e = {"encoder": convert_style_encoder(enc.state_dict(), LAYERS, STARTF, MAXF),
                "mapping_tl": convert_mapping(tl.state_dict(), 3, bare_linear=True)}
    params_d = {"decoder": convert_style_generator(gen.state_dict(), LAYERS, STARTF, MAXF),
                "mapping_fl": convert_mapping(fl.state_dict(), 5, bare_linear=True)}
    jt = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    params_e, params_d = jt(params_e), jt(params_d)
    buffers = {"dlatent_avg": jnp.zeros((2 * LAYERS, LATENT), jnp.float32)}

    mc = StyleModelConfig(startf=STARTF, maxf=MAXF, layer_count=LAYERS,
                          latent_size=LATENT, mapping_layers=5, channels=CH,
                          dlatent_avg_beta=None, style_mixing_prob=None,
                          truncation_psi=None)
    model = StyleModel(mc)
    opt = scale_by_lreq_adam(beta2=0.99)
    cp = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)  # donation: no aliasing
    state = StyleTrainState(
        step=jnp.zeros([], jnp.int32), params_e=params_e, params_d=params_d,
        buffers=buffers, ema_e=cp(params_e), ema_d=cp(params_d), ema_buffers=cp(buffers),
        opt_e=opt.init(params_e), opt_d=opt.init(params_d),
        lr=jnp.asarray(LR, jnp.float32), ema_beta=jnp.asarray(1.0, jnp.float32),
        rng=jax.random.key(0),
    )
    return (enc, gen, tl, fl), model, opt, state


def _noise(rs):
    keys = ["eps_real", "eps_e_rec", "eps_e_fake", "eps_d_rec", "eps_d_fake", "noise", "noise_d"]
    return {k: rs.randn(B, LATENT).astype(np.float32) for k in keys}


@pytest.mark.parametrize("lod,blend", [(1, None), (2, 0.6)],
                         ids=["lod1-stable", "lod2-blend"])
def test_style_intro_step_matches_torch(lod, blend):
    nets, model, opt, state = _build_pair(40)
    opt_e = TLREQAdam(list(nets[0].parameters()) + list(nets[2].parameters()), LR)
    opt_d = TLREQAdam(list(nets[1].parameters()) + list(nets[3].parameters()), LR)

    scfg = StyleStepConfig(latent_size=LATENT, scale=SCALE, **BETAS)
    _, intro = build_style_steps(model, scfg, lod, blended=blend is not None,
                                 optimizer=opt, noise_mode="none")
    res = 2 ** (lod + 2)
    rs = np.random.RandomState(97)
    for step_i in range(2):
        x_np = rs.rand(B, res, res, CH).astype(np.float32) * 2.0 - 1.0
        nz_np = _noise(rs)
        lossE_t, lossD_t = torch_double_step(
            nets, opt_e, opt_d,
            torch.tensor(x_np.transpose(0, 3, 1, 2)), lod,
            None if blend is None else torch.tensor(blend),
            {k: torch.tensor(v) for k, v in nz_np.items()},
        )
        bj = jnp.asarray(1.0 if blend is None else blend, jnp.float32)
        state, m = intro(state, jnp.asarray(x_np), bj,
                         {k: jnp.asarray(v) for k, v in nz_np.items()})
        assert float(m["loss_e"]) == pytest.approx(lossE_t, rel=2e-3, abs=1e-5), f"step {step_i} lossE"
        assert float(m["loss_d"]) == pytest.approx(lossD_t, rel=2e-3, abs=1e-6), f"step {step_i} lossD"


def test_style_vanilla_step_matches_torch():
    nets, model, opt, state = _build_pair(50)
    opt_e = TLREQAdam(list(nets[0].parameters()) + list(nets[2].parameters()), LR)
    opt_d = TLREQAdam(list(nets[1].parameters()) + list(nets[3].parameters()), LR)
    lod = 1
    scfg = StyleStepConfig(latent_size=LATENT, scale=SCALE, **BETAS)
    vanilla, _ = build_style_steps(model, scfg, lod, blended=False,
                                   optimizer=opt, noise_mode="none")
    res = 2 ** (lod + 2)
    rs = np.random.RandomState(98)
    for step_i in range(2):
        x_np = rs.rand(B, res, res, CH).astype(np.float32) * 2.0 - 1.0
        nz_np = _noise(rs)
        # torch: single combined step over all four subnets (model.py:300-318,
        # train_style_soft_intro_vae.py:349-357 steps both optimizers)
        for mdl in nets:
            _set_grad(mdl, True)
        loss_t = t_loss_vanilla(nets, torch.tensor(x_np.transpose(0, 3, 1, 2)),
                                lod, None, {k: torch.tensor(v) for k, v in nz_np.items()})
        opt_e.zero_grad()
        opt_d.zero_grad()
        loss_t.backward()
        opt_e.step()
        opt_d.step()
        state, m = vanilla(state, jnp.asarray(x_np), jnp.asarray(1.0, jnp.float32),
                           {k: jnp.asarray(v) for k, v in nz_np.items()})
        assert float(m["loss_e"]) == pytest.approx(float(loss_t.detach()), rel=2e-3), f"step {step_i}"
