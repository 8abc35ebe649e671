"""Style-SoftIntroVAE: composed model ops + per-LOD compiled train steps.

Capability parity with /root/reference/style_soft_intro_vae/model.py
(SoftIntroVAEModelTL): generate (style mixing, truncation, dlatent_avg
tracking — :159-206), encode through mapping_tl (:208-213), and the
loss-computing forward's three branches (E :215-263, D :265-299,
vanilla :300-318), including every detach point.

TPU-first: one jitted donated-buffer program per (lod, in_transition);
``blend`` is a traced scalar; the EMA pytree lerp runs inside the step
(replica-identical, so "rank-0 only" in the reference is moot here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from soft_intro_vae_tpu.models.style import (
    MappingFromLatent,
    MappingToLatent,
    StyleEncoder,
    StyleGenerator,
)
from soft_intro_vae_tpu.ops.losses import exp_elbo, kl_divergence, per_sample_recon, reconstruction_loss
from soft_intro_vae_tpu.train.optim import apply_updates_with_lr

Array = jax.Array
sg = jax.lax.stop_gradient


@dataclasses.dataclass(frozen=True)
class StyleModelConfig:
    startf: int = 32
    maxf: int = 256
    layer_count: int = 6
    latent_size: int = 256
    mapping_layers: int = 5
    channels: int = 3
    dlatent_avg_beta: Optional[float] = 0.995
    style_mixing_prob: Optional[float] = 0.9
    truncation_psi: Optional[float] = 0.7
    truncation_cutoff: int = 8
    # MODEL.ENCODER registry selection (defaults.py:60, net.py ENCODERS):
    # EncoderDefault | EncoderWithStatistics | EncoderWithFC
    encoder_variant: str = "EncoderDefault"
    # conv-path activation dtype ("bfloat16" halves the HBM traffic the
    # 128px+ step is bound by; IN stats/style heads/losses stay float32)
    compute_dtype: str = "float32"
    # jax.checkpoint the encoder/decoder forwards: the 12-forward
    # introspective step keeps only subnet boundaries live and recomputes
    # activations in backward — the memory lever for 512px+/large-batch
    # runs (256px bs=64 bf16 otherwise needs 23 GiB vs the 15.75 GiB v5e HBM)
    remat: bool = False
    # Pallas fused inject+bias+lrelu+IN(+AdaIN) kernel (ops/adain_pallas.py);
    # None = OFF — the measured A/B shows XLA's own fusion wins on current
    # TPUs (BENCH_NOTES.md); True / SIV_FUSED_NORM=1 opts in for re-evaluation
    fused_norm: Optional[bool] = None


class StyleModel:
    """Bundles the four subnets; all ops are pure functions of param trees.

    params_e = {'encoder', 'mapping_tl'}; params_d = {'decoder', 'mapping_fl'};
    buffers = {'dlatent_avg': (num_layers, latent)} (threaded like BN stats).
    """

    def __init__(self, mc: StyleModelConfig):
        self.mc = mc
        self.num_layers = 2 * mc.layer_count
        dtype = jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32
        kw = dict(startf=mc.startf, maxf=mc.maxf, layer_count=mc.layer_count,
                  latent_size=mc.latent_size, channels=mc.channels, dtype=dtype,
                  fused_norm=mc.fused_norm)
        if mc.encoder_variant not in ("EncoderDefault", "EncoderWithStatistics", "EncoderWithFC"):
            raise ValueError(f"unknown MODEL.ENCODER {mc.encoder_variant!r}")
        self.encoder = StyleEncoder(
            with_fc_head=mc.encoder_variant == "EncoderWithFC",
            last_block_dense=mc.encoder_variant == "EncoderWithStatistics", **kw)
        self.decoder = StyleGenerator(**kw)
        self.mapping_tl = MappingToLatent(latent_size=mc.latent_size, dlatent_size=mc.latent_size,
                                          mapping_fmaps=mc.latent_size, mapping_layers=3)
        self.mapping_fl = MappingFromLatent(num_layers=self.num_layers, latent_size=mc.latent_size,
                                            dlatent_size=mc.latent_size, mapping_fmaps=mc.latent_size,
                                            mapping_layers=mc.mapping_layers)
        self.layer_to_resolution = self.decoder.layer_to_resolution

    def init_params(self, rng: Array):
        mc = self.mc
        res = 2 ** (mc.layer_count + 1)
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        x = jnp.zeros((1, res, res, mc.channels))
        z = jnp.zeros((1, mc.latent_size))
        styles = jnp.zeros((1, self.num_layers, mc.latent_size))
        pe = self.encoder.init(k1, x, method=StyleEncoder.init_all)["params"]
        pd = self.decoder.init(k2, styles, k5, method=StyleGenerator.init_all)["params"]
        ptl = self.mapping_tl.init(k3, jnp.zeros((1, 1, mc.latent_size)))["params"]
        pfl = self.mapping_fl.init(k4, z)["params"]
        params_e = {"encoder": pe, "mapping_tl": ptl}
        params_d = {"decoder": pd, "mapping_fl": pfl}
        buffers = {"dlatent_avg": jnp.zeros((self.num_layers, mc.latent_size), jnp.float32)}
        return params_e, params_d, buffers

    # ----------------------------------------------------------- model ops --
    def encode(self, params_e, x, lod: int, blend, eps: Array):
        """(z, mu, logvar) — model.py:208-213. EncoderWithFC also returns an
        fc2 logit (net.py:399-404); only the styles feed mapping_tl (the
        reference's encode would not accept the tuple either — the fc head is
        an unused-by-configs ALAE leftover)."""

        def fwd(params_e, x, blend):
            styles = self.encoder.apply({"params": params_e["encoder"]}, x, lod, blend)
            if isinstance(styles, tuple):
                styles = styles[0]
            return self.mapping_tl.apply({"params": params_e["mapping_tl"]}, styles)

        if self.mc.remat:
            fwd = jax.checkpoint(fwd)
        y = fwd(params_e, x, blend)
        mu, logvar = y[:, 0, :], y[:, 1, :]
        z = mu + eps * jnp.exp(0.5 * logvar)
        return z, mu, logvar

    def generate(self, params_d, buffers, rng, lod: int, blend, z, *,
                 mixing: bool, truncation: bool = False, noise_mode: str = "batch",
                 update_avg: bool = True):
        """(rec, buffers') — model.py:159-206. ``rng`` drives decoder noise
        and style mixing; dlatent_avg tracks the style batch mean."""
        mc = self.mc
        k_noise, k_mix_p, k_mix_z, k_mix_cut = jax.random.split(rng, 4)
        s = self.mapping_fl.apply({"params": params_d["mapping_fl"]}, z)[:, 0]
        styles = jnp.repeat(s[:, None, :], self.num_layers, axis=1)

        new_buffers = buffers
        if mc.dlatent_avg_beta is not None and update_avg:
            batch_avg = sg(jnp.mean(styles, axis=0))
            avg = buffers["dlatent_avg"]
            new_buffers = {**buffers,
                           "dlatent_avg": avg + (batch_avg - avg) * (1.0 - mc.dlatent_avg_beta)}

        if mixing and mc.style_mixing_prob is not None:
            z2 = jax.random.normal(k_mix_z, z.shape, jnp.float32)
            s2 = self.mapping_fl.apply({"params": params_d["mapping_fl"]}, z2)[:, 0]
            styles2 = jnp.repeat(s2[:, None, :], self.num_layers, axis=1)
            cur_layers = (lod + 1) * 2
            cutoff = jax.random.randint(k_mix_cut, (), 1, cur_layers + 1)
            layer_idx = jnp.arange(self.num_layers)[None, :, None]
            mixed = jnp.where(layer_idx < cutoff, styles, styles2)
            do_mix = jax.random.uniform(k_mix_p, ()) < mc.style_mixing_prob
            styles = jnp.where(do_mix, mixed, styles)

        if truncation and mc.truncation_psi is not None:
            layer_idx = jnp.arange(self.num_layers)[None, :, None]
            coefs = jnp.where(layer_idx < mc.truncation_cutoff, mc.truncation_psi, 1.0)
            avg = new_buffers["dlatent_avg"][None]
            styles = avg + (styles - avg) * coefs

        def dec_fwd(dec_params, styles, k_noise, blend):
            return self.decoder.apply({"params": dec_params}, styles, lod, k_noise,
                                      blend, noise_mode)

        if self.mc.remat:
            dec_fwd = jax.checkpoint(dec_fwd)
        rec = dec_fwd(params_d["decoder"], styles, k_noise, blend)
        return rec, new_buffers


class StyleTrainState(struct.PyTreeNode):
    step: Array
    params_e: Any
    params_d: Any
    buffers: Any
    ema_e: Any
    ema_d: Any
    ema_buffers: Any
    opt_e: Any
    opt_d: Any
    lr: Array
    ema_beta: Array  # "betta" = 0.5 ** (global_batch / 10000)  (:400)
    rng: Array


@dataclasses.dataclass(frozen=True)
class StyleStepConfig:
    latent_size: int
    beta_rec: float = 1.0
    beta_kl: float = 1.0
    beta_neg: float = 256.0
    gamma_r: float = 1e-8
    scale: float = 1.0 / (3 * 256**2)


def _ema_update(ema, online, beta):
    return jax.tree_util.tree_map(lambda e, p: e + (p - e) * (1.0 - beta), ema, online)


def build_style_steps(model: StyleModel, cfg: StyleStepConfig, lod: int, blended: bool, optimizer,
                      noise_mode: str = "batch"):
    """(vanilla_step, intro_step) for one (lod, in_transition) pair.

    step(state, x, blend) -> (state', metrics). ``blend`` is traced; pass 1.0
    on the stable path (``blended=False`` compiles the no-blend program).

    ``noise_mode`` selects the decoder B-noise path ("batch" = fresh randn per
    call, the reference trainer's ``noise=True``; "none" = the deterministic
    correction term, net.py:176-178). Steps also take an optional ``nz`` dict
    of injected eps/z tensors (keys as drawn below) for golden-parity tests
    against a torch twin — when given, no latent noise is drawn from the
    state rng.
    """

    def _b(blend):
        return blend if blended else None

    def _keys(state, n):
        k = jax.random.fold_in(state.rng, state.step)
        return jax.random.split(k, n)

    def vanilla_step(state: StyleTrainState, x: Array, blend: Array, nz=None):
        ks = _keys(state, 2)
        eps = (jax.random.normal(ks[0], (x.shape[0], cfg.latent_size), jnp.float32)
               if nz is None else nz["eps_real"])

        def loss_fn(params_e, params_d):
            z, mu, logvar = model.encode(params_e, x, lod, _b(blend), eps)
            rec, buffers = model.generate(params_d, state.buffers, ks[1], lod, _b(blend), z,
                                          mixing=False, noise_mode=noise_mode)
            loss_rec = reconstruction_loss(x, rec, "mse", "mean")
            loss_kl = kl_divergence(mu, logvar, reduce="mean")
            loss = cfg.beta_rec * loss_rec + cfg.beta_kl * loss_kl  # unscaled (:317)
            return loss, dict(buffers=buffers, rec=loss_rec, kl=loss_kl)

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params_e, state.params_d)
        upd_e, opt_e = optimizer.update(grads[0], state.opt_e, state.params_e)
        upd_d, opt_d = optimizer.update(grads[1], state.opt_d, state.params_d)
        params_e = apply_updates_with_lr(state.params_e, upd_e, state.lr)
        params_d = apply_updates_with_lr(state.params_d, upd_d, state.lr)
        new_state = _finish(state, params_e, params_d, aux["buffers"], opt_e, opt_d)
        return new_state, dict(loss_e=loss, loss_d=loss, rec_loss=aux["rec"], real_kl=aux["kl"])

    def intro_step(state: StyleTrainState, x: Array, blend: Array, nz=None):
        b = x.shape[0]
        ks = _keys(state, 16)
        if nz is None:
            eps_real = jax.random.normal(ks[0], (b, cfg.latent_size), jnp.float32)
            eps_e_rec = jax.random.normal(ks[1], (b, cfg.latent_size), jnp.float32)
            eps_e_fake = jax.random.normal(ks[2], (b, cfg.latent_size), jnp.float32)
            eps_d_rec = jax.random.normal(ks[3], (b, cfg.latent_size), jnp.float32)
            eps_d_fake = jax.random.normal(ks[4], (b, cfg.latent_size), jnp.float32)
            # the style reference draws FRESH prior noise per phase: each
            # model.generate() call samples its own z (model.py:173-174), unlike
            # the image variant's shared noise_batch
            z_noise = jax.random.normal(ks[5], (b, cfg.latent_size), jnp.float32)
            z_noise_d = jax.random.normal(ks[10], (b, cfg.latent_size), jnp.float32)
        else:
            eps_real, eps_e_rec, eps_e_fake = nz["eps_real"], nz["eps_e_rec"], nz["eps_e_fake"]
            eps_d_rec, eps_d_fake = nz["eps_d_rec"], nz["eps_d_fake"]
            z_noise, z_noise_d = nz["noise"], nz["noise_d"]

        # ===== E phase (model.py:215-263) =====
        def lossE_fn(params_e):
            buffers = state.buffers
            fake, buffers = model.generate(state.params_d, buffers, ks[6], lod, _b(blend),
                                           z_noise, mixing=True, noise_mode=noise_mode)
            z_real, mu, logvar = model.encode(params_e, x, lod, _b(blend), eps_real)
            rec, buffers = model.generate(state.params_d, buffers, ks[7], lod, _b(blend),
                                          z_real, mixing=False, noise_mode=noise_mode)
            loss_rec = reconstruction_loss(x, rec, "mse", "mean")
            kl_real = kl_divergence(mu, logvar, reduce="mean")

            z_rec, rmu, rlv = model.encode(params_e, sg(rec), lod, _b(blend), eps_e_rec)
            rec_rec, buffers = model.generate(state.params_d, buffers, ks[8], lod, _b(blend),
                                              z_rec, mixing=False, noise_mode=noise_mode)
            z_fake, fmu, flv = model.encode(params_e, sg(fake), lod, _b(blend), eps_e_fake)
            rec_fake, buffers = model.generate(state.params_d, buffers, ks[9], lod, _b(blend),
                                               z_fake, mixing=False, noise_mode=noise_mode)
            kl_rec = kl_divergence(rmu, rlv, reduce="none")
            kl_fake = kl_divergence(fmu, flv, reduce="none")
            rr = per_sample_recon(rec, rec_rec, "mse")       # rec NOT detached (:244)
            rf = per_sample_recon(fake, rec_fake, "mse")
            expelbo_rec = exp_elbo(rr, kl_rec, cfg.scale, cfg.beta_rec, cfg.beta_neg)
            expelbo_fake = exp_elbo(rf, kl_fake, cfg.scale, cfg.beta_rec, cfg.beta_neg)
            lossE = cfg.scale * (cfg.beta_rec * loss_rec + cfg.beta_kl * kl_real) + \
                0.25 * (expelbo_rec + expelbo_fake)
            aux = dict(buffers=buffers, z_real=z_real, rec=loss_rec, kl_real=kl_real,
                       expelbo_r=expelbo_rec, expelbo_f=expelbo_fake)
            return lossE, aux

        (lossE, auxE), g_e = jax.value_and_grad(lossE_fn, has_aux=True)(state.params_e)
        upd_e, opt_e = optimizer.update(g_e, state.opt_e, state.params_e)
        params_e = apply_updates_with_lr(state.params_e, upd_e, state.lr)

        # ===== D phase (model.py:265-299) — updated encoder, fresh forwards =====
        def lossD_fn(params_d):
            buffers = auxE["buffers"]
            fake, buffers = model.generate(params_d, buffers, ks[11], lod, _b(blend),
                                           z_noise_d, mixing=True, noise_mode=noise_mode)
            rec, buffers = model.generate(params_d, buffers, ks[12], lod, _b(blend),
                                          sg(auxE["z_real"]), mixing=False, noise_mode=noise_mode)
            loss_rec = reconstruction_loss(x, rec, "mse", "mean")
            z_rec, rmu, rlv = model.encode(params_e, rec, lod, _b(blend), eps_d_rec)
            z_fake, fmu, flv = model.encode(params_e, fake, lod, _b(blend), eps_d_fake)
            rec_rec, buffers = model.generate(params_d, buffers, ks[13], lod, _b(blend),
                                              sg(z_rec), mixing=False, noise_mode=noise_mode)
            rec_fake, buffers = model.generate(params_d, buffers, ks[14], lod, _b(blend),
                                               sg(z_fake), mixing=False, noise_mode=noise_mode)
            loss_rec_rec = reconstruction_loss(sg(rec), rec_rec, "mse", "mean")
            loss_fake_rec = reconstruction_loss(sg(fake), rec_fake, "mse", "mean")
            kl_rec = kl_divergence(rmu, rlv, reduce="mean")
            kl_fake = kl_divergence(fmu, flv, reduce="mean")
            lossD = cfg.scale * (cfg.beta_rec * loss_rec
                                 + 0.5 * cfg.beta_kl * (kl_rec + kl_fake)
                                 + cfg.gamma_r * 0.5 * cfg.beta_rec * (loss_rec_rec + loss_fake_rec))
            return lossD, dict(buffers=buffers, rec=loss_rec, kl_rec=kl_rec, kl_fake=kl_fake)

        (lossD, auxD), g_d = jax.value_and_grad(lossD_fn, has_aux=True)(state.params_d)
        upd_d, opt_d = optimizer.update(g_d, state.opt_d, state.params_d)
        params_d = apply_updates_with_lr(state.params_d, upd_d, state.lr)

        new_state = _finish(state, params_e, params_d, auxD["buffers"], opt_e, opt_d)
        metrics = dict(
            loss_e=lossE, loss_d=lossD, rec_loss=auxD["rec"], real_kl=auxE["kl_real"],
            fake_kl=auxD["kl_fake"], kl_diff=auxD["kl_fake"] - auxE["kl_real"],
            expelbo_r=auxE["expelbo_r"], expelbo_f=auxE["expelbo_f"],
        )
        return new_state, metrics

    def _finish(state, params_e, params_d, buffers, opt_e, opt_d):
        ema_e = _ema_update(state.ema_e, params_e, state.ema_beta)
        ema_d = _ema_update(state.ema_d, params_d, state.ema_beta)
        ema_buffers = _ema_update(state.ema_buffers, buffers, state.ema_beta)
        return state.replace(
            step=state.step + 1, params_e=params_e, params_d=params_d, buffers=buffers,
            ema_e=ema_e, ema_d=ema_d, ema_buffers=ema_buffers, opt_e=opt_e, opt_d=opt_d,
        )

    return (
        jax.jit(vanilla_step, donate_argnums=(0,)),
        jax.jit(intro_step, donate_argnums=(0,)),
    )
