"""The generic introspective (Soft-IntroVAE) train step, TPU-first.

One factory covers all reference variants; they differ only in networks,
reconstruction loss, prior, and a handful of detach/ordering flags (see
``StepConfig``). Each step compiles to a SINGLE donated-buffer XLA program:
E-phase grad + Adam update, then D-phase grad + Adam update — the reference's
12 forwards + 2 backwards per iteration (SURVEY §3.1) fused and scheduled by
XLA with no host round-trips.

Reference semantics encoded here (file:line into /root/reference):
  * E-step: soft_intro_vae/train_soft_intro_vae.py:551-589
      detach points: rec.detach()/fake.detach() at the encode inputs
      (:567-568); the expELBO recon *target* ``rec`` is NOT detached
      (:573) — gradient reaches the encoder through the target.
  * D-step: :591-624 — z from the E-phase reused (:598), z_rec/z_fake
      detached into the extra decodes (:607-608), recon targets detached
      (:610-613).
  * 3D deltas: soft_intro_vae_3d/train_soft_intro_vae_3d.py:268-354 —
      narrow prior (logvar_o), prior_std-scaled noise, E-step expELBO
      targets detached (:293), D-step re-samples z with fresh eps under
      no_grad (:318-320).
  * bootstrap deltas: soft_intro_vae_bootstrap/train_soft_intro_vae_bootstrap.py
      — E-step full-forwards and D-step extra decodes use the frozen TARGET
      decoder; z_rec/z_fake NOT detached into it (:635-636); D-step recon
      targets NOT detached; vanilla-phase rec comes from the target decoder.
  * vanilla warm-up: train_soft_intro_vae.py:512-540 (unscaled ELBO, joint
      E+D update).

BatchNorm fidelity: in torch, frozen subnets still update BN running stats on
every forward (train mode). Stats collections are threaded through every
forward in reference order, so running statistics evolve identically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.ops.chamfer import chamfer_distance
from soft_intro_vae_tpu.ops.losses import (
    exp_elbo,
    kl_divergence,
    per_sample_recon,
    reconstruction_loss,
)
from soft_intro_vae_tpu.train.optim import apply_updates_with_lr
from soft_intro_vae_tpu.train.state import TrainState

Array = jax.Array
sg = jax.lax.stop_gradient

# encode(params, stats, x) -> ((mu, logvar), stats')
EncodeFn = Callable[[Any, Any, Array], Tuple[Tuple[Array, Array], Any]]
# decode(params, stats, z) -> (y, stats')
DecodeFn = Callable[[Any, Any, Array], Tuple[Array, Any]]


@dataclasses.dataclass(frozen=True)
class StepConfig:
    z_dim: int
    beta_rec: float = 1.0
    beta_kl: float = 1.0
    beta_neg: float = 1.0
    gamma_r: float = 1e-8
    scale: float = 1.0            # 1/(C*H*W) images; 0.5 2D; 1/(3N) 3D
    loss_type: str = "mse"        # mse | l1 | bce | chamfer
    prior_logvar: float = 0.0     # 3D: log(prior_std**2)
    prior_std: float = 1.0        # std of the z noise fed to the decoder
    fresh_z_in_d: bool = False    # 3D: re-sample z with fresh eps in D-phase
    detach_expelbo_targets: bool = False  # 3D: detach rec/fake expELBO targets
    bootstrap: bool = False       # use frozen target decoder (see module doc)
    chamfer_impl: str = "auto"    # auto | xla | pallas


def _make_recon_fns(loss_type: str, chamfer_impl: str = "auto"):
    if loss_type == "chamfer":
        if chamfer_impl == "auto":
            try:
                chamfer_impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
            except Exception:
                chamfer_impl = "xla"
        if chamfer_impl == "pallas":
            from soft_intro_vae_tpu.ops.chamfer_pallas import chamfer_distance_pallas

            def chamfer_fn(a, b):
                return chamfer_distance_pallas(a, b, 256)
        else:
            chamfer_fn = chamfer_distance

        # 3D trainer shifts both clouds by +0.5 before chamfer
        # (train_soft_intro_vae_3d.py:226,280) — distance-invariant, kept for
        # numeric parity.
        def per_sample(x, r):
            return chamfer_fn(r + 0.5, x + 0.5)

        def mean_fn(x, r):
            return jnp.mean(per_sample(x, r))

    else:
        def per_sample(x, r):
            return per_sample_recon(x, r, loss_type)

        def mean_fn(x, r):
            return reconstruction_loss(x, r, loss_type, "mean")

    return mean_fn, per_sample


def _reparam(eps: Array, mu: Array, logvar: Array) -> Array:
    return mu.astype(jnp.float32) + eps * jnp.exp(0.5 * logvar.astype(jnp.float32))


def build_train_steps(
    *,
    encode: EncodeFn,
    decode: DecodeFn,
    optimizer,  # optax GradientTransformation (lr-less; see train.optim.adam)
    cfg: StepConfig,
    decode_target: Optional[DecodeFn] = None,
    donate: bool = True,
    scan_steps: int = 1,
    input_lut=None,
):
    """Returns ``(vanilla_step, intro_step)``, each jitted:
    ``step(state: TrainState, x: Array) -> (TrainState, metrics: dict)``.

    With ``scan_steps > 1`` the signature becomes
    ``step(state, xs: (K, B, ...)) -> (state, metrics: (K,) each)`` — K exact
    reference steps fused into one XLA program (one device launch).

    ``input_lut`` (a 256-entry float table, e.g. ``arange(256)/255``) lets the
    step accept RAW uint8 batches and normalize them INSIDE the compiled
    program via a LUT gather — the H2D feed ships source bytes (4x fewer than
    f32) and the separate on-device normalize launch disappears (on the
    tunneled TPU host each extra dispatch costs a round-trip; see
    data/prefetch.py normalizing_put_fn for the standalone variant). The
    gather reproduces host numpy normalization BIT-EXACTLY (TPU f32 division
    is reciprocal-based and 1 ULP off), so training traces are identical to
    feeding pre-normalized f32 — pinned by tests/test_uint8_pipeline.py.
    Float inputs pass through untouched (dtype is a static trace-time check).
    """
    if cfg.bootstrap and decode_target is None:
        raise ValueError("bootstrap=True requires decode_target")
    if input_lut is not None:
        import numpy as np

        lut_host = np.asarray(input_lut, np.float32)
        if lut_host.shape != (256,):
            raise ValueError(f"input_lut must have shape (256,), got {lut_host.shape}")
        if np.array_equal(lut_host,
                          np.arange(256, dtype=np.uint8).astype(np.float32)
                          / np.float32(255)):
            # canonical unit table: use the gather-free bit-exact construction
            # (ops/u8norm.py) — the 256-entry gather costs ~0.9 ms/step on the
            # CIFAR north-star program (XLA:TPU lowers small-table gathers
            # through the scalar path; BENCH_NOTES.md "Feed gap")
            from soft_intro_vae_tpu.ops.u8norm import u8_to_unit_f32

            def _norm(x: Array) -> Array:
                return u8_to_unit_f32(x) if x.dtype == jnp.uint8 else x
        else:
            _lut = jnp.asarray(lut_host)

            def _norm(x: Array) -> Array:
                return _lut[x.astype(jnp.int32)] if x.dtype == jnp.uint8 else x
    else:
        def _norm(x: Array) -> Array:
            return x
    recon_mean, recon_per_sample = _make_recon_fns(cfg.loss_type, cfg.chamfer_impl)
    kl_mean = partial(kl_divergence, logvar_o=cfg.prior_logvar, reduce="mean")
    kl_none = partial(kl_divergence, logvar_o=cfg.prior_logvar, reduce="none")

    # ---------------- vanilla VAE warm-up step ----------------
    def vanilla_step(state: TrainState, x: Array):
        x = _norm(x)
        k = jax.random.fold_in(state.rng, state.step)
        eps = jax.random.normal(jax.random.fold_in(k, 0), (x.shape[0], cfg.z_dim), jnp.float32)

        def loss_fn(params_e, params_d):
            (mu, logvar), se = encode(params_e, state.stats_e, x)
            z = _reparam(eps, mu, logvar)
            if cfg.bootstrap:
                # bootstrap vanilla reconstructs through the frozen target
                # decoder (bootstrap model.forward target=True default), so
                # the online decoder receives zero gradient in this phase.
                rec, sdt = decode_target(state.params_d_target, state.stats_d_target, z)
                sd = state.stats_d
            else:
                rec, sd = decode(params_d, state.stats_d, z)
                sdt = state.stats_d_target
            loss_rec = recon_mean(x, rec)
            loss_kl = kl_mean(mu, logvar)
            loss = cfg.beta_rec * loss_rec + cfg.beta_kl * loss_kl  # unscaled (:527)
            aux = dict(stats=(se, sd, sdt), rec=loss_rec, kl=loss_kl)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params_e, state.params_d
        )
        g_e, g_d = grads
        upd_e, opt_e = optimizer.update(g_e, state.opt_e, state.params_e)
        upd_d, opt_d = optimizer.update(g_d, state.opt_d, state.params_d)
        params_e = apply_updates_with_lr(state.params_e, upd_e, state.lr_e)
        params_d = apply_updates_with_lr(state.params_d, upd_d, state.lr_d)
        se, sd, sdt = aux["stats"]
        new_state = state.replace(
            step=state.step + 1,
            params_e=params_e,
            params_d=params_d,
            stats_e=se,
            stats_d=sd,
            stats_d_target=sdt,
            opt_e=opt_e,
            opt_d=opt_d,
        )
        metrics = dict(loss=loss, rec=aux["rec"], kl_real=aux["kl"])
        return new_state, metrics

    # ---------------- introspective two-phase step ----------------
    def intro_step(state: TrainState, x: Array, noises=None):
        """``noises``: optional dict overriding the step's random draws
        (keys: noise, eps_real, eps_e_rec, eps_e_fake, eps_d_z, eps_d_rec,
        eps_d_fake) — the golden-value parity hook (SURVEY §7: inject
        identical noise into reference and rebuild, compare losses)."""
        x = _norm(x)
        b = x.shape[0]
        k = jax.random.fold_in(state.rng, state.step)
        ks = jax.random.split(k, 7)
        nv = noises or {}

        def draw(name, i, scale=1.0):
            if name in nv:
                return jnp.asarray(nv[name], jnp.float32)
            return scale * jax.random.normal(ks[i], (b, cfg.z_dim), jnp.float32)

        noise = draw("noise", 0, cfg.prior_std)
        eps_real = draw("eps_real", 1)
        eps_e_rec = draw("eps_e_rec", 2)
        eps_e_fake = draw("eps_e_fake", 3)
        eps_d_z = draw("eps_d_z", 4)
        eps_d_rec = draw("eps_d_rec", 5)
        eps_d_fake = draw("eps_d_fake", 6)

        # ===================== E phase =====================
        def lossE_fn(params_e):
            se, sd, sdt = state.stats_e, state.stats_d, state.stats_d_target
            fake, sd = decode(state.params_d, sd, noise)
            (mu, logvar), se = encode(params_e, se, x)
            z = _reparam(eps_real, mu, logvar)
            rec, sd = decode(state.params_d, sd, z)

            loss_rec = recon_mean(x, rec)
            kl_real = kl_mean(mu, logvar)

            # full forwards on detached decoder outputs (:567-568)
            (rmu, rlv), se = encode(params_e, se, sg(rec))
            z_r = _reparam(eps_e_rec, rmu, rlv)
            (fmu, flv), se = encode(params_e, se, sg(fake))
            z_f = _reparam(eps_e_fake, fmu, flv)
            if cfg.bootstrap:
                rec_rec, sdt = decode_target(state.params_d_target, sdt, z_r)
                rec_fake, sdt = decode_target(state.params_d_target, sdt, z_f)
            else:
                rec_rec, sd = decode(state.params_d, sd, z_r)
                rec_fake, sd = decode(state.params_d, sd, z_f)

            kl_rec = kl_none(rmu, rlv)
            kl_fake = kl_none(fmu, flv)
            # the expELBO recon targets: NOT detached in image/2D (:573 —
            # gradient reaches the encoder through z inside ``rec``); the 3D
            # variant detaches them (3d:293).
            tgt_rec = sg(rec) if cfg.detach_expelbo_targets else rec
            rr = recon_per_sample(tgt_rec, rec_rec)
            rf = recon_per_sample(fake, rec_fake)  # fake has no E-grad path
            expelbo_rec = exp_elbo(rr, kl_rec, cfg.scale, cfg.beta_rec, cfg.beta_neg)
            expelbo_fake = exp_elbo(rf, kl_fake, cfg.scale, cfg.beta_rec, cfg.beta_neg)

            lossE = cfg.scale * (cfg.beta_rec * loss_rec + cfg.beta_kl * kl_real) + 0.25 * (
                expelbo_rec + expelbo_fake
            )
            aux = dict(
                stats=(se, sd, sdt),
                mu=mu,
                logvar=logvar,
                z=z,
                rec=loss_rec,
                kl_real=kl_real,
                expelbo_r=expelbo_rec,
                expelbo_f=expelbo_fake,
            )
            return lossE, aux

        (lossE, auxE), g_e = jax.value_and_grad(lossE_fn, has_aux=True)(state.params_e)
        upd_e, opt_e = optimizer.update(g_e, state.opt_e, state.params_e)
        params_e = apply_updates_with_lr(state.params_e, upd_e, state.lr_e)
        se, sd, sdt = auxE["stats"]

        # ===================== D phase =====================
        # Uses the UPDATED encoder (reference steps optimizer_e first, :589)
        # and the same noise batch (:597).
        if cfg.fresh_z_in_d:
            z_d = sg(_reparam(eps_d_z, sg(auxE["mu"]), sg(auxE["logvar"])))  # 3d:318-320
        else:
            z_d = sg(auxE["z"])  # :598

        def lossD_fn(params_d):
            se2, sd2, sdt2 = se, sd, sdt
            fake, sd2 = decode(params_d, sd2, noise)
            rec, sd2 = decode(params_d, sd2, z_d)
            loss_rec = recon_mean(x, rec)

            (rmu, rlv), se2 = encode(params_e, se2, rec)    # rec NOT detached
            z_rec = _reparam(eps_d_rec, rmu, rlv)
            (fmu, flv), se2 = encode(params_e, se2, fake)   # fake NOT detached
            z_fake = _reparam(eps_d_fake, fmu, flv)

            if cfg.bootstrap:
                # frozen target decoder, z NOT detached (bootstrap:635-636)
                rec_rec, sdt2 = decode_target(state.params_d_target, sdt2, z_rec)
                rec_fake, sdt2 = decode_target(state.params_d_target, sdt2, z_fake)
                tgt_r, tgt_f = rec, fake  # NOT detached in bootstrap
            else:
                rec_rec, sd2 = decode(params_d, sd2, sg(z_rec))   # :607-608
                rec_fake, sd2 = decode(params_d, sd2, sg(z_fake))
                tgt_r, tgt_f = sg(rec), sg(fake)                  # :610-613

            loss_rec_rec = recon_mean(tgt_r, rec_rec)
            loss_fake_rec = recon_mean(tgt_f, rec_fake)
            kl_rec = kl_mean(rmu, rlv)
            kl_fake = kl_mean(fmu, flv)

            lossD = cfg.scale * (
                cfg.beta_rec * loss_rec
                + 0.5 * cfg.beta_kl * (kl_rec + kl_fake)
                + cfg.gamma_r * 0.5 * cfg.beta_rec * (loss_rec_rec + loss_fake_rec)
            )
            aux = dict(
                stats=(se2, sd2, sdt2),
                rec=loss_rec,
                kl_rec=kl_rec,
                kl_fake=kl_fake,
            )
            return lossD, aux

        (lossD, auxD), g_d = jax.value_and_grad(lossD_fn, has_aux=True)(state.params_d)
        upd_d, opt_d = optimizer.update(g_d, state.opt_d, state.params_d)
        params_d = apply_updates_with_lr(state.params_d, upd_d, state.lr_d)
        se2, sd2, sdt2 = auxD["stats"]

        new_state = state.replace(
            step=state.step + 1,
            params_e=params_e,
            params_d=params_d,
            stats_e=se2,
            stats_d=sd2,
            stats_d_target=sdt2,
            opt_e=opt_e,
            opt_d=opt_d,
        )
        metrics = dict(
            loss_e=lossE,
            loss_d=lossD,
            rec=auxD["rec"],
            kl_real=auxE["kl_real"],
            kl_rec=auxD["kl_rec"],
            kl_fake=auxD["kl_fake"],
            expelbo_r=auxE["expelbo_r"],
            expelbo_f=auxE["expelbo_f"],
            diff_kl=auxD["kl_fake"] - auxE["kl_real"],
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if scan_steps > 1:
        # amortize per-launch overhead: K reference-exact steps (each with its
        # own batch slice) fused into ONE compiled program via lax.scan
        def scan_wrap(core):
            def fn(state: TrainState, xs: Array):
                return jax.lax.scan(lambda s, x: core(s, x), state, xs)
            return fn

        return (
            jax.jit(scan_wrap(vanilla_step), donate_argnums=donate_argnums),
            jax.jit(scan_wrap(lambda s, x: intro_step(s, x)), donate_argnums=donate_argnums),
        )
    return (
        jax.jit(vanilla_step, donate_argnums=donate_argnums),
        jax.jit(intro_step, donate_argnums=donate_argnums),
    )
