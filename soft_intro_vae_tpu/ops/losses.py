"""Core loss math for Soft-IntroVAE, written for XLA fusion on TPU.

Semantics mirror the reference implementation (behavior parity, new code):
  * KL:   /root/reference/soft_intro_vae/train_soft_intro_vae.py:231-251
  * reparameterize: same file :254-265
  * reconstruction: same file :268-294 (and the 2D variant
    /root/reference/soft_intro_vae_2d/train_soft_intro_vae_2d.py:261-287)
  * expELBO: same file :580-581

Everything here is a pure function of arrays -> arrays; all of it is intended
to be called inside a single jitted train step so XLA fuses the elementwise
chains into the surrounding matmul/conv epilogues. Loss scalars are computed
in float32 regardless of the network compute dtype (bf16-safe).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

Array = jax.Array
Scalar = Union[float, Array]

_REDUCTIONS = ("sum", "mean", "none")


def _reduce(x: Array, reduction: str) -> Array:
    if reduction == "sum":
        return jnp.sum(x)
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "none":
        return x
    raise NotImplementedError(f"unknown reduction: {reduction!r}")


def kl_divergence(
    mu: Array,
    logvar: Array,
    mu_o: Scalar = 0.0,
    logvar_o: Scalar = 0.0,
    reduce: str = "sum",
) -> Array:
    """KL(N(mu, e^logvar) || N(mu_o, e^logvar_o)), summed over latent dims.

    The general-prior form of the reference (train_soft_intro_vae.py:245-246);
    with the defaults it reduces to the standard-normal-prior special case used
    by the 2D variant (train_soft_intro_vae_2d.py:290-308).

    Returns a (B,) vector for reduce='none', else a scalar.
    """
    if reduce not in _REDUCTIONS:
        raise NotImplementedError(f"unknown reduce: {reduce!r}")
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * jnp.sum(
        1.0
        + logvar
        - logvar_o
        - jnp.exp(logvar - logvar_o)
        - jnp.square(mu - mu_o) * jnp.exp(-jnp.asarray(logvar_o, jnp.float32)),
        axis=-1,
    )
    return _reduce(kl, reduce)


def reparameterize(rng: jax.Array, mu: Array, logvar: Array) -> Array:
    """z = mu + eps * exp(0.5*logvar), eps ~ N(0, I).

    Reference: train_soft_intro_vae.py:254-265.
    """
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mu.shape, dtype=jnp.float32)
    return mu.astype(jnp.float32) + eps * std


def reconstruction_loss(
    x: Array,
    x_rec: Array,
    loss_type: str = "mse",
    reduction: str = "sum",
) -> Array:
    """Reconstruction error with reference-exact reduction semantics.

    Reference: train_soft_intro_vae.py:268-294. Quirks reproduced on purpose:
      * 'mse' sums squared error over feature dims first -> per-sample (B,),
        then applies `reduction` over the batch.
      * 'l1' / 'bce' apply `reduction` *elementwise* over all entries
        (torch F.l1_loss / F.binary_cross_entropy semantics), so
        reduction='none' returns (B, D) and 'mean' averages over all elements.
        Callers that need per-sample values sum trailing dims themselves, as
        the reference trainers do (train_soft_intro_vae.py:574-578).
    """
    if reduction not in _REDUCTIONS:
        raise NotImplementedError(f"unknown reduction: {reduction!r}")
    b = x.shape[0]
    x = x.reshape(b, -1).astype(jnp.float32)
    x_rec = x_rec.reshape(b, -1).astype(jnp.float32)
    if loss_type == "mse":
        err = jnp.sum(jnp.square(x_rec - x), axis=1)
        return _reduce(err, reduction)
    if loss_type == "l1":
        err = jnp.abs(x_rec - x)
        return _reduce(err, reduction)
    if loss_type == "bce":
        eps = 1e-12  # torch clamps log terms; keep numerics finite
        p = jnp.clip(x_rec, eps, 1.0 - eps)
        err = -(x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p))
        return _reduce(err, reduction)
    raise NotImplementedError(f"unknown loss_type: {loss_type!r}")


def per_sample_recon(x: Array, x_rec: Array, loss_type: str = "mse") -> Array:
    """Per-sample reconstruction error (B,), the expELBO ingredient.

    Equivalent to reduction='none' followed by the reference trainers'
    `while ndim > 1: sum(-1)` loop (train_soft_intro_vae.py:573-578).
    """
    err = reconstruction_loss(x, x_rec, loss_type=loss_type, reduction="none")
    while err.ndim > 1:
        err = jnp.sum(err, axis=-1)
    return err


def exp_elbo(
    rec_per_sample: Array,
    kl_per_sample: Array,
    scale: Scalar,
    beta_rec: Scalar,
    beta_neg: Scalar,
) -> Array:
    """mean_i exp(-2*scale*(beta_rec*rec_i + beta_neg*kl_i)).

    The soft "push away" term of Soft-IntroVAE
    (train_soft_intro_vae.py:580-581). Computed in float32: the exponent can
    reach large negative magnitudes (underflow to 0 is fine and expected).
    """
    arg = -2.0 * scale * (beta_rec * rec_per_sample + beta_neg * kl_per_sample)
    return jnp.mean(jnp.exp(arg.astype(jnp.float32)))
