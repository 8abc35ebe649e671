# %% [markdown]
# # Soft-IntroVAE from scratch — Part 1: the 2D tutorial
#
# *A JAX/TPU re-telling of the reference tutorial*
# (`soft_intro_vae_tutorial/soft_intro_vae_2d_code_tutorial.ipynb`,
# Daniel & Tamar, ["Soft-IntroVAE: Analyzing and Improving the Introspective
# Variational Autoencoder"](https://arxiv.org/abs/2012.13253), CVPR 2021).
#
# This file is a **jupytext percent-format notebook**: run it top-to-bottom as
# a script (`python examples/tutorial_2d_toy.py`), open it in Jupyter, or read
# the generated `tutorial_2d_toy.ipynb` next to it. Everything the algorithm
# needs is (re)built inline in ~100 lines of JAX so you can see every moving
# part; the last section shows the two-line framework equivalent.
#
# **Agenda**
# 1. Variational Autoencoders: the ELBO and the reparameterization trick
# 2. From ELBO to Soft-IntroVAE: the expELBO and the two-phase game
# 3. A from-scratch implementation on 2D toy distributions
# 4. Training, plots, and what to look for
# 5. The framework way (`soft_intro_vae_tpu.train.toy`) + paper metrics
# 6. TPU notes: why the step looks the way it does

# %% [markdown]
# ## 1. Variational Autoencoders in four equations
#
# A VAE models data with a latent variable: $p_\theta(x) = \int p_\theta(x|z)\,p(z)\,dz$
# with a fixed prior, here $p(z) = \mathcal{N}(0, I)$. The integral is
# intractable, and so is the posterior $p_\theta(z|x)$ — **variational
# inference** replaces the posterior with a learned Gaussian
# $q_\phi(z|x) = \mathcal{N}(\mu_\phi(x), \mathrm{diag}\,\sigma^2_\phi(x))$
# (the **encoder**) and maximizes a lower bound on the evidence:
#
# $$\log p_\theta(x) \;\ge\; \underbrace{\mathbb{E}_{q_\phi(z|x)}\big[\log p_\theta(x|z)\big]}_{-\,\text{reconstruction error } \mathcal{L}_r}
#   \;-\; \underbrace{D_{KL}\big(q_\phi(z|x)\,\|\,p(z)\big)}_{\text{closed form for Gaussians}}
#   \;=\; \mathrm{ELBO}(x).$$
#
# Both terms are cheap: with a Gaussian decoder $p_\theta(x|z)$ the
# reconstruction term is (up to constants) a squared error between $x$ and the
# decoder output $D_\theta(z)$, and the KL between two diagonal Gaussians is
#
# $$D_{KL} = -\tfrac12 \sum_d \big(1 + \log\sigma_d^2 - \sigma_d^2 - \mu_d^2\big).$$
#
# The expectation over $z \sim q_\phi$ is made differentiable by the
# **reparameterization trick**: sample $\varepsilon \sim \mathcal{N}(0, I)$
# once, set $z = \mu + \sigma \odot \varepsilon$, and gradients flow through
# $\mu$ and $\sigma$ while the randomness stays outside the graph. In JAX this
# is explicit by construction — random draws are pure functions of a key, so
# the "trick" is just the line `z = mu + eps * exp(0.5 * logvar)`.

# %% [markdown]
# ## 2. From ELBO to Soft-IntroVAE
#
# A plain VAE trained only to maximize the ELBO tends to produce blurry
# samples: nothing in the objective *penalizes* the decoder for emitting
# points the encoder would never infer. **Introspective** VAEs add a GAN-like
# signal without a discriminator network: *the encoder itself* judges
# realism. The ELBO acts as an energy: high ELBO = "looks like data",
# low ELBO = "looks fake".
#
# The encoder and decoder play a two-player game on decoder outputs
# ("fakes" — both prior samples $D_\theta(z'),\, z'\sim p(z)$, and
# reconstructions):
#
# * the **encoder** maximizes the ELBO of real data while *minimizing* the
#   ELBO it assigns to fakes (pushes them away);
# * the **decoder** maximizes the ELBO the (frozen) encoder assigns to its
#   outputs (pulls them back in).
#
# The original IntroVAE used a hard hinge ($[m - \mathrm{KL}]^+$) to bound the
# repulsion, which makes training very sensitive to the margin $m$.
# Soft-IntroVAE's fix is to push with the **exponent** of the ELBO instead:
#
# $$\mathrm{expELBO}(y) = \exp\!\big(2s\,\mathrm{ELBO}_{\beta_{rec},\beta_{neg}}(y)\big)
#   = \exp\!\big({-2s}\,(\beta_{rec}\mathcal{L}_r(y) + \beta_{neg}\mathrm{KL}(y))\big),$$
#
# which *saturates by itself*: once a fake already has a high KL, the exp is
# ~0 and its gradient vanishes — soft repulsion, no margin to tune. The full
# objectives (minimized, with $s$ a dimension scale and
# $\beta_{rec},\beta_{kl},\beta_{neg},\gamma_r$ hyper-parameters):
#
# $$\mathcal{L}_E = s\,(\beta_{rec}\mathcal{L}_r(x) + \beta_{kl}\mathrm{KL}(x))
#    + \tfrac14\big(\mathrm{expELBO}(\hat x) + \mathrm{expELBO}(x_f)\big),$$
# $$\mathcal{L}_D = s\,\big(\beta_{rec}\mathcal{L}_r(x)
#    + \tfrac{\beta_{kl}}{2}(\mathrm{KL}(\hat x) + \mathrm{KL}(x_f))
#    + \gamma_r\,\tfrac{\beta_{rec}}{2}(\mathcal{L}_r(\hat{\hat x}) + \mathcal{L}_r(\hat x_f))\big),$$
#
# where $\hat x$ is the reconstruction, $x_f = D_\theta(z')$ a prior sample,
# and $\hat{\hat x}, \hat x_f$ are *reconstructions of the fakes* (decoded from
# the encoder's code for them). $\gamma_r$ is kept tiny ($10^{-8}$) in the
# non-bootstrap variants: early in training the fakes are garbage, and asking
# the decoder to reproduce its own garbage holds it back (the bootstrap
# tutorial revisits this). Each iteration runs **two sequential optimizer
# phases**: update the encoder with $\mathcal{L}_E$ (decoder frozen), then
# update the decoder with $\mathcal{L}_D$ against the *just-updated* encoder.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    HAVE_MPL = True
except Exception:  # headless minimal installs
    HAVE_MPL = False

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tutorial_2d_results")
os.makedirs(OUT, exist_ok=True)

# %% [markdown]
# ## 3a. The data: 2D toy distributions
#
# The paper's 2D suite (8 Gaussians, spiral, checkerboard, rings) makes the
# game *visible*: the model density and the samples can be plotted directly.
# Here is 8Gaussians inline; the framework's `data/toy.py` has all four.


# %%
def sample_8gaussians(rng: np.random.Generator, n: int) -> np.ndarray:
    centers = np.array(
        [(np.cos(t), np.sin(t)) for t in np.linspace(0, 2 * np.pi, 9)[:-1]],
        np.float32) * 2.0
    idx = rng.integers(0, 8, size=n)
    return (centers[idx] + 0.02 * rng.standard_normal((n, 2))).astype(np.float32) / 1.414


rng_np = np.random.default_rng(92)
real = sample_8gaussians(rng_np, 1024)
if HAVE_MPL:
    plt.figure(figsize=(4, 4))
    plt.scatter(real[:, 0], real[:, 1], s=4, alpha=0.5)
    plt.title("8 Gaussians — real samples")
    plt.gca().set_aspect("equal")
    plt.savefig(os.path.join(OUT, "real.png"), dpi=120)
    plt.close()
    print(f"saved {OUT}/real.png")

# %% [markdown]
# ## 3b. Architectures: two tiny MLPs
#
# For 2D data the encoder/decoder are 3-layer MLPs (the framework's
# `models/mlp.py` mirrors the reference's `train_soft_intro_vae_2d.py`
# encoder/decoder). The encoder emits $2 z_{dim}$ numbers, split into
# $(\mu, \log\sigma^2)$.

# %%
import flax.linen as nn


class Encoder(nn.Module):
    z_dim: int = 2
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden)(x))
        out = nn.Dense(2 * self.z_dim)(x)
        return out[:, : self.z_dim], out[:, self.z_dim:]  # mu, logvar


class Decoder(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, z):
        for _ in range(3):
            z = nn.relu(nn.Dense(self.hidden)(z))
        return nn.Dense(2)(z)


Z_DIM = 2
enc, dec = Encoder(Z_DIM), Decoder()
k0 = jax.random.key(92)
params_e = enc.init(jax.random.fold_in(k0, 0), jnp.zeros((1, 2)))["params"]
params_d = dec.init(jax.random.fold_in(k0, 1), jnp.zeros((1, Z_DIM)))["params"]

# %% [markdown]
# ## 3c. The three loss primitives
#
# Everything in both objectives is built from a per-sample reconstruction
# error, the Gaussian KL, and the expELBO. (Framework versions with all the
# reduction modes: `ops/losses.py`.)


# %%
def recon(x, r, reduce="mean"):
    """Summed-over-dims squared error per sample (the reference's
    mse(reduction='sum')/B convention)."""
    e = jnp.sum((x - r) ** 2, axis=-1)
    return jnp.mean(e) if reduce == "mean" else e


def kl_gauss(mu, logvar, reduce="mean"):
    k = -0.5 * jnp.sum(1 + logvar - jnp.exp(logvar) - mu**2, axis=-1)
    return jnp.mean(k) if reduce == "mean" else k


def exp_elbo(rec_i, kl_i, s, b_rec, b_neg):
    """mean_i exp(-2 s (b_rec rec_i + b_neg kl_i)) — computed per sample,
    THEN averaged (the exp of a mean would be a different, harder game)."""
    return jnp.mean(jnp.exp(-2.0 * s * (b_rec * rec_i + b_neg * kl_i)))


# %% [markdown]
# ## 3d. The two-phase train step
#
# The heart of the algorithm. Two details matter enormously and are easy to
# get wrong — the reference encodes them with `.detach()`; in JAX they are
# `stop_gradient`:
#
# | tensor | E-phase | D-phase |
# |---|---|---|
# | fake / rec fed to the encoder's "judging" forwards | **detached** (the E-loss must not backprop into the decoder) | **not** detached (this IS the decoder's learning signal) |
# | expELBO reconstruction *target* `rec` | not detached (gradient reaches the encoder through it) | — |
# | latent `z` reused from the E-phase | — | detached (D must not differentiate through E's sampling) |
# | codes `z_rec`/`z_fake` into the rec-of-fake decodes | — | detached |
#
# Phase order also matters: the decoder trains against the **already-updated**
# encoder. On TPU the whole thing — 12 network forwards, 2 backwards, 2 Adam
# updates — compiles to ONE XLA program (`jax.jit` + donated state), so the
# "two phases" cost zero host round-trips.

# %%
import optax

S = 0.5          # dimension scale: the 2D recipes use 1/2 (images use 1/(CHW))
B_REC, B_KL, B_NEG = 0.2, 0.3, 0.9   # the paper's 8Gaussians recipe
GAMMA_R = 1e-8
LR = 2e-4

opt = optax.adam(LR, b1=0.9, b2=0.999)
opt_e, opt_d = opt.init(params_e), opt.init(params_d)
sg = jax.lax.stop_gradient


@jax.jit
def vanilla_step(params_e, params_d, opt_e, opt_d, x, key):
    """Plain-VAE warm-up: joint unscaled ELBO step (gives the game a sane
    starting point on the harder distributions)."""
    eps = jax.random.normal(key, (x.shape[0], Z_DIM))

    def loss_fn(pe, pd):
        mu, logvar = enc.apply({"params": pe}, x)
        z = mu + eps * jnp.exp(0.5 * logvar)
        r = dec.apply({"params": pd}, z)
        return B_REC * recon(x, r) + B_KL * kl_gauss(mu, logvar)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params_e, params_d)
    ue, opt_e = opt.update(grads[0], opt_e, params_e)
    ud, opt_d = opt.update(grads[1], opt_d, params_d)
    return optax.apply_updates(params_e, ue), optax.apply_updates(params_d, ud), opt_e, opt_d, loss


@jax.jit
def intro_step(params_e, params_d, opt_e, opt_d, x, key):
    b = x.shape[0]
    ks = jax.random.split(key, 6)
    noise = jax.random.normal(ks[0], (b, Z_DIM))  # one z' batch, shared by E and D

    # ---------------- E phase: update the encoder ----------------
    def lossE_fn(pe):
        fake = dec.apply({"params": params_d}, noise)
        mu, logvar = enc.apply({"params": pe}, x)
        z = mu + jax.random.normal(ks[1], mu.shape) * jnp.exp(0.5 * logvar)
        rec_x = dec.apply({"params": params_d}, z)

        # real-data ELBO terms
        l_rec, l_kl = recon(x, rec_x), kl_gauss(mu, logvar)

        # judge the fakes: encoder forwards on DETACHED decoder outputs
        rmu, rlv = enc.apply({"params": pe}, sg(rec_x))
        fmu, flv = enc.apply({"params": pe}, sg(fake))
        z_r = rmu + jax.random.normal(ks[2], rmu.shape) * jnp.exp(0.5 * rlv)
        z_f = fmu + jax.random.normal(ks[3], fmu.shape) * jnp.exp(0.5 * flv)
        rec_rec = dec.apply({"params": params_d}, z_r)
        rec_fake = dec.apply({"params": params_d}, z_f)

        # expELBO push-away; note rec_x (the target) is NOT detached here
        ee_r = exp_elbo(recon(rec_x, rec_rec, "none"), kl_gauss(rmu, rlv, "none"), S, B_REC, B_NEG)
        ee_f = exp_elbo(recon(fake, rec_fake, "none"), kl_gauss(fmu, flv, "none"), S, B_REC, B_NEG)

        lossE = S * (B_REC * l_rec + B_KL * l_kl) + 0.25 * (ee_r + ee_f)
        return lossE, (z, l_rec, l_kl, ee_r, ee_f)

    (lossE, (z, l_rec, kl_real, ee_r, ee_f)), gE = jax.value_and_grad(lossE_fn, has_aux=True)(params_e)
    ue, opt_e = opt.update(gE, opt_e, params_e)
    params_e_new = optax.apply_updates(params_e, ue)

    # ------------- D phase: update the decoder (vs the NEW encoder) -------------
    def lossD_fn(pd):
        fake = dec.apply({"params": pd}, noise)
        rec_x = dec.apply({"params": pd}, sg(z))          # z reused, detached
        l_rec = recon(x, rec_x)
        # encoder judges — NOT detached: this is where D's gradient comes from
        rmu, rlv = enc.apply({"params": params_e_new}, rec_x)
        fmu, flv = enc.apply({"params": params_e_new}, fake)
        z_rec = rmu + jax.random.normal(ks[4], rmu.shape) * jnp.exp(0.5 * rlv)
        z_fake = fmu + jax.random.normal(ks[5], fmu.shape) * jnp.exp(0.5 * flv)
        rr = dec.apply({"params": pd}, sg(z_rec))
        rf = dec.apply({"params": pd}, sg(z_fake))
        lossD = S * (B_REC * l_rec
                     + 0.5 * B_KL * (kl_gauss(rmu, rlv) + kl_gauss(fmu, flv))
                     + GAMMA_R * 0.5 * B_REC * (recon(sg(rec_x), rr) + recon(sg(fake), rf)))
        return lossD, kl_gauss(fmu, flv)

    (lossD, kl_fake), gD = jax.value_and_grad(lossD_fn, has_aux=True)(params_d)
    ud, opt_d = opt.update(gD, opt_d, params_d)
    params_d_new = optax.apply_updates(params_d, ud)

    metrics = dict(lossE=lossE, lossD=lossD, rec=l_rec, kl_real=kl_real,
                   kl_fake=kl_fake, diff_kl=kl_fake - kl_real,
                   expelbo_r=ee_r, expelbo_f=ee_f)
    return params_e_new, params_d_new, opt_e, opt_d, metrics


# %% [markdown]
# ## 4. Train
#
# 500 vanilla warm-up iterations, then the introspective game. Watch
# `diff_kl = kl_fake − kl_real`: a *positive* gap means the encoder assigns
# more KL (less realism) to fakes than to data — the introspective signal is
# alive. Near convergence the gap shrinks as fakes become indistinguishable.

# %%
N_ITER = int(os.environ.get("TUTORIAL_ITERS", 6000))   # full recipe: 30_000
N_VAE = 500
BATCH = 512

key = jax.random.key(92)
for it in range(N_ITER):
    x = jnp.asarray(sample_8gaussians(rng_np, BATCH))
    kit = jax.random.fold_in(key, it)
    if it < N_VAE:
        params_e, params_d, opt_e, opt_d, loss = vanilla_step(
            params_e, params_d, opt_e, opt_d, x, kit)
        if it % 250 == 0:
            print(f"[warm-up {it:5d}] elbo loss {float(loss):8.4f}")
    else:
        params_e, params_d, opt_e, opt_d, m = intro_step(
            params_e, params_d, opt_e, opt_d, x, kit)
        if it % 1000 == 0 or it == N_ITER - 1:
            print(f"[intro   {it:5d}] rec {float(m['rec']):7.4f}  kl_real {float(m['kl_real']):6.3f}  "
                  f"kl_fake {float(m['kl_fake']):7.3f}  diff_kl {float(m['diff_kl']):7.3f}  "
                  f"expELBO(r,f) ({float(m['expelbo_r']):.2e}, {float(m['expelbo_f']):.2e})")

# %% [markdown]
# Typical healthy run: `diff_kl` climbs well above zero during the game
# (encoder wins early), `expelbo_*` collapse toward 0 (the soft repulsion
# saturating), and `rec` keeps falling. If `diff_kl` pins near zero from the
# start, the push is too weak — raise `beta_neg`.

# %%
if HAVE_MPL:
    z_prior = jax.random.normal(jax.random.fold_in(key, 10**7), (2048, Z_DIM))
    fakes = np.asarray(dec.apply({"params": params_d}, z_prior))
    fig, ax = plt.subplots(1, 2, figsize=(8, 4))
    ax[0].scatter(real[:, 0], real[:, 1], s=4, alpha=0.5)
    ax[0].set_title("real")
    ax[1].scatter(fakes[:, 0], fakes[:, 1], s=4, alpha=0.5, color="C1")
    ax[1].set_title(f"decoder samples after {N_ITER} iters")
    for a in ax:
        a.set_aspect("equal"); a.set_xlim(-2.2, 2.2); a.set_ylim(-2.2, 2.2)
    plt.savefig(os.path.join(OUT, "samples.png"), dpi=120)
    plt.close()
    print(f"saved {OUT}/samples.png — 8 modes, no collapse, is the pass mark")

# %% [markdown]
# ## 5. The framework way
#
# Everything above — plus MultiStepLR milestones, NaN aborts, checkpointing,
# the paper's quantitative metrics (grid-normalized ELBO, histogram KL, JSD),
# and density plots — is two lines with `soft_intro_vae_tpu`. The framework
# step (`train/step.py`) is the same algorithm generalized over all five
# reference variants (2D/image/3D/bootstrap/style differ only in networks,
# recon loss, prior, and a few detach flags — compare its `StepConfig` with
# the tables above).

# %%
if os.environ.get("TUTORIAL_RUN_FRAMEWORK", "0") == "1":
    from soft_intro_vae_tpu.train.toy import ToyConfig, train_soft_intro_vae_toy

    cfg = ToyConfig(dataset="8Gaussians", z_dim=2, batch_size=512,
                    n_iter=30_000, num_vae=2_000,
                    beta_kl=0.3, beta_rec=0.2, beta_neg=0.9,
                    test_iter=5_000, seed=92,
                    result_dir=os.path.join(OUT, "framework"), save_figures=True)
    state, results = train_soft_intro_vae_toy(cfg)
    print(f"paper metrics: {results}")   # gnELBO / histogram-KL / JSD
else:
    print("set TUTORIAL_RUN_FRAMEWORK=1 to run the full framework recipe "
          "(30k iters + paper metrics)")

# %% [markdown]
# ## 6. TPU notes — why the JAX version is shaped like this
#
# * **One program per iteration.** `intro_step` above jits the E-update and
#   the D-update together; the framework version additionally *donates* the
#   state buffers (params/optimizer reuse their own memory) and can fuse K
#   steps into one launch with `lax.scan` (`scan_steps`).
# * **Randomness is explicit.** Each step folds the iteration index into a
#   root key; the same key → the same draws. That's what makes the framework's
#   golden tests possible: inject identical noise into the reference and this
#   implementation and compare losses to 1e-6 (`tests/test_golden_parity.py`).
# * **`stop_gradient` is the whole variant story.** All five reference
#   variants are this same step with different detach choices — see the table
#   in §3d and `train/step.py`'s `StepConfig` flags.
# * **Scaling out is declarative.** The framework runs this exact step on
#   1..N chips by sharding the batch over a `jax.sharding.Mesh`; XLA inserts
#   the gradient all-reduce (`parallel/mesh.py`, `docs/parallelism.md`).
#
# **Next:** `tutorial_image.py` (convolutional Soft-IntroVAE on CIFAR-10-shaped
# images, FID) and `tutorial_bootstrap.py` (the target-decoder variant).
