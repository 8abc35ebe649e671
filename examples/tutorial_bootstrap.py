# %% [markdown]
# # Soft-IntroVAE from scratch — Part 3: the bootstrap variant
#
# *A JAX/TPU re-telling of the reference tutorial*
# (`soft_intro_vae_tutorial/soft_intro_vae_bootstrap_code_tutorial.ipynb`).
# Prerequisites: Part 1 (theory + 2D) and Part 2 (images).
#
# ## 1. The problem with $\gamma_r$
#
# Recall the decoder objective from Part 1:
#
# $$\mathcal{L}_D = s\,\big(\beta_{rec}\mathcal{L}_r(x)
#    + \tfrac{\beta_{kl}}{2}(\mathrm{KL}(\hat x) + \mathrm{KL}(x_f))
#    + \gamma_r\,\tfrac{\beta_{rec}}{2}(\mathcal{L}_r(\hat{\hat x}) + \mathcal{L}_r(\hat x_f))\big).$$
#
# The $\gamma_r$ term asks the decoder to *reconstruct its own fakes* — a
# cycle-consistency signal that should sharpen the generator. But in plain
# Soft-IntroVAE it is optimized against the decoder's **own moving output**:
# the target of the reconstruction changes with every step of the thing being
# trained. Early in training, when fakes are noise, this drags the decoder
# toward reproducing noise — so the reference keeps $\gamma_r = 10^{-8}$,
# effectively off.
#
# ## 2. The fix: a frozen target decoder
#
# The **bootstrap** variant (reference `soft_intro_vae_bootstrap/`) borrows
# the *target network* idea from deep RL (DQN's frozen Q-target): keep a
# frozen copy $D_{\bar\theta}$ of the decoder and refresh it every
# `copy_to_target_freq` epochs. Decoding through a slowly-moving frozen
# target turns the self-reconstruction term into stable self-distillation —
# stable enough that **$\gamma_r$ defaults to 1.0**.
#
# What changes, precisely (every delta is one flag on the framework's generic
# step — `train/step.py::StepConfig(bootstrap=True)`; reference
# `train_soft_intro_vae_bootstrap.py`):
#
# | site | plain | bootstrap |
# |---|---|---|
# | E-phase decode of the judged codes $z_r, z_f$ | online decoder | **frozen target** |
# | D-phase decode of $z_{rec}, z_{fake}$ | online decoder, codes **detached** | **frozen target**, codes **not** detached |
# | D-phase rec-of-fake targets $\hat x, x_f$ | detached | **not** detached |
# | $\gamma_r$ | $10^{-8}$ | **1.0** |
# | vanilla warm-up reconstruction | online decoder | **frozen target** (only the encoder actually trains until the game starts) |
#
# "Not detached" is safe in the bootstrap cases because the target decoder's
# params are constants in the loss — the gradient the extra paths carry flows
# into the *encoder/decoder inputs* of those decodes, which is exactly the
# distillation signal the variant wants.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tutorial_bootstrap_results")
os.makedirs(OUT, exist_ok=True)

# %% [markdown]
# ## 3. The target copy in functional JAX
#
# In torch, the target is a second `nn.Module` plus a `load_state_dict` call
# every few epochs. In functional JAX it is *just another params pytree in the
# train state* — copying is `state.replace(params_d_target=state.params_d)`,
# and "frozen" means the loss closes over it instead of differentiating it.
# The framework keeps `params_d_target` (+ its BN stats) in the same donated
# `TrainState` as everything else, so the refresh compiles into the epoch
# boundary with zero host transfers (`train/state.py`, `train/image.py`).

# %%
from soft_intro_vae_tpu.train.image import ImageConfig, train_soft_intro_vae

cfg = ImageConfig(
    dataset="cifar10", z_dim=64, batch_size=32,
    num_epochs=int(os.environ.get("TUTORIAL_EPOCHS", 3)),
    num_vae=1,                  # watch §4: only the encoder moves this epoch
    beta_rec=1.0, beta_kl=1.0, beta_neg=64.0,
    gamma_r=1.0,                # the point of bootstrapping
    bootstrap=True,
    copy_to_target_freq=1,      # refresh the target every epoch
    seed=92, result_dir=OUT, synthetic_fallback=True,
)
state, summary = train_soft_intro_vae(cfg)
print(f"summary: {summary}")

# %% [markdown]
# ## 4. Verify the two claims that define the variant
#
# (a) during vanilla warm-up only the encoder trains (reconstruction goes
# through the frozen target, so the online decoder receives zero gradient) —
# check: after epoch 0 the online decoder still equals its init *up to the
# target refresh at the epoch boundary*;
# (b) mid-epoch, the target lags the online decoder; right after a boundary
# refresh they are equal.

# %%
eq = jax.tree.all(jax.tree.map(
    lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
    state.params_d, state.params_d_target))
print(f"online decoder == target right after the final epoch-boundary refresh: {eq}")
print("(run one more mid-epoch step and they diverge — the target lags by design)")

# %% [markdown]
# ## 5. When to reach for bootstrap
#
# The reference positions it as the more stable trainer for small/medium
# image datasets where the cycle term helps sharpness and the double decoder
# memory cost is acceptable. The CLI exposes it as its own subcommand with
# the same flag surface as `image`:
# ```
# python -m soft_intro_vae_tpu.cli.main bootstrap -d cifar10 -n 250 -z 128 \
#     -b 32 -r 1.0 -k 1.0 -e 256 -g 1.0 --copy_to_target_freq 1 -s 92
# ```
# Golden step-level parity with the reference's bootstrap trainer (identical
# injected noise, loss match to ~1e-6) is pinned by
# `tests/test_golden_bootstrap.py`.
#
# **The tour ends here** — for the 3D point-cloud variant see
# `cli/eval_3d.py` + `train/threed.py` (same step, chamfer loss, narrow
# prior), and for progressive-growing StyleALAE-based Soft-IntroVAE see
# `train/style.py` + `docs/style.md`.
