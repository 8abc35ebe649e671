# %% [markdown]
# # Soft-IntroVAE from scratch — Part 2: images
#
# *A JAX/TPU re-telling of the reference tutorial*
# (`soft_intro_vae_tutorial/soft_intro_vae_image_code_tutorial.ipynb`).
# Read Part 1 (`tutorial_2d_toy.py`) first — the theory (ELBO, expELBO,
# two-phase game) carries over unchanged; this part covers what *changes*
# when the data is images:
#
# 1. the **dimension scale** $s = 1/(C \cdot H \cdot W)$
# 2. convolutional ResNet encoder/decoder
# 3. recipe hyper-parameters ($\beta_{neg}$ grows with resolution)
# 4. evaluation: sample grids and FID
# 5. the TPU input pipeline (uint8 on host, normalize on device)
#
# Runnable as-is on CPU or TPU with synthetic CIFAR-shaped data
# (`python examples/tutorial_image.py`); drop the real CIFAR-10 python
# batches under `./data/cifar10_ds/` for the real thing.

# %% [markdown]
# ## 1. Why the scale $s$ exists
#
# In 2D, the reconstruction error sums over 2 dimensions; at 256×256×3 it sums
# over ~200k. The expELBO $\exp(-2s(\beta_{rec}\mathcal{L}_r + \beta_{neg}\mathrm{KL}))$
# would underflow to exactly 0 for any fake if $s$ stayed 1 — no gradient, no
# game. Dividing by the input dimension keeps the exponent in a workable range
# at every resolution, and makes one set of $\beta$s comparable across
# datasets. The framework computes the expELBO in float32 even under bfloat16
# compute for exactly this dynamic-range reason (`ops/losses.py::exp_elbo`).
#
# Reference recipes (their READMEs, encoded in `cli/main.py` defaults):
#
# | dataset | z_dim | β_rec | β_kl | β_neg | batch |
# |---|---|---|---|---|---|
# | CIFAR-10 (32²) | 128 | 1.0 | 1.0 | **256** | 32 |
# | CelebA-HQ (256²) | 256 | 0.5 | 1.0 | **1024** | 8 |
# | FFHQ (1024², style) | 512 | per-LOD table | | | per-LOD |
#
# $\beta_{neg}$ scales with input dimension — the push-away needs to be
# stronger when each individual pixel contributes less to the exponent.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tutorial_image_results")
os.makedirs(OUT, exist_ok=True)

# %% [markdown]
# ## 2. The conv architecture
#
# The reference image models (`soft_intro_vae/train_soft_intro_vae.py`,
# mirrored in `models/conv.py`) are symmetric ResNets:
#
# * **Encoder**: 5×5 conv stem → [ResBlock → AvgPool 2×] per stage →
#   ResBlock → flatten → Dense to $2 z_{dim}$. Each ResBlock is
#   conv3×3-BN-LReLU-conv3×3-BN with a 1×1-conv skip when channels change.
# * **Decoder**: Dense from $z$ → [ResBlock → 2× nearest-upsample] per stage
#   → ResBlock → 5×5 conv to RGB.
#
# TPU-first deltas worth knowing (all in `models/conv.py`):
# * layouts are **NHWC** (torch is NCHW) — the TPU-native layout XLA tiles
#   onto the MXU without transposes;
# * BatchNorm running statistics are *threaded through the step functionally*
#   (flax `batch_stats` collections) — torch mutates them in-place even on
#   frozen subnets, and the framework reproduces that exact evolution
#   (see `train/step.py`'s module docstring);
# * under `compute_dtype="bfloat16"` only conv activations are cast; params,
#   optimizer, BN stats, and every loss stay float32.
#
# We import the framework models here rather than re-deriving them — the
# interesting algorithmic content is identical to Part 1's MLPs.

# %%
from soft_intro_vae_tpu.models.conv import ConvDecoder, ConvEncoder

IMAGE, CH, Z_DIM = 32, (64, 128, 256), 128
enc = ConvEncoder(cdim=3, zdim=Z_DIM, channels=CH, image_size=IMAGE)
dec = ConvDecoder(cdim=3, zdim=Z_DIM, channels=CH, image_size=IMAGE)

k0 = jax.random.key(92)
ve = enc.init(jax.random.fold_in(k0, 0), jnp.zeros((1, IMAGE, IMAGE, 3)), train=False)
vd = dec.init(jax.random.fold_in(k0, 1), jnp.zeros((1, Z_DIM)), train=False)
n_params = sum(x.size for x in jax.tree.leaves(ve["params"])) + \
           sum(x.size for x in jax.tree.leaves(vd["params"]))
print(f"encoder+decoder parameters: {n_params/1e6:.2f}M")

# %% [markdown]
# ## 3. The step is *the same step*
#
# `train/step.py::build_train_steps` is the one generic two-phase step from
# Part 1, parameterized by `StepConfig`. For images the only changes vs 2D:
# `scale = 1/(C·H·W)`, conv networks, and BN-stats threading. Build the full
# training stack through the trainer factory (model + step + mesh + state):

# %%
from soft_intro_vae_tpu.data.images import ImageSpec
from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training

cfg = ImageConfig(
    dataset="cifar10", z_dim=Z_DIM, batch_size=32,
    beta_rec=1.0, beta_kl=1.0, beta_neg=256.0,   # the CIFAR north-star recipe
    num_epochs=2, num_vae=0, seed=92,
    result_dir=OUT, synthetic_fallback=True,
)
spec = ImageSpec("cifar10", IMAGE, CH, 3)
enc_m, dec_m, state, vanilla_step, intro_step, mesh = build_image_training(cfg, spec)
print(f"device mesh: {mesh.shape} — the same code drives 1 or N chips")

# %% [markdown]
# ## 4. One iteration, dissected
#
# Feed one batch and look at the metrics the step returns. With an untrained
# model, reconstructions are noise, so the encoder finds the fakes easy to
# reject: watch `expelbo_*` (large at init, collapses toward 0 as the
# repulsion saturates) and `diff_kl` (the health signal from Part 1).

# %%
from soft_intro_vae_tpu.parallel import mesh as pmesh

rng = np.random.default_rng(92)
x = pmesh.shard_batch(jnp.asarray(rng.random((32, IMAGE, IMAGE, 3), np.float32)), mesh)

state, m = intro_step(state, x)
print({k: float(np.asarray(v)) for k, v in m.items()})

# %% [markdown]
# The printout is the reference's iteration log, metric for metric:
# `loss_e`/`loss_d` (the two phase losses), `rec`, `kl_real`/`kl_rec`/`kl_fake`
# (the encoder's verdicts), the two expELBOs, and `diff_kl`. On TPU these stay
# on device; the trainer syncs them to host once per epoch, not per step.
#
# ## 5. Training for real + the input pipeline
#
# The full trainer adds: epoch loop over a shuffled dataset, vanilla warm-up
# (`num_vae` epochs), sample/reconstruction grids every `test_iter`, FID
# evaluation, checkpointing, and the TPU input path — the part worth reading:
#
# * the dataset stays **uint8 on host** (4× fewer H2D bytes than float32 —
#   measured 1.9× faster host-fed steps, BENCH_NOTES.md);
# * a background thread keeps 2 batches in flight (`data/prefetch.py`);
# * normalization to float32 [0,1] happens **on device** via a 256-entry
#   lookup table — bit-exact vs numpy's `/255.0` (TPU float division is
#   1 ULP off; the LUT gather isn't) — `data/prefetch.py::normalizing_put_fn`;
# * optionally K steps fuse into one launch (`scan_steps`, `lax.scan`).

# %%
if os.environ.get("TUTORIAL_RUN_TRAINER", "1") == "1":
    from soft_intro_vae_tpu.train.image import train_soft_intro_vae

    tiny = ImageConfig(
        dataset="cifar10", z_dim=64, batch_size=32,
        num_epochs=2, num_vae=1,          # 1 warm-up epoch, 1 introspective
        beta_rec=1.0, beta_kl=1.0, beta_neg=64.0,
        seed=92, result_dir=OUT, synthetic_fallback=True,
        save_figures=True, test_iter=50,
    )
    state, summary = train_soft_intro_vae(tiny)
    print(f"summary: {summary}")
    print(f"sample grids: {OUT}/figures_cifar10/ — rows are "
          "[real | reconstruction | prior samples]")

# %% [markdown]
# ## 6. Evaluation: FID
#
# The paper reports FID (CIFAR-10: 4.6 with this architecture at 250 epochs).
# The framework ships the full stack (`metrics/fid.py`): the pt_inception
# network in flax (4 feature taps), a converter for the reference's torch
# weights, streaming mean/cov statistics (no activation matrix in memory), and
# a Newton–Schulz sqrtm so the whole metric can run on device. Enable it with
# `ImageConfig(with_fid=True)` or the CLI's `-f` — with the pretrained weights
# at `artifacts/pretrained/pt_inception-2015-12-05-6726825d.pth` it is the
# reference metric; without, it falls back to a clearly-labeled
# self-consistent variant (useful for relative tracking only).
#
# ## 7. The CLI
#
# The whole recipe, reference flag surface (`cli/main.py`):
# ```
# python -m soft_intro_vae_tpu.cli.main image -d cifar10 -n 250 -z 128 \
#     -b 32 -r 1.0 -k 1.0 -e 256 -s 92 -f
# ```
# Multi-chip is the same command — the trainer shards the global batch over
# every visible device; see `docs/parallelism.md` for mesh/DP/multi-host.
#
# **Next:** `tutorial_bootstrap.py` — what changes when the decoder gets a
# frozen target copy (and why that lets $\gamma_r = 1$).
