"""Tutorial 2 — convolutional Soft-IntroVAE on images.

Same two-phase game as tutorial 1, with the conv ResNet encoder/decoder and
the per-pixel scale s = 1/(C·H·W) so the betas stay comparable across
resolutions. The full CIFAR-10 recipe is:

    python -m soft_intro_vae_tpu.cli.main image -d cifar10 -n 250 -z 128 \
        -b 32 -r 1.0 -k 1.0 -e 256 -s 92 -f

(with ./data/cifar10_ds/cifar-10-batches-py on disk; -f adds FID). This
tutorial uses synthetic CIFAR-shaped data so it runs anywhere, and a small
model so it compiles fast.

TPU notes worth reading in the code:
 * the WHOLE double update (12 forwards + 2 backwards + 2 Adam updates) is a
   single jitted, donated-buffer program — train/step.py
 * the same program runs on 1..N chips: params are replicated, the batch is
   sharded, XLA inserts the gradient all-reduce — parallel/mesh.py
 * per-iteration metrics stay on device; the host syncs once per epoch.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from soft_intro_vae_tpu.train.image import ImageConfig, train_soft_intro_vae

cfg = ImageConfig(
    dataset="cifar10",
    z_dim=64,
    batch_size=32,
    num_epochs=3,          # full recipe: 250
    num_vae=1,             # one epoch of plain-VAE warm-up
    beta_kl=1.0,
    beta_rec=1.0,
    beta_neg=64.0,         # full recipe: 256 (scaled down for the tiny run)
    seed=92,
    result_dir="./tutorial_image_results",
    synthetic_fallback=True,   # uses real CIFAR if ./data/cifar10_ds exists
    save_figures=True,
    test_iter=50,
)

if __name__ == "__main__":
    state, summary = train_soft_intro_vae(cfg)
    print(f"\nsummary: {summary}")
    print(f"sample grids under {cfg.result_dir}/figures_cifar10/ — rows are")
    print("[real | deterministic reconstruction | prior samples], the same")
    print("panel the reference saves every test_iter.")
