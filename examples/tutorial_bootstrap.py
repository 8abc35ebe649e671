"""Tutorial 3 — the bootstrap variant: a frozen target decoder.

Plain Soft-IntroVAE keeps gamma_r tiny (1e-8): the D-phase term that asks the
decoder to reconstruct its own fakes barely contributes, because optimizing
it against the decoder's *own* moving output is unstable. The bootstrap
variant fixes that with a TARGET decoder — a frozen copy of the decoder,
refreshed every `copy_to_target_freq` epochs (like target networks in deep
RL):

 * the E-phase's "fake full forwards" decode through the target,
 * the D-phase's rec-of-rec / rec-of-fake decode through the target with the
   latent NOT detached — a stable self-distillation signal,
 * gamma_r defaults to 1.0 (vs 1e-8), because the target makes it stable.

One subtle reference behavior preserved here: during vanilla warm-up the
bootstrap model reconstructs through the (frozen) target decoder, so only the
encoder actually trains until the introspective phase begins.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from soft_intro_vae_tpu.train.image import ImageConfig, train_soft_intro_vae

cfg = ImageConfig(
    dataset="cifar10",
    z_dim=64,
    batch_size=32,
    num_epochs=3,
    num_vae=0,
    beta_kl=1.0,
    beta_rec=1.0,
    beta_neg=64.0,
    gamma_r=1.0,            # the point of bootstrapping
    bootstrap=True,
    copy_to_target_freq=1,  # refresh the target every epoch
    seed=92,
    result_dir="./tutorial_bootstrap_results",
    synthetic_fallback=True,
)

if __name__ == "__main__":
    state, summary = train_soft_intro_vae(cfg)
    print(f"\nsummary: {summary}")
    print("state.params_d_target is the frozen copy; compare it to state.params_d")
    print("right after an epoch boundary (equal) vs mid-epoch (lagging).")
