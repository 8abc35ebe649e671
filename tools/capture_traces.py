"""Capture jax.profiler traces for the two headline steps (VERDICT r4 #8).

Produces inspectable evidence for the MFU claims in BENCH_NOTES.md:
  * CIFAR north-star introspective double update (bs=32 f32 — the ~96% f32
    MFU claim), and
  * style ffhq256 max-LOD introspective step (256px bf16 — the HBM-bound
    ~44% bf16 MFU claim),
each traced over a handful of steady-state steps (compile excluded) into
artifacts/traces/{cifar_step,style256_step}/. Open with XProf/TensorBoard
(`tensorboard --logdir artifacts/traces/cifar_step`); a reading guide lives
in BENCH_NOTES.md.

Run on the real chip: `python tools/capture_traces.py [cifar|style|both]`.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "traces")


def trace_cifar():
    import jax.numpy as jnp

    from soft_intro_vae_tpu.data.images import ImageSpec
    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training
    from soft_intro_vae_tpu.utils.profiling import trace

    spec = ImageSpec("cifar10", 32, (64, 128, 256), 3)
    cfg = ImageConfig(dataset="cifar10", z_dim=128, batch_size=32,
                      beta_kl=1.0, beta_rec=1.0, beta_neg=256.0, seed=0)
    _, _, state, _, intro_step, mesh = build_image_training(cfg, spec)
    x = pmesh.shard_batch(
        jnp.asarray(np.random.default_rng(0).random((32, 32, 32, 3), np.float32)), mesh)
    for _ in range(10):  # compile + warmup outside the trace
        state, m = intro_step(state, x)
    float(np.asarray(m["loss_e"]).ravel()[-1])
    out = os.path.join(OUT, "cifar_step")
    with trace(out):
        for _ in range(20):
            state, m = intro_step(state, x)
        float(np.asarray(m["loss_e"]).ravel()[-1])  # fence inside the trace
    print("WROTE", out)


def trace_style():
    import jax.numpy as jnp

    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.style import StyleConfig, build_style_training
    from soft_intro_vae_tpu.train.style_step import StyleStepConfig, build_style_steps
    from soft_intro_vae_tpu.utils.profiling import trace

    cfg = StyleConfig.from_yaml(
        os.path.join(REPO, "configs", "ffhq256.yaml"),
        overrides=["TRAIN.COMPUTE_DTYPE", "bfloat16", "DATASET.SYNTHETIC", "true"])
    model, opt, state, mesh = build_style_training(cfg)
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=cfg.beta_rec,
                           beta_kl=cfg.beta_kl,
                           beta_neg=float(cfg.beta_neg[min(lod, len(cfg.beta_neg) - 1)]),
                           gamma_r=1e-8, scale=cfg.scale)
    _, intro = build_style_steps(model, scfg, lod, False, opt)
    bs = 16
    x = pmesh.shard_batch(
        jnp.asarray(np.random.default_rng(1).random((bs, res, res, 3), np.float32) * 2 - 1),
        mesh)
    blend = jnp.asarray(1.0, jnp.float32)
    for _ in range(4):
        state, m = intro(state, x, blend)
    float(np.asarray(m["rec_loss"]))
    out = os.path.join(OUT, "style256_step")
    with trace(out):
        for _ in range(5):
            state, m = intro(state, x, blend)
        float(np.asarray(m["rec_loss"]))
    print("WROTE", out)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    os.makedirs(OUT, exist_ok=True)
    if which in ("cifar", "both"):
        trace_cifar()
    if which in ("style", "both"):
        trace_style()
