"""Style max-LOD step throughput on the TPU (fenced timing).

Standalone so it can rerun without the progressive training run.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.style import StyleConfig, build_style_training
    from soft_intro_vae_tpu.train.style_step import StyleStepConfig, build_style_steps

    cfg = StyleConfig(
        layer_count=6, start_channel_count=64, max_channel_count=512,
        latent_space_size=256, mapping_layers=5,
        beta_neg=(2048, 2048, 1024, 512, 512, 128), scale=1.0 / (3 * 128 ** 2),
        use_synthetic=True, verbose=False, seed=0,
    )
    model, opt, _, mesh = build_style_training(cfg)
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=1.0, beta_kl=1.0,
                           beta_neg=float(cfg.beta_neg[lod]), gamma_r=1e-8, scale=cfg.scale)
    _, intro = build_style_steps(model, scfg, lod, False, opt)
    results = {}
    for bs in (16, 32):
        # fresh state per config: the step donates its input buffers
        _, _, st, _ = build_style_training(cfg)
        x = jnp.asarray(np.random.default_rng(1).random((bs, res, res, 3), np.float32) * 2 - 1)
        x = pmesh.shard_batch(x, mesh)
        st, m = intro(st, x, jnp.asarray(1.0, jnp.float32))
        _ = float(np.asarray(m["rec_loss"]))  # fence compile+first step
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            st, m = intro(st, x, jnp.asarray(1.0, jnp.float32))
        _ = float(np.asarray(m["rec_loss"]))  # fence
        dt = time.time() - t0
        results[f"style128_intro_bs{bs}"] = {
            "img_per_s": round(bs * iters / dt, 1),
            "ms_per_step": round(dt / iters * 1e3, 1),
        }
        print(f"bs={bs}: {bs * iters / dt:.1f} img/s ({dt / iters * 1e3:.1f} ms/step)",
              flush=True)
    out = "/tmp/tpu_style_run/style_bench.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("WROTE", out)


if __name__ == "__main__":
    main()
