"""Style max-LOD step throughput on the TPU (fenced timing).

Shared helper `bench_max_lod` is also used by tools/tpu_style_run.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_max_lod(cfg, batch_sizes=(16, 32), iters=30):
    """img/s + ms/step of the max-LOD introspective step; fresh state per
    batch size (the step donates its input buffers). Timing fenced by a
    VALUE fetch (axon block_until_ready returns early)."""
    import jax.numpy as jnp

    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.style import build_style_training
    from soft_intro_vae_tpu.train.style_step import StyleStepConfig, build_style_steps

    model, opt, _, mesh = build_style_training(cfg)
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=1.0, beta_kl=1.0,
                           beta_neg=float(cfg.beta_neg[min(lod, len(cfg.beta_neg) - 1)]),
                           gamma_r=1e-8, scale=cfg.scale)
    _, intro = build_style_steps(model, scfg, lod, False, opt)
    results = {}
    for bs in batch_sizes:
        _, _, st, _ = build_style_training(cfg)
        x = jnp.asarray(np.random.default_rng(1).random((bs, res, res, 3), np.float32) * 2 - 1)
        x = pmesh.shard_batch(x, mesh)
        st, m = intro(st, x, jnp.asarray(1.0, jnp.float32))
        _ = float(np.asarray(m["rec_loss"]))  # fence compile+first step
        t0 = time.time()
        for _ in range(iters):
            st, m = intro(st, x, jnp.asarray(1.0, jnp.float32))
        _ = float(np.asarray(m["rec_loss"]))  # fence
        dt = time.time() - t0
        results[f"style{res}_intro_bs{bs}"] = {
            "img_per_s": round(bs * iters / dt, 1),
            "ms_per_step": round(dt / iters * 1e3, 1),
        }
        print(f"bs={bs}: {bs * iters / dt:.1f} img/s ({dt / iters * 1e3:.1f} ms/step)",
              flush=True)
    return results


def main():
    from soft_intro_vae_tpu.train.style import StyleConfig

    cfg = StyleConfig(
        layer_count=6, start_channel_count=64, max_channel_count=512,
        latent_space_size=256, mapping_layers=5,
        beta_neg=(2048, 2048, 1024, 512, 512, 128), scale=1.0 / (3 * 128 ** 2),
        use_synthetic=True, verbose=False, seed=0,
    )
    results = bench_max_lod(cfg)
    out = "/tmp/tpu_style_run/style_bench.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("WROTE", out)


if __name__ == "__main__":
    main()
