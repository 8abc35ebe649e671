"""256px max-LOD throughput sweep at the UNMODIFIED ffhq256 config.

VERDICT r4 next-#3: harvest the style flagship's bounded headroom — measure
bf16 x remat x batch size at the real `configs/ffhq256.yaml` hyperparameters
(layer_count 7, z=512, mapping_layers 8) and publish img/s + MFU rows in
BENCH_NOTES.md. Reference envelope: the <=8-GPU DDP launcher at the same
config (style_soft_intro_vae/launcher.py:125-129 + configs/ffhq256.yaml).

Usage: python tools/tpu_style_sweep.py [--iters 30]
Writes /tmp/tpu_style_run/style_sweep.json and prints one row per cell.
Cells that exceed HBM (XLA RESOURCE_EXHAUSTED) are recorded as "oom".
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_style_bench import bench_max_lod  # noqa: E402

CFG_YAML = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "configs", "ffhq256.yaml")

# (label, compute_dtype, remat, batch sizes)
CELLS = [
    ("f32", "float32", False, (16,)),            # round-4 anchor row
    ("bf16", "bfloat16", False, (16, 32)),       # bs=64 bf16 no-remat: known OOM (23 GiB)
    ("bf16+remat", "bfloat16", True, (16, 32, 64)),
]


def flops_per_image(cfg):
    """XLA cost analysis of the compiled step, FLOPs per image (for MFU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.style import build_style_training
    from soft_intro_vae_tpu.train.style_step import StyleStepConfig, build_style_steps

    model, opt, st, mesh = build_style_training(cfg)
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=cfg.beta_rec,
                           beta_kl=cfg.beta_kl,
                           beta_neg=float(cfg.beta_neg[min(lod, len(cfg.beta_neg) - 1)]),
                           gamma_r=1e-8, scale=cfg.scale)
    _, intro = build_style_steps(model, scfg, lod, False, opt)
    bs = 16
    x = pmesh.shard_batch(jnp.zeros((bs, res, res, 3), jnp.float32), mesh)
    lowered = intro.lower(st, x, jnp.asarray(1.0, jnp.float32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) / bs


def make_cfg(dtype: str, remat: bool):
    from soft_intro_vae_tpu.train.style import StyleConfig

    return StyleConfig.from_yaml(CFG_YAML, overrides=[
        "TRAIN.COMPUTE_DTYPE", dtype,
        "TRAIN.REMAT", "true" if remat else "false",
        "DATASET.SYNTHETIC", "true",
    ])


def main():
    iters = 30
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    results = {}
    fpi = None
    for label, dtype, remat, batches in CELLS:
        cfg = make_cfg(dtype, remat)
        if fpi is None:
            fpi = flops_per_image(make_cfg("bfloat16", False))
            print(f"XLA cost analysis: {fpi / 1e12:.3f} TFLOP/image at 256px", flush=True)
        for bs in batches:
            key = f"ffhq256_{label}_bs{bs}"
            print(f"--- {key} ---", flush=True)
            try:
                row = bench_max_lod(cfg, batch_sizes=(bs,), iters=iters)
            except Exception as e:  # RESOURCE_EXHAUSTED etc.
                msg = str(e).splitlines()[0][:160]
                print(f"{key}: FAILED ({msg})", flush=True)
                results[key] = {"error": msg}
                continue
            (_, cell), = row.items()
            # v5e MXU peak ~197 TFLOPS for BOTH rows: under the TPU default
            # matmul precision, "f32" conv/matmul arrays still run as bf16
            # MXU passes (an f32-peak denominator yields a bogus >100% MFU
            # for the f32 row — round-5 fix)
            peak = 197e12
            cell["mfu_pct"] = round(100.0 * cell["img_per_s"] * fpi / peak, 1)
            results[key] = cell
            print(f"{key}: {cell['img_per_s']} img/s, {cell['ms_per_step']} ms/step, "
                  f"{cell['mfu_pct']}% MFU", flush=True)

    out = "/tmp/tpu_style_run/style_sweep.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("WROTE", out)


if __name__ == "__main__":
    main()
