"""Dump + analyze the optimized HLO of the max-LOD style intro step.

Purpose: decide whether a Pallas fused IN+AdaIN kernel can beat XLA here —
i.e. whether the noise-inject+bias+leaky_relu producer chains and the
moments/affine reduction chains are standalone HBM passes or already fused
into the conv epilogues.
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.style import StyleConfig, build_style_training
    from soft_intro_vae_tpu.train.style_step import StyleStepConfig, build_style_steps

    cfg = StyleConfig(
        layer_count=7, start_channel_count=64, max_channel_count=512,
        latent_space_size=512, mapping_layers=8,
        beta_neg=(2048, 2048, 2048, 1024, 512, 512, 512),
        scale=5e-6, use_synthetic=True, verbose=False, seed=0,
        compute_dtype="bfloat16",
    )
    model, opt, state, mesh = build_style_training(cfg)
    lod = cfg.layer_count - 1
    res = model.layer_to_resolution[lod]
    scfg = StyleStepConfig(latent_size=cfg.latent_space_size, beta_rec=0.1, beta_kl=0.2,
                           gamma_r=1e-8, beta_neg=512.0, scale=cfg.scale)
    _, intro = build_style_steps(model, scfg, lod, False, opt)
    bs = 16
    x = jnp.asarray(np.random.default_rng(1).random((bs, res, res, 3), np.float32) * 2 - 1)
    x = pmesh.shard_batch(x, mesh)
    lowered = jax.jit(intro.__wrapped__ if hasattr(intro, "__wrapped__") else intro,
                      donate_argnums=(0,)).lower(state, x, jnp.asarray(1.0, jnp.float32))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/style_intro_256.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print("HLO chars:", len(txt), "->", out)

    # cost analysis
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("flops=%.3g bytes=%.3g" % (ca.get("flops", 0), ca.get("bytes accessed", 0)))

    # count top-level fusions/ops by kind
    big = Counter()
    for line in txt.splitlines():
        mm = re.search(r"= ((?:bf16|f32|u32|s32|pred)\[[\d,]*\][^ ]*) (fusion|convolution|custom-call|reduce|rng-bit-generator|all-reduce)\(", line)
        if mm:
            big[mm.group(2)] += 1
    print(dict(big))


if __name__ == "__main__":
    main()
