"""TPU style end-to-end: streaming TFRecord input, full LOD ladder to 128px,
checkpoints + figures, then a max-LOD step-throughput measurement.

One process = one TPU job (axon: single job at a time, remote compiles are
30-90s each). Run:  python tools/tpu_style_run.py [--epochs 12]

Timing: the axon platform's block_until_ready returns early — every timer
read is fenced by a VALUE fetch (BENCH_NOTES.md methodology).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shards(out_dir: str, n: int = 2048, res: int = 128, parts: int = 2, seed: int = 0):
    from soft_intro_vae_tpu.data.tfrecords import TFRecordWriter, make_example

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    max_level = int(np.log2(res))
    writers = {(lv, p): TFRecordWriter(os.path.join(out_dir, f"syn-r{lv:02d}.tfrecords.{p:03d}"))
               for lv in range(2, max_level + 1) for p in range(parts)}
    for i in range(n):
        base = rng.random((8, 8, 3)).astype(np.float32)
        img = np.repeat(np.repeat(base, res // 8, 0), res // 8, 1)
        noise = rng.random((res, res, 3)).astype(np.float32)
        cur = np.clip(0.85 * img + 0.15 * noise, 0, 1)
        cur = (cur * 255).astype(np.uint8)
        for lv in range(max_level, 1, -1):
            chw = cur.transpose(2, 0, 1)
            writers[(lv, i % parts)].write(make_example({"shape": list(chw.shape),
                                                         "data": chw.tobytes()}))
            if lv > 2:
                f = cur.astype(np.float32)
                h, w, c = f.shape
                cur = np.clip(np.rint(f.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))),
                              0, 255).astype(np.uint8)
    for w in writers.values():
        w.close()
    return os.path.join(out_dir, "syn-r%02d.tfrecords.%03d")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--out", default="/tmp/tpu_style_run")
    args = ap.parse_args()

    from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae

    pattern = make_shards(os.path.join(args.out, "shards"), n=args.n)
    print("shards ready:", pattern, flush=True)

    cfg = StyleConfig(
        name="syn128",
        output_dir=os.path.join(args.out, "results"),
        dataset_path=pattern, dataset_size=args.n, part_count=2,
        max_resolution_level=7,  # 128px shards
        layer_count=6,           # model to 128px — reduced-but-real ladder
        start_channel_count=64, max_channel_count=512,
        latent_space_size=256, mapping_layers=5,
        beta_neg=(2048, 2048, 1024, 512, 512, 128, 128, 64, 64),
        scale=1.0 / (3 * 128 ** 2),
        epochs_per_lod=2, train_epochs=args.epochs, num_vae=1,
        learning_rates=(0.002,),
        lod_2_batch_tables={"1GPU": [128, 128, 128, 64, 32, 16]},
        seed=0, save_figures=True, verbose=True, buffer_size_mb=64,
    )
    t0 = time.time()
    state, summary = train_style_soft_intro_vae(cfg)
    train_s = time.time() - t0
    print("TRAIN DONE", summary, f"{train_s:.1f}s", flush=True)

    # ---- max-LOD step throughput (shared fenced-timing helper) ----
    from tools.tpu_style_bench import bench_max_lod

    results = bench_max_lod(cfg)

    with open(os.path.join(args.out, "style_bench.json"), "w") as f:
        json.dump({"summary": {k: v for k, v in summary.items()},
                   "train_seconds": train_s, **results}, f, indent=2)
    print("WROTE", os.path.join(args.out, "style_bench.json"), flush=True)


if __name__ == "__main__":
    main()
