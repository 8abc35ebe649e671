"""H2D infeed probe — decomposes the host-fed feed gap (VERDICT r4 #1).

The host-fed CIFAR north-star row runs at ~0.84x the device-resident
ceiling even though the feed ships minimal bytes (raw uint8 source data,
normalized in-step — train/step.py input_lut). This probe proves where the
remaining milliseconds live by timing, against ONE compiled step on the
real chip:

  1. step-only            (resident loop; the ceiling)
  2. put-only             (device_put of fresh uint8 batches, no compute)
  3. put+step serial      (feed each step, no prefetch thread)
  4. put+step prefetched  (the trainer's device_prefetch path)

If (1) + (2) ~= (3) ~= (4), the H2D copy SERIALIZES with compute on this
tunneled chip — no amount of host-side pipelining can close the gap, and
the feed tax equals the wire time of the uint8 bytes. Rows append to
/tmp/tpu_h2d_probe.jsonl; the verdict goes in BENCH_NOTES.md.

Run: python tools/tpu_h2d_probe.py [scan_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/tpu_h2d_probe.jsonl"
BATCH, IMAGE, ZDIM, CH = 32, 32, 128, (64, 128, 256)
STEPS = int(os.environ.get("PROBE_STEPS", 120))


def main():
    scan_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    import jax.numpy as jnp
    import numpy as np

    from soft_intro_vae_tpu.data.images import ArrayDataset
    from soft_intro_vae_tpu.data.images import ImageSpec
    from soft_intro_vae_tpu.data.prefetch import device_prefetch, sharding_put_fn
    from soft_intro_vae_tpu.parallel import mesh as pmesh
    from soft_intro_vae_tpu.train.image import ImageConfig, build_image_training

    spec = ImageSpec("cifar10", IMAGE, CH, 3)
    cfg = ImageConfig(dataset="cifar10", z_dim=ZDIM, batch_size=BATCH,
                      beta_kl=1.0, beta_rec=1.0, beta_neg=256.0, seed=0,
                      scan_steps=scan_steps)
    t0 = time.time()
    _, _, state, _, intro_step, mesh = build_image_training(cfg, spec)
    print(f"build {time.time() - t0:.0f}s", flush=True)

    put = sharding_put_fn(mesh, scan=scan_steps > 1)
    launches = max(1, STEPS // scan_steps)
    shape = ((scan_steps, BATCH, IMAGE, IMAGE, 3) if scan_steps > 1
             else (BATCH, IMAGE, IMAGE, 3))
    step_bytes = BATCH * IMAGE * IMAGE * 3  # uint8

    rng = np.random.default_rng(0)
    data = np.round(rng.random((50000, IMAGE, IMAGE, 3), np.float32) * 255.0).astype(np.uint8)
    ds = ArrayDataset(data, seed=0)

    def batches():
        epoch_index, buf = 0, []
        while True:
            for b in ds.epoch(BATCH, drop_last=True, epoch_index=epoch_index):
                if scan_steps > 1:
                    buf.append(b)
                    if len(buf) == scan_steps:
                        yield np.stack(buf)
                        buf = []
                else:
                    yield b
            epoch_index += 1

    rows = []

    def emit(kind, dt, extra=None):
        ms = 1000.0 * dt / (launches * scan_steps)
        row = {"kind": kind, "scan_steps": scan_steps,
               "ms_per_step": round(ms, 3),
               "img_per_s": round(BATCH * 1000.0 / ms, 1), **(extra or {})}
        rows.append(row)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(row, flush=True)

    # -------- 1. step-only (resident) --------
    x = put(np.zeros(shape, np.uint8))
    for _ in range(max(1, 12 // scan_steps)):
        state, m = intro_step(state, x)
    float(np.asarray(m["loss_e"]).ravel()[-1])  # value-fetch fence (axon)
    t0 = time.perf_counter()
    for _ in range(launches):
        state, m = intro_step(state, x)
    float(np.asarray(m["loss_e"]).ravel()[-1])
    emit("step_only", time.perf_counter() - t0)

    # -------- 2. put-only (no compute) --------
    it = batches()
    for _ in range(4):
        y = put(next(it))
    int(np.asarray(y).ravel()[-1])  # fence
    t0 = time.perf_counter()
    for _ in range(launches):
        y = put(next(it))
    int(np.asarray(y).ravel()[-1])
    dt = time.perf_counter() - t0
    emit("put_only", dt,
         {"mb_per_s": round(step_bytes * scan_steps * launches / dt / 1e6, 1)})

    # -------- 3. put + step, serial (no prefetch thread) --------
    for _ in range(max(1, 12 // scan_steps)):
        state, m = intro_step(state, put(next(it)))
    float(np.asarray(m["loss_e"]).ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(launches):
        state, m = intro_step(state, put(next(it)))
    float(np.asarray(m["loss_e"]).ravel()[-1])
    emit("put_step_serial", time.perf_counter() - t0)

    # -------- 4. put + step through device_prefetch (trainer path) --------
    pit = device_prefetch(batches(), size=2, put_fn=put)
    for _ in range(max(1, 12 // scan_steps)):
        state, m = intro_step(state, next(pit))
    float(np.asarray(m["loss_e"]).ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(launches):
        state, m = intro_step(state, next(pit))
    float(np.asarray(m["loss_e"]).ravel()[-1])
    emit("put_step_prefetch", time.perf_counter() - t0)

    step_ms = rows[0]["ms_per_step"]
    put_ms = rows[1]["ms_per_step"]
    print(f"\nadditivity: step {step_ms:.2f} + put {put_ms:.2f} = "
          f"{step_ms + put_ms:.2f} ms vs serial {rows[2]['ms_per_step']:.2f} "
          f"vs prefetched {rows[3]['ms_per_step']:.2f}", flush=True)


if __name__ == "__main__":
    main()
