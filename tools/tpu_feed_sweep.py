"""Input-pipeline (feed-gap) sweep on the real chip — VERDICT r4 #1.

Measures the CIFAR north-star step host-fed vs device-resident at one
scan_steps value per invocation (the remote-TPU build+compile costs ~2.5 min,
so each cell shares ONE compiled program; scan_steps changes the program and
needs its own process):

  python tools/tpu_feed_sweep.py <scan_steps> [prefetch_depths...]

Rows appended to /tmp/tpu_feed_sweep.jsonl. scan_steps=K stacks K real
host batches into one (K,B,H,W,C) uint8 H2D transfer and runs K
reference-exact steps per launch via lax.scan (update-parity pinned by
tests/test_step.py::test_scan_steps_fuses_exact_steps), amortizing the
tunnel's per-transfer + per-launch latency — the reference protocol keeps
the DataLoader in the loop (train_soft_intro_vae.py:458,508); per-step math
is unchanged.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/tpu_feed_sweep.jsonl"
BATCH, IMAGE, ZDIM, CH = 32, 32, 128, (64, 128, 256)
WARMUP_STEPS, MEAS_STEPS = 12, 120


def main():
    scan_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    depths = [int(d) for d in sys.argv[2:]] or [2, 8]

    import jax.numpy as jnp
    import numpy as np

    from soft_intro_vae_tpu.data.images import ArrayDataset, ImageSpec
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

    launches = max(1, MEAS_STEPS // scan_steps)
    rows = []

    def emit(kind, ips, extra=None):
        row = {"kind": kind, "scan_steps": scan_steps, "img_per_s": round(ips, 1),
               "ms_per_step": round(1000.0 * BATCH / ips, 2), **(extra or {})}
        rows.append(row)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(row, flush=True)

    # resident ceiling at this scan_steps
    rng = np.random.default_rng(0)
    if scan_steps > 1:
        x = pmesh.shard_scan_batch(
            jnp.asarray(rng.random((scan_steps, BATCH, IMAGE, IMAGE, 3), np.float32)), mesh)
    else:
        x = pmesh.shard_batch(jnp.asarray(rng.random((BATCH, IMAGE, IMAGE, 3), np.float32)), mesh)
    for _ in range(max(1, WARMUP_STEPS // scan_steps)):
        state, m = intro_step(state, x)
    float(np.asarray(m["loss_e"]).ravel()[-1])  # value-fetch fence (axon)
    t0 = time.perf_counter()
    for _ in range(launches):
        state, m = intro_step(state, x)
    float(np.asarray(m["loss_e"]).ravel()[-1])
    emit("resident", BATCH * scan_steps * launches / (time.perf_counter() - t0))
    del x

    # host-fed at each prefetch depth (same compiled program, same process)
    data = np.round(np.random.default_rng(0)
                    .random((50000, IMAGE, IMAGE, 3), np.float32) * 255.0).astype(np.uint8)
    ds = ArrayDataset(data, seed=0)

    def host_stream():
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

    for depth in depths:
        it = device_prefetch(host_stream(), size=depth,
                             put_fn=sharding_put_fn(mesh, scan=scan_steps > 1))
        for _ in range(max(1, WARMUP_STEPS // scan_steps)):
            state, m = intro_step(state, next(it))
        float(np.asarray(m["loss_e"]).ravel()[-1])
        t0 = time.perf_counter()
        for _ in range(launches):
            state, m = intro_step(state, next(it))
        float(np.asarray(m["loss_e"]).ravel()[-1])
        emit("host_fed", BATCH * scan_steps * launches / (time.perf_counter() - t0),
             {"prefetch": depth})

    res = rows[0]["img_per_s"]
    for r in rows[1:]:
        print(f"feed_efficiency scan={scan_steps} prefetch={r['prefetch']}: "
              f"{r['img_per_s'] / res:.3f}", flush=True)


if __name__ == "__main__":
    main()
