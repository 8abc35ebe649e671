"""Worker process for the real 2-process jax.distributed execution test.

NOT a pytest module (no ``test_`` prefix) — launched as
``python tests/multihost_worker.py <coordinator> <process_id> <num_processes>
<outdir>`` by tests/test_multihost_exec.py. Each process contributes its own
local CPU devices to the global runtime over a gRPC rendezvous — the
TPU-pod / reference-NCCL-launcher analog (launcher.py:26-29,125-129) — then
runs the SGD(lr=1) gradient probe on its local slice of a deterministic
global batch and dumps the all-reduced gradient it observed.
"""

import json
import os
import sys

# Must be set before jax import; the parent also sets these in the child env,
# these are a belt-and-braces fallback for manual invocation.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

# the axon TPU sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter startup; two processes must not both grab the chip tunnel
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run_style(process_id: int, num_processes: int, outdir: str,
              restore_dir: str) -> None:
    """Style-variant leg (VERDICT r4 #4): two style introspective steps on the
    global mesh — StyleTrainState (EMA trees, dlatent_avg buffers), traced
    blend — with a process-0-gated checkpoint after step 1. ``restore_dir``
    non-empty = mesh-reshape resume: restore another layout's step-1
    checkpoint into THIS layout's mesh and run only step 2."""
    from soft_intro_vae_tpu.parallel.verify import style_step_probe

    if restore_dir:
        out = style_step_probe(restore_dir=restore_dir, start_step=1)
    else:
        out = style_step_probe(save_dir=os.path.join(outdir, "ckpt_style"))
    tag = "resumed_" if restore_dir else ""
    np.savez(os.path.join(outdir, f"style_{tag}p{process_id}of{num_processes}.npz"), **out)


def main() -> None:
    coordinator, process_id, num_processes, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "image"
    restore_dir = sys.argv[6] if len(sys.argv) > 6 else ""

    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        assert jax.process_count() == num_processes
        assert jax.process_index() == process_id

    if mode == "style":
        run_style(process_id, num_processes, outdir, restore_dir)
        with open(os.path.join(outdir, f"done_p{process_id}of{num_processes}.json"), "w") as f:
            json.dump({"process_index": jax.process_index(),
                       "process_count": jax.process_count(), "mode": "style"}, f)
        return

    from soft_intro_vae_tpu.parallel.verify import sgd_gradient_probe
    from soft_intro_vae_tpu.train.state import TrainState  # noqa: F401
    from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == num_processes * n_local, (n_global, num_processes, n_local)

    # identical global batch/model seeds in every process; each feeds only
    # its local slice (parallel/verify.py handles the split)
    grads = sgd_gradient_probe(num_devices=n_global, global_batch=2 * n_global)

    flat = {}
    for tree, name in zip(grads, ("e", "d")):
        for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
            flat[f"{name}_{i}"] = np.asarray(leaf)
    np.savez(os.path.join(outdir, f"grads_p{process_id}of{num_processes}.npz"), **flat)

    # checkpoint gating: every process calls save; only process 0 must write
    ckpt = Checkpointer(os.path.join(outdir, "ckpt"))
    ckpt.save({"w": np.arange(4.0)}, epoch=1, iteration=1)

    with open(os.path.join(outdir, f"done_p{process_id}of{num_processes}.json"), "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "process_count": jax.process_count(),
                   "local_devices": n_local, "global_devices": n_global}, f)


if __name__ == "__main__":
    main()
