"""REAL multi-process execution test (VERDICT r3 #1): two OS processes under
``jax.distributed.initialize`` on CPU, each contributing 2 local devices to a
4-device global mesh, run one introspective SGD(lr=1) step on per-process
data shards; the all-reduced gradient must equal a 1-process run of the same
global step. This is the executable analog of the reference's NCCL launcher
(launcher.py:26-29,125-129) — not shard arithmetic (see test_multihost.py for
that layer).

Also proves process-0-gated checkpointing: both workers call
``Checkpointer.save``; exactly one writes.

The style-variant leg + mesh-reshape resume lives in
test_multihost_style_exec.py (own file so each stays inside the per-file
wall budget — tests/README.md tier table).
"""

import glob
import os

import numpy as np
import pytest

from multihost_launch import free_port, launch, load_dump, wait_all


@pytest.mark.multihost
def test_two_process_distributed_gradient_matches_single_process(tmp_path):
    port = free_port()
    coordinator = f"127.0.0.1:{port}"
    mp_dir, sp_dir = tmp_path / "mp", tmp_path / "sp"
    mp_dir.mkdir()
    sp_dir.mkdir()

    # leg 1: 2 processes x 2 local devices = 4-device global mesh;
    # leg 2: 1 process x 4 local devices — same global step, no rendezvous.
    # All three OS processes run concurrently (independent runtimes).
    procs = [launch(coordinator, i, 2, mp_dir, local_devices=2) for i in range(2)]
    procs.append(launch("unused", 0, 1, sp_dir, local_devices=4))
    wait_all(procs)

    g0 = load_dump(mp_dir / "grads_p0of2.npz")
    g1 = load_dump(mp_dir / "grads_p1of2.npz")
    gref = load_dump(sp_dir / "grads_p0of1.npz")
    assert set(g0) == set(g1) == set(gref) and len(gref) > 0

    for k in gref:
        # both processes observed the identical replicated result
        np.testing.assert_array_equal(g0[k], g1[k], err_msg=f"replica skew in {k}")
        # and it equals the 1-process all-reduced gradient (reduction-order
        # noise ~1e-6 relative; a broken collective is O(1))
        denom = float(np.linalg.norm(gref[k])) + 1e-12
        rel = float(np.linalg.norm(g0[k] - gref[k])) / denom
        assert rel < 1e-3, f"{k}: 2-process gradient diverged, relative L2 {rel:.2e}"

    # checkpoint gating: both 2-process workers called Checkpointer.save into
    # the SAME directory; only process 0 may have written, so exactly one file
    files = glob.glob(str(mp_dir / "ckpt" / "*.ckpt"))
    assert len(files) == 1, files
    assert os.path.exists(mp_dir / "ckpt" / "last_checkpoint")
    # the 1-process leg is its own process 0 and writes normally
    assert len(glob.glob(str(sp_dir / "ckpt" / "*.ckpt"))) == 1

    assert (mp_dir / "done_p0of2.json").exists()
    assert (mp_dir / "done_p1of2.json").exists()
