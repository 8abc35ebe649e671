"""Style-variant multi-host execution + mesh-reshape resume (VERDICT r4 #4).

Two style introspective steps run under (a) 2 processes x 2 local devices and
(b) 1 process x 4 devices through ``parallel/verify.py style_step_probe`` —
the ``StyleTrainState`` pytree (EMA parameter trees, ``dlatent_avg`` buffers
threaded through the step), the traced progressive-growth ``blend`` scalar,
and the style-mixing RNG chain, none of which the image leg
(test_multihost_exec.py) touches. Reference analog: the style launcher's DDP
workers (style_soft_intro_vae/launcher.py:26-29,125-129) + its checkpointer
(checkpointer.py:87-113).
"""

import glob

import numpy as np
import pytest

from multihost_launch import free_port, launch, load_dump, wait_all


def _compare_style_dumps(got, want, rtol=1e-3, atol=1e-3):
    """Combined rel+abs: ``decoder.block_0.bias_1`` sits immediately before an
    instance norm, so its analytic gradient is ZERO and its measured delta
    (~5e-5 vs 1e-2..3e2 for live leaves) is pure f32 reduction-order noise
    that legitimately differs across device layouts — the atol floor absorbs
    it while still catching any real trajectory divergence."""
    assert set(got) == set(want) and len(want) > 1
    assert int(got["step"]) == int(want["step"]) == 2
    for k in want:
        if k == "step":
            continue
        diff = float(np.linalg.norm(got[k] - want[k]))
        bound = rtol * float(np.linalg.norm(want[k])) + atol
        assert diff < bound, f"{k}: diverged, L2 {diff:.2e} >= {bound:.2e}"


@pytest.mark.slow
@pytest.mark.multihost
def test_two_process_style_step_and_mesh_reshape_resume(tmp_path):
    """All replicated outputs (accumulated SGD deltas, EMA trees, dlatent_avg)
    must agree between the 2-process and 1-process layouts.

    Plus the cross-process-count resume the reference's fixed-world DDP
    checkpointer never faces (checkpointer.py:87-113 restores into the same
    GPU count): leg (a) checkpoints after step 1 (process-0-gated write);
    leg (c) restores that checkpoint under the 1-process 4-device layout,
    re-shards onto its mesh, runs step 2, and must land on the same state.
    """
    port = free_port()
    coordinator = f"127.0.0.1:{port}"
    mp_dir, sp_dir, rs_dir = tmp_path / "mp", tmp_path / "sp", tmp_path / "rs"
    for d in (mp_dir, sp_dir, rs_dir):
        d.mkdir()

    # legs a+b concurrently (independent runtimes)
    procs = [launch(coordinator, i, 2, mp_dir, 2, mode="style") for i in range(2)]
    procs.append(launch("unused", 0, 1, sp_dir, 4, mode="style"))
    wait_all(procs)

    # leg c needs leg a's step-1 checkpoint on disk
    wait_all([launch("unused", 0, 1, rs_dir, 4, mode="style",
                     restore=str(mp_dir / "ckpt_style"))])

    a0 = load_dump(mp_dir / "style_p0of2.npz")
    a1 = load_dump(mp_dir / "style_p1of2.npz")
    b = load_dump(sp_dir / "style_p0of1.npz")
    c = load_dump(rs_dir / "style_resumed_p0of1.npz")

    # both processes observed the identical replicated result
    for k in b:
        np.testing.assert_array_equal(a0[k], a1[k], err_msg=f"replica skew in {k}")
    # 2-process == 1-process (collective + EMA/buffer chain correctness)
    _compare_style_dumps(a0, b)
    # save-under-2-processes -> restore-under-1 resume == uninterrupted
    _compare_style_dumps(c, b)
    _compare_style_dumps(c, a0)

    # the mid-run checkpoint was written by exactly one of the two processes
    files = glob.glob(str(mp_dir / "ckpt_style" / "*.ckpt"))
    assert len(files) == 1, files
