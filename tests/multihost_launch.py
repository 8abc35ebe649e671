"""Shared launcher helpers for the multi-process execution tests.

Each worker is a separate OS process running tests/multihost_worker.py under
``jax.distributed.initialize`` (coordinator on 127.0.0.1); used by
test_multihost_exec.py (image leg) and test_multihost_style_exec.py
(style leg + mesh-reshape resume).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def launch(coordinator, pid, nprocs, outdir, local_devices, mode="image",
           restore=""):
    argv = [sys.executable, WORKER, coordinator, str(pid), str(nprocs), str(outdir)]
    if mode != "image" or restore:
        argv += [mode, restore]
    return subprocess.Popen(
        argv, env=_env(local_devices), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def wait_all(procs):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"


def load_dump(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
