"""Checkpointing: msgpack pytree snapshots + async save thread.

Covers the reference's three checkpoint styles (SURVEY §5):
  * image/2d/bootstrap: ``{"epoch": E, "model": state}`` files named
    ``{prefix}model_epoch_E_iter_I`` (train_soft_intro_vae.py:321-329);
  * 3D: epoch-numbered model + optimizer files with find_latest_epoch resume
    (train_soft_intro_vae_3d.py:444-449, utils/util.py:49-59);
  * style: async-threaded save + ``last_checkpoint`` pointer
    (checkpointer.py:38-120).

Format here is flax msgpack of the full TrainState pytree — one file restores
params, optimizer state, BN stats, RNG and step exactly.
"""

from __future__ import annotations

import os
import re
import threading
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _is_key(x: Any) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _to_host(tree: Any) -> Any:
    """numpy-ify a pytree; typed PRNG keys are stored as their raw key data."""

    def conv(x):
        if _is_key(x):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _rewrap_keys(target: Any, restored: Any) -> Any:
    """Wrap raw key data back into typed PRNG keys where the target has them."""

    def conv(t, r):
        if _is_key(t):
            return jax.random.wrap_key_data(jnp_asarray_u32(r), impl=jax.random.key_impl(t))
        return r

    return jax.tree_util.tree_map(conv, target, restored)


def jnp_asarray_u32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, dtype=jnp.uint32)


def save_checkpoint(path: str, state: Any, *, epoch: int = 0, iteration: int = 0, extra: Optional[dict] = None) -> str:
    """Serialize a pytree (TrainState or any container) to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "epoch": epoch,
        "iteration": iteration,
        "extra": extra or {},
        "state": _to_host(state),
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target_state: Any) -> tuple[Any, int, int]:
    """Restore into the structure of ``target_state``; returns
    (state, epoch, iteration)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {"epoch": 0, "iteration": 0, "extra": {}, "state": _to_host(target_state)}
    payload = serialization.from_bytes(template, data)
    restored = _rewrap_keys(target_state, payload["state"])
    return restored, int(payload["epoch"]), int(payload["iteration"])


class Checkpointer:
    """Directory-based checkpoint manager with async save and a
    ``last_checkpoint`` pointer file (style variant parity)."""

    POINTER = "last_checkpoint"

    def __init__(self, directory: str, prefix: str = ""):
        self.directory = directory
        self.prefix = prefix
        os.makedirs(directory, exist_ok=True)
        self._thread: Optional[threading.Thread] = None

    def _path(self, epoch: int, iteration: int, tag: str = "") -> str:
        name = f"{self.prefix}model_epoch_{epoch}_iter_{iteration}{tag}.ckpt"
        return os.path.join(self.directory, name)

    def save(self, state: Any, epoch: int, iteration: int, tag: str = "", extra: Optional[dict] = None,
             async_save: bool = False, aux: Optional[dict] = None, all_hosts: bool = False) -> str:
        """``aux`` is JSON-serializable host-side training state (tracker
        history, best FID, ...) written to a ``.aux.json`` sidecar — the
        analog of the reference Checkpointer's auxiliary dict
        (checkpointer.py:23-36 saves scheduler/tracker beside the models).

        In a multi-process runtime only process 0 writes (states are
        replicated, so every host would serialize identical bytes — the
        reference's rank-0 EMA/snapshot gating, train_style_soft_intro_vae
        .py:207-218); pass ``all_hosts=True`` to opt out, e.g. when each
        host has private local storage."""
        import copy
        import json

        path = self._path(epoch, iteration, tag)
        if not all_hosts and jax.process_index() != 0:
            return path
        host_state = _to_host(state)  # snapshot before returning
        # snapshot aux too: callers pass live tracker state that later epochs
        # mutate while an async save is still serializing
        aux_snapshot = copy.deepcopy(aux) if aux is not None else None

        def _do():
            save_checkpoint(path, host_state, epoch=epoch, iteration=iteration, extra=extra)
            if aux_snapshot is not None:
                tmp = path + ".aux.json.tmp"
                with open(tmp, "w") as f:
                    json.dump(aux_snapshot, f)
                os.replace(tmp, path + ".aux.json")
            with open(os.path.join(self.directory, self.POINTER), "w") as f:
                f.write(os.path.basename(path))

        # never let two saves race on the pointer file: drain any in-flight
        # async save before starting the next one (sync path included)
        self.wait()
        if async_save:
            self._thread = threading.Thread(target=_do, daemon=True)
            self._thread.start()
        else:
            _do()
        return path

    def wait(self):
        if self._thread is not None and self._thread.is_alive():
            self._thread.join()
        self._thread = None

    def latest_path(self) -> Optional[str]:
        ptr = os.path.join(self.directory, self.POINTER)
        if os.path.exists(ptr):
            with open(ptr) as f:
                name = f.read().strip()
            path = os.path.join(self.directory, name)
            if os.path.exists(path):
                return path
        # fall back to scanning epoch-numbered files (3D find_latest_epoch)
        best, best_key = None, (-1, -1)
        pat = re.compile(r"model_epoch_(\d+)_iter_(\d+).*\.ckpt$")
        if os.path.isdir(self.directory):
            for name in os.listdir(self.directory):
                m = pat.search(name)
                if m:
                    key = (int(m.group(1)), int(m.group(2)))
                    if key > best_key:
                        best, best_key = os.path.join(self.directory, name), key
        return best

    def load_latest(self, target_state: Any) -> Optional[tuple[Any, int, int]]:
        path = self.latest_path()
        if path is None:
            return None
        return load_checkpoint(path, target_state)

    def latest_aux(self) -> Optional[dict]:
        path = self.latest_path()
        if path is None or not os.path.exists(path + ".aux.json"):
            return None
        import json

        with open(path + ".aux.json") as f:
            return json.load(f)
