"""Distributed-correctness probe: prove the gradient all-reduce is right.

The reference's multi-GPU story is "run it and watch the loss" (DDP +
NCCL, style launcher.py:26-29,125-129 — no fake backend, no fixtures).
The TPU-native framework ships an executable check instead: run ONE
introspective train step under SGD(lr=1) on a deterministic batch over an
arbitrary mesh. With lr=1 the parameter delta EQUALS the negative
all-reduced gradient, so comparing deltas across mesh/process layouts is a
direct collective-correctness test with no optimizer conditioning in the
way (Adam is sign-like at near-zero gradients and flips elements by ±lr
under mere f32 reduction-order changes — measured in round 2).

Used by three layers of verification:
  * ``__graft_entry__.dryrun_multichip`` — n-vs-1 virtual-device mesh;
  * ``tests/test_multihost_exec.py`` — 2 real OS processes under
    ``jax.distributed`` vs 1 process (the NCCL-rendezvous analog);
  * operators bringing up a new pod can run it by hand.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_intro_vae_tpu.parallel import mesh as pmesh


def sgd_gradient_probe(num_devices: Optional[int] = None,
                       global_batch: Optional[int] = None,
                       image_size: int = 16,
                       z_dim: int = 16,
                       channels=(8, 16),
                       data_seed: int = 0):
    """Run one introspective step with SGD(lr=1) on a deterministic batch.

    Returns ``(grads_e, grads_d)``: host-side pytrees of the all-reduced
    gradients (init params minus post-step params). In a multi-process
    runtime each process feeds only its contiguous local slice of the
    global batch — the analog of the reference's per-rank TFRecord shards
    (dataloader.py:53-67) — and every process returns the same replicated
    result.
    """
    import optax

    from soft_intro_vae_tpu.data.images import ImageSpec
    from soft_intro_vae_tpu.train.image import (ImageConfig, build_image_models,
                                                make_model_fns)
    from soft_intro_vae_tpu.train.state import TrainState
    from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps

    mesh = pmesh.make_data_mesh(num_devices)
    n = mesh.devices.size
    if global_batch is None:
        global_batch = 2 * n

    spec = ImageSpec("probe", image_size, tuple(channels), 3)
    cfg = ImageConfig(dataset="probe", z_dim=z_dim, batch_size=global_batch,
                      num_devices=n, seed=0)
    enc, dec = build_image_models(spec, cfg)
    encode, decode = make_model_fns(enc, dec)
    ve = enc.init(jax.random.key(1), jnp.zeros((1, image_size, image_size, 3)), train=False)
    vd = dec.init(jax.random.key(2), jnp.zeros((1, z_dim)), train=False)
    opt = optax.sgd(1.0)
    state = TrainState.create(
        params_e=ve["params"], params_d=vd["params"],
        stats_e=ve.get("batch_stats", {}), stats_d=vd.get("batch_stats", {}),
        opt_e=opt.init(ve["params"]), opt_d=opt.init(vd["params"]),
        rng=jax.random.key(3), lr_e=1.0, lr_d=1.0)
    _, intro = build_train_steps(
        encode=encode, decode=decode, optimizer=opt,
        cfg=StepConfig(z_dim=z_dim, scale=spec.scale), donate=False)

    state = pmesh.shard_state(state, mesh)
    init = jax.device_get((state.params_e, state.params_d))

    x_global = np.random.default_rng(data_seed).random(
        (global_batch, image_size, image_size, 3)).astype(np.float32)
    if jax.process_count() > 1:
        per = global_batch // jax.process_count()
        x_local = x_global[jax.process_index() * per:(jax.process_index() + 1) * per]
    else:
        x_local = x_global
    x = pmesh.shard_batch(x_local, mesh)

    state, _ = intro(state, x)
    after = jax.device_get((state.params_e, state.params_d))
    grads = jax.tree_util.tree_map(lambda a, b: a - b, init, after)
    return grads


def compare_gradient_trees(got, want, rtol: float = 1e-3) -> None:
    """Assert per-leaf relative-L2 equality of two gradient pytrees.

    f32 reduction-order noise between different summation trees is ~1e-6
    relative; a broken collective is O(1)."""
    leaves_a, treedef_a = jax.tree_util.tree_flatten(got)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(want)
    assert treedef_a == treedef_b, (treedef_a, treedef_b)
    for i, (a, b) in enumerate(zip(leaves_a, leaves_b)):
        a, b = np.asarray(a), np.asarray(b)
        denom = float(np.linalg.norm(b)) + 1e-12
        rel = float(np.linalg.norm(a - b)) / denom
        assert rel < rtol, f"gradient leaf {i} diverged: relative L2 {rel:.2e}"
