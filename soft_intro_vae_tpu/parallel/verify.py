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


def style_step_probe(num_devices: Optional[int] = None,
                     global_batch: Optional[int] = None,
                     steps: int = 2,
                     start_step: int = 0,
                     save_dir: Optional[str] = None,
                     restore_dir: Optional[str] = None,
                     data_seed: int = 0):
    """Run ``steps`` style introspective steps with SGD(lr=1) over a mesh.

    The style analog of :func:`sgd_gradient_probe`, exercising everything the
    image probe cannot: the ``StyleTrainState`` pytree (EMA param trees,
    ``dlatent_avg`` buffers threaded through the step, in-step EMA lerp), the
    traced progressive-growth ``blend`` scalar, and the style mixing/noise RNG
    chain. Reference analog: the style launcher's DDP workers
    (style_soft_intro_vae/launcher.py:26-29,125-129) plus its checkpointer
    save/load (checkpointer.py:87-113).

    Cross-process-count resume: pass ``save_dir`` to checkpoint after the
    first executed step (process-0-gated write), and ``restore_dir`` +
    ``start_step=1`` in a DIFFERENT process/device layout to restore that
    checkpoint, re-shard onto the local mesh, and run the remaining step —
    the mesh-reshape-resume path (save under 2 processes, restore under 1).

    Returns a dict of host arrays: ``delta_e_*``/``delta_d_*`` (init params
    minus final — the accumulated all-reduced SGD gradients), ``ema_e_*``/
    ``ema_d_*``, ``dlatent_avg``, ``ema_dlatent_avg`` and ``step``. Every
    process returns the identical replicated result.
    """
    import optax

    from soft_intro_vae_tpu.train.style_step import (
        StyleModel, StyleModelConfig, StyleStepConfig, StyleTrainState,
        build_style_steps)
    from soft_intro_vae_tpu.utils.checkpoint import Checkpointer

    mesh = pmesh.make_data_mesh(num_devices)
    n = mesh.devices.size
    if global_batch is None:
        global_batch = 2 * n

    mc = StyleModelConfig(startf=8, maxf=16, layer_count=2, latent_size=8,
                          mapping_layers=2)
    model = StyleModel(mc)
    opt = optax.sgd(1.0)
    params_e, params_d, buffers = model.init_params(jax.random.key(1))
    copy = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)
    state = StyleTrainState(
        step=jnp.zeros((), jnp.int32),
        params_e=params_e, params_d=params_d, buffers=buffers,
        ema_e=copy(params_e), ema_d=copy(params_d), ema_buffers=copy(buffers),
        opt_e=opt.init(params_e), opt_d=opt.init(params_d),
        lr=jnp.asarray(1.0, jnp.float32),
        ema_beta=jnp.asarray(0.5 ** (global_batch / 10000.0), jnp.float32),
        rng=jax.random.key(3))
    init = jax.device_get((state.params_e, state.params_d))

    # lod=1 (the model's top LOD at layer_count=2) on the BLEND program:
    # blend is a traced scalar, so the transition path compiles once and the
    # probe exercises the progressive-growth branch the image probe lacks
    lod, res = 1, model.layer_to_resolution[1]
    scfg = StyleStepConfig(latent_size=mc.latent_size, scale=1.0 / (3 * res * res))
    _, intro = build_style_steps(model, scfg, lod=lod, blended=True, optimizer=opt)

    if restore_dir is not None:
        restored, _, _ = Checkpointer(restore_dir).load_latest(state)
        state = restored
    state = pmesh.shard_state(state, mesh)

    ckpt = Checkpointer(save_dir) if save_dir is not None else None
    for i in range(start_step, steps):
        x_global = (np.random.default_rng(data_seed + i)
                    .random((global_batch, res, res, 3)).astype(np.float32) * 2.0 - 1.0)
        if jax.process_count() > 1:
            per = global_batch // jax.process_count()
            x_local = x_global[jax.process_index() * per:(jax.process_index() + 1) * per]
        else:
            x_local = x_global
        x = pmesh.shard_batch(x_local, mesh)
        state, _ = intro(state, x, jnp.asarray(0.5, jnp.float32))
        if ckpt is not None and i == start_step:
            ckpt.save(state, epoch=0, iteration=i + 1)
            ckpt.wait()

    after = jax.device_get((state.params_e, state.params_d))
    delta = jax.tree_util.tree_map(lambda a, b: a - b, init, after)
    out = {"step": np.asarray(jax.device_get(state.step))}
    for tree, name in ((delta[0], "delta_e"), (delta[1], "delta_d"),
                       (jax.device_get(state.ema_e), "ema_e"),
                       (jax.device_get(state.ema_d), "ema_d")):
        for j, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
            out[f"{name}_{j}"] = np.asarray(leaf)
    out["dlatent_avg"] = np.asarray(jax.device_get(state.buffers["dlatent_avg"]))
    out["ema_dlatent_avg"] = np.asarray(jax.device_get(state.ema_buffers["dlatent_avg"]))
    return out


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
