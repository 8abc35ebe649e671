"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.parallel import mesh as pmesh


def test_mesh_has_eight_devices():
    mesh = pmesh.make_data_mesh()
    assert mesh.devices.size == 8


def test_host_local_batch_size():
    mesh = pmesh.make_data_mesh()
    assert pmesh.host_local_batch_size(32, mesh) == 4
    with pytest.raises(ValueError):
        pmesh.host_local_batch_size(30, mesh)


def test_batch_sharded_over_data_axis():
    mesh = pmesh.make_data_mesh()
    x = pmesh.shard_batch(jnp.zeros((16, 4)), mesh)
    assert len(x.sharding.device_set) == 8


def test_dp_step_matches_single_device():
    """The SAME jitted intro step on an 8-device mesh must produce the same
    params as on 1 device (GSPMD all-reduce correctness)."""
    from soft_intro_vae_tpu.models.mlp import DecoderMLP, EncoderMLP
    from soft_intro_vae_tpu.train import optim
    from soft_intro_vae_tpu.train.state import TrainState
    from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps

    enc = EncoderMLP(x_dim=2, z_dim=2, n_layers=1, num_hidden=16)
    dec = DecoderMLP(x_dim=2, z_dim=2, n_layers=1, num_hidden=16)

    def encode(params, stats, x):
        return enc.apply({"params": params}, x), stats

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    pe = enc.init(jax.random.key(0), jnp.zeros((1, 2)))["params"]
    pd = dec.init(jax.random.key(1), jnp.zeros((1, 2)))["params"]
    opt = optim.adam()

    def fresh_state():
        return TrainState.create(
            params_e=jax.tree_util.tree_map(jnp.array, pe),
            params_d=jax.tree_util.tree_map(jnp.array, pd),
            opt_e=opt.init(pe), opt_d=opt.init(pd),
            rng=jax.random.key(2), lr_e=1e-3, lr_d=1e-3,
        )

    cfg = StepConfig(z_dim=2, scale=0.5)
    _, intro = build_train_steps(encode=encode, decode=decode, optimizer=opt, cfg=cfg, donate=False)

    x = jax.random.normal(jax.random.key(3), (16, 2))

    # single device
    s1, m1 = intro(fresh_state(), x)

    # 8-device mesh: replicated state, sharded batch
    mesh = pmesh.make_data_mesh()
    s_mesh = pmesh.shard_state(fresh_state(), mesh)
    x_mesh = pmesh.shard_batch(x, mesh)
    s8, m8 = intro(s_mesh, x_mesh)

    assert float(m1["loss_e"]) == pytest.approx(float(m8["loss_e"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_e), jax.tree_util.tree_leaves(s8.params_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # 2x full image-training builds (the driver also runs this)
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
