"""Tests for the generic introspective train step (train/step.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.models.mlp import DecoderMLP, EncoderMLP
from soft_intro_vae_tpu.train import optim
from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps


# step builders + states are pure; memoize per-config so the ~6 tests on the
# default config share ONE compiled (vanilla, intro) pair — on this 1-core
# host each introspective-step compile costs ~20s, dominating the suite
_SETUP_CACHE = {}


def _setup(z_dim=2, bootstrap=False, **cfg_kw):
    key = (z_dim, bootstrap, tuple(sorted(cfg_kw.items())))
    if key not in _SETUP_CACHE:
        _SETUP_CACHE[key] = _fresh_setup(z_dim, bootstrap, **cfg_kw)
    return _SETUP_CACHE[key]


def _fresh_setup(z_dim=2, bootstrap=False, **cfg_kw):
    enc = EncoderMLP(x_dim=2, z_dim=z_dim, n_layers=2, num_hidden=32)
    dec = DecoderMLP(x_dim=2, z_dim=z_dim, n_layers=2, num_hidden=32)

    def encode(params, stats, x):
        return enc.apply({"params": params}, x), stats

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    pe = enc.init(jax.random.key(0), jnp.zeros((1, 2)))["params"]
    pd = dec.init(jax.random.key(1), jnp.zeros((1, z_dim)))["params"]
    opt = optim.adam()
    state = TrainState.create(
        params_e=pe,
        params_d=pd,
        opt_e=opt.init(pe),
        opt_d=opt.init(pd),
        rng=jax.random.key(2),
        params_d_target=jax.tree_util.tree_map(lambda x: x.copy(), pd) if bootstrap else None,
        lr_e=1e-3,
        lr_d=1e-3,
    )
    cfg = StepConfig(z_dim=z_dim, scale=0.5, bootstrap=bootstrap, **cfg_kw)
    steps = build_train_steps(
        encode=encode, decode=decode, optimizer=opt, cfg=cfg,
        decode_target=decode if bootstrap else None, donate=False,
    )
    return state, steps


def test_vanilla_step_updates_both_subnets():
    state, (vanilla, _) = _setup()
    x = jax.random.normal(jax.random.key(3), (8, 2))
    new_state, metrics = vanilla(state, x)
    assert int(new_state.step) == 1
    for old, new in [(state.params_e, new_state.params_e), (state.params_d, new_state.params_d)]:
        diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), old, new)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_intro_step_updates_and_metrics_finite():
    state, (_, intro) = _setup(beta_rec=0.2, beta_kl=0.3, beta_neg=0.9)
    x = jax.random.normal(jax.random.key(4), (8, 2))
    new_state, m = intro(state, x)
    for k in ["loss_e", "loss_d", "rec", "kl_real", "kl_rec", "kl_fake", "expelbo_r", "expelbo_f", "diff_kl"]:
        assert np.isfinite(float(m[k])), k
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params_d, new_state.params_d)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_intro_step_deterministic_given_state():
    state, (_, intro) = _setup()
    x = jax.random.normal(jax.random.key(5), (8, 2))
    s1, m1 = intro(state, x)
    s2, m2 = intro(state, x)
    assert float(m1["loss_e"]) == float(m2["loss_e"])
    l1 = jax.tree_util.tree_leaves(s1.params_e)
    l2 = jax.tree_util.tree_leaves(s2.params_e)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rng_differs_across_steps():
    state, (_, intro) = _setup()
    x = jax.random.normal(jax.random.key(6), (8, 2))
    s1, m1 = intro(state, x)
    s2, m2 = intro(s1, x)  # same data, next step -> different noise
    assert float(m1["loss_e"]) != float(m2["loss_e"])


def test_vanilla_reduces_loss_over_iters():
    state, (vanilla, _) = _setup()
    rng = np.random.RandomState(0)
    first = last = None
    # bs=8 matches the other default-config tests so the vanilla step
    # compiles once for the whole module
    for i in range(300):
        x = jnp.asarray(rng.randn(8, 2).astype(np.float32) * 0.5)
        state, m = vanilla(state, x)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first


def test_bootstrap_target_decoder_untouched():
    state, (_, intro) = _setup(bootstrap=True, gamma_r=1.0)
    x = jax.random.normal(jax.random.key(7), (8, 2))
    new_state, _ = intro(state, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params_d_target),
        jax.tree_util.tree_leaves(new_state.params_d_target),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # online decoder did move
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params_d, new_state.params_d)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_bootstrap_vanilla_leaves_online_decoder_frozen():
    # bootstrap vanilla phase reconstructs through the frozen target decoder,
    # so the online decoder gets zero gradient (reference model.forward
    # target=True default)
    # gamma_r=1.0 matches the intro bootstrap test so the cached
    # setup (and its compiled steps) is shared
    state, (vanilla, _) = _setup(bootstrap=True, gamma_r=1.0)
    x = jax.random.normal(jax.random.key(8), (8, 2))
    new_state, _ = vanilla(state, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params_d),
        jax.tree_util.tree_leaves(new_state.params_d),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder trained
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params_e, new_state.params_e)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_fresh_z_flag_changes_d_phase():
    s1, (_, intro_reuse) = _setup()
    s2, (_, intro_fresh) = _setup(fresh_z_in_d=True)
    x = jax.random.normal(jax.random.key(9), (8, 2))
    _, m1 = intro_reuse(s1, x)
    _, m2 = intro_fresh(s2, x)
    # E-phase identical; D-phase sees different z -> different loss_d
    assert float(m1["loss_e"]) == pytest.approx(float(m2["loss_e"]), rel=1e-6)
    assert float(m1["loss_d"]) != float(m2["loss_d"])


def test_grad_reaches_encoder_through_expelbo_target():
    """The expELBO recon target `rec` is NOT detached (image/2D); with
    detach_expelbo_targets=True (3D) the E-grads must differ."""
    sA, (_, introA) = _setup(beta_neg=1.0, gamma_r=1.0)
    sB, (_, introB) = _setup(beta_neg=1.0, gamma_r=1.0, detach_expelbo_targets=True)
    x = jax.random.normal(jax.random.key(10), (8, 2))
    a, _ = introA(sA, x)
    b, _ = introB(sB, x)
    same = all(
        np.allclose(np.asarray(p), np.asarray(q), atol=1e-9)
        for p, q in zip(jax.tree_util.tree_leaves(a.params_e), jax.tree_util.tree_leaves(b.params_e))
    )
    assert not same


def test_scanned_steps_match_sequential():
    """scan_steps=K fuses K exact steps: results must equal K sequential calls."""
    state1, (_, intro1) = _setup()
    state2 = jax.tree_util.tree_map(lambda x: x, state1)

    enc = EncoderMLP(x_dim=2, z_dim=2, n_layers=2, num_hidden=32)
    dec = DecoderMLP(x_dim=2, z_dim=2, n_layers=2, num_hidden=32)

    def encode(params, stats, x):
        return enc.apply({"params": params}, x), stats

    def decode(params, stats, z):
        return dec.apply({"params": params}, z), stats

    opt = optim.adam()
    cfg = StepConfig(z_dim=2, scale=0.5)
    _, intro_k = build_train_steps(encode=encode, decode=decode, optimizer=opt,
                                   cfg=cfg, donate=False, scan_steps=3)

    xs = jax.random.normal(jax.random.key(11), (3, 8, 2))
    s_seq = state1
    seq_losses = []
    for i in range(3):
        s_seq, m = intro1(s_seq, xs[i])
        seq_losses.append(float(m["loss_e"]))
    s_scan, ms = intro_k(state2, xs)
    np.testing.assert_allclose(np.asarray(ms["loss_e"]), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params_e),
                    jax.tree_util.tree_leaves(s_scan.params_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_multistep_lr_schedule():
    from soft_intro_vae_tpu.train.optim import multistep_lr

    s = multistep_lr(2e-4, (10000, 15000), 0.1)
    assert s(0) == pytest.approx(2e-4)
    assert s(9999) == pytest.approx(2e-4)
    assert s(10000) == pytest.approx(2e-5)
    assert s(15000) == pytest.approx(2e-6)
    # image variant: single milestone at 350 epochs
    s2 = multistep_lr(2e-4, (350,), 0.1)
    assert s2(349) == pytest.approx(2e-4) and s2(350) == pytest.approx(2e-5)
