"""Style remat path: jax.checkpoint on encoder/decoder forwards must be
value-IDENTICAL (same program, recomputed activations) for both the model
ops and a full introspective train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.train.style_step import (
    StyleModel,
    StyleModelConfig,
    StyleStepConfig,
    StyleTrainState,
    build_style_steps,
)

pytestmark = pytest.mark.slow  # style model compiles


KW = dict(startf=8, maxf=16, layer_count=2, latent_size=8, mapping_layers=2)


def _state(model):
    pe, pd, buf = model.init_params(jax.random.key(0))
    copy = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)
    from soft_intro_vae_tpu.train.lreq_adam import scale_by_lreq_adam

    opt = scale_by_lreq_adam(beta2=0.99)
    return opt, StyleTrainState(
        step=jnp.asarray(0), params_e=pe, params_d=pd, buffers=buf,
        ema_e=copy(pe), ema_d=copy(pd), ema_buffers=copy(buf),
        opt_e=opt.init(pe), opt_d=opt.init(pd),
        lr=jnp.asarray(1e-3, jnp.float32), ema_beta=jnp.asarray(0.999, jnp.float32),
        rng=jax.random.key(7),
    )


class TestStyleRemat:
    def test_model_ops_identical(self):
        m = StyleModel(StyleModelConfig(**KW))
        mr = StyleModel(StyleModelConfig(remat=True, **KW))
        pe, pd, buf = m.init_params(jax.random.key(0))
        x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 8, 3), jnp.float32)
        eps = jnp.zeros((4, 8))
        _, mu, lv = m.encode(pe, x, 1, None, eps)
        _, mur, lvr = mr.encode(pe, x, 1, None, eps)
        np.testing.assert_array_equal(np.asarray(mu), np.asarray(mur))
        z = jnp.asarray(np.random.RandomState(2).randn(4, 8), jnp.float32)
        r, _ = m.generate(pd, buf, jax.random.key(1), 1, None, z, mixing=False)
        rr, _ = mr.generate(pd, buf, jax.random.key(1), 1, None, z, mixing=False)
        np.testing.assert_array_equal(np.asarray(r), np.asarray(rr))

    def test_gradients_equivalent(self):
        """Backward through the remat'd forwards recomputes activations;
        grads must agree to float tolerance. (Post-optimizer params are NOT
        compared: beta1=0 Adam normalizes updates to sign(g), which amplifies
        epsilon-level recompute reordering on near-zero grads.)"""
        x = jnp.asarray(np.random.RandomState(3).rand(4, 8, 8, 3) * 2 - 1, jnp.float32)
        z = jnp.asarray(np.random.RandomState(4).randn(4, 8), jnp.float32)
        eps = jnp.asarray(np.random.RandomState(5).randn(4, 8), jnp.float32)
        grads = []
        for remat in (False, True):
            model = StyleModel(StyleModelConfig(remat=remat, **KW))
            pe, pd, buf = model.init_params(jax.random.key(0))

            def loss_fn(pe, pd):
                zz, mu, lv = model.encode(pe, x, 1, None, eps)
                rec, _ = model.generate(pd, buf, jax.random.key(1), 1, None, zz,
                                        mixing=False)
                return jnp.mean((rec - x) ** 2) + 0.1 * jnp.mean(mu ** 2 + lv ** 2)

            grads.append(jax.grad(loss_fn, argnums=(0, 1))(pe, pd))
        for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                        jax.tree_util.tree_leaves(grads[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    def test_intro_step_runs_with_remat(self):
        """One full introspective step with remat=True: metrics match the
        non-remat program (forward values are identical)."""
        scfg = StyleStepConfig(latent_size=8, beta_neg=32.0, scale=1.0 / (3 * 64))
        x = jnp.asarray(np.random.RandomState(3).rand(8, 8, 8, 3) * 2 - 1, jnp.float32)
        results = []
        for remat in (False, True):
            model = StyleModel(StyleModelConfig(remat=remat, **KW))
            opt, st = _state(model)
            _, intro = build_style_steps(model, scfg, lod=1, blended=False, optimizer=opt)
            st, metrics = intro(st, x, jnp.asarray(1.0, jnp.float32))
            assert all(np.isfinite(np.asarray(v)) for v in metrics.values())
            results.append({k: float(v) for k, v in metrics.items()})
        for k in results[0]:
            assert results[0][k] == pytest.approx(results[1][k], rel=1e-5), k
