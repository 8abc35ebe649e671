"""Style bf16 compute path: value equivalence + trainability.

The 128px+ style step is HBM-bandwidth-bound (BENCH_NOTES roofline);
compute_dtype="bfloat16" halves conv-path activation traffic while IN stats,
style heads, losses, params and optimizer stay float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_intro_vae_tpu.train.style_step import StyleModel, StyleModelConfig

pytestmark = pytest.mark.slow  # style model compiles


def _models():
    kw = dict(startf=8, maxf=16, layer_count=2, latent_size=8, mapping_layers=2)
    return (StyleModel(StyleModelConfig(**kw)),
            StyleModel(StyleModelConfig(compute_dtype="bfloat16", **kw)))


class TestStyleBF16:
    def test_generate_value_equivalence(self):
        m32, mbf = _models()
        pe, pd, buf = m32.init_params(jax.random.key(0))
        z = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
        r32, _ = m32.generate(pd, buf, jax.random.key(1), 1, None, z,
                              mixing=False, update_avg=False, noise_mode="none")
        rbf, _ = mbf.generate(pd, buf, jax.random.key(1), 1, None, z,
                              mixing=False, update_avg=False, noise_mode="none")
        assert rbf.dtype == jnp.float32  # output head upcasts
        assert float(jnp.abs(r32 - rbf).max()) < 0.05

    def test_encode_value_equivalence(self):
        m32, mbf = _models()
        pe, pd, buf = m32.init_params(jax.random.key(0))
        x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 8, 3), jnp.float32)
        eps = jnp.zeros((4, 8))
        _, mu32, lv32 = m32.encode(pe, x, 1, None, eps)
        _, mubf, lvbf = mbf.encode(pe, x, 1, None, eps)
        assert mu32.dtype == mubf.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(mubf), np.asarray(mu32), atol=0.02)

    def test_bf16_training_step_runs(self):
        from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            cfg = StyleConfig(
                layer_count=2, start_channel_count=8, max_channel_count=16,
                latent_space_size=8, mapping_layers=2, epochs_per_lod=2,
                train_epochs=2, num_vae=1, beta_neg=(32, 32), scale=1.0 / (3 * 64),
                use_synthetic=True, synthetic_n=32, max_resolution_level=3,
                output_dir=d, lod_2_batch_tables={"1GPU": [8, 8]},
                verbose=False, seed=0, compute_dtype="bfloat16",
            )
            state, summary = train_style_soft_intro_vae(cfg)
            assert summary["epochs_run"] == 2
            for leaf in jax.tree_util.tree_leaves(state.params_d):
                assert leaf.dtype == jnp.float32  # params stay f32
                assert np.isfinite(np.asarray(leaf)).all()
