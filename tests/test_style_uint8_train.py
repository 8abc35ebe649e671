"""uint8-vs-float32 style TRAINING equivalence (the e2e half of
test_style_uint8.py, split out so no single test file exceeds the ~5-minute
budget on this 1-core host — see tests/README.md tier table).

Covers the claim the unit tests can't: a real progressive run (stable epochs,
LOD switch with optimizer reset, a blend/transition epoch) trains to
IDENTICAL parameters whether the host dataset stores uint8 bytes (device-LUT
normalization on the stable path, host blend math on transitions) or
float32 (reference DataLoader semantics,
style_soft_intro_vae/train_style_soft_intro_vae.py:340-346). All epochs run
the introspective step (num_vae=0): the FEED path under test is identical in
the vanilla phase, so skipping it saves two XLA compiles per storage mode and
keeps this file inside the per-file wall budget (tests/README.md).
"""

import numpy as np
import pytest

import jax

from soft_intro_vae_tpu.train.style import StyleConfig, train_style_soft_intro_vae


def _tiny_cfg(out_dir, **kw):
    base = dict(
        layer_count=2, start_channel_count=8, max_channel_count=16,
        latent_space_size=8, mapping_layers=2, epochs_per_lod=2,
        train_epochs=3, num_vae=0, beta_neg=(32, 32),
        scale=1.0 / (3 * 8**2), use_synthetic=True, synthetic_n=32,
        max_resolution_level=3, output_dir=str(out_dir),
        lod_2_batch_tables={"1GPU": [8, 8]}, verbose=False, seed=0,
        snapshot_freq=(10**9,) * 9,
    )
    base.update(kw)
    return StyleConfig(**base)


@pytest.mark.slow
def test_style_training_identical_under_uint8_feed(tmp_path):
    """3-epoch tiny progressive runs (stable epochs 0-1, LOD switch + blend
    transition at epoch 2): uint8 vs float32 host storage => identical
    trained params.

    The synthetic dataset is built from the SAME uint8 base both times, at
    the max stored resolution == model resolution, so pixels agree exactly;
    the run covers both the device-LUT path (non-blend epochs) and the host
    blend path (transition epochs)."""
    from soft_intro_vae_tpu.cli.prepare_tfrecords import write_multires_shards

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (32, 8, 8, 3), dtype=np.uint8)
    write_multires_shards(imgs, str(tmp_path / "sh"), "toy", 3, parts=1)
    pattern = str(tmp_path / "sh" / "toy-r%02d.tfrecords.%03d")

    results = []
    for storage in ("uint8", "float32"):
        cfg = _tiny_cfg(tmp_path / f"out_{storage}", use_synthetic=False,
                        dataset_path=pattern, part_count=1, dataset_size=32,
                        host_storage=storage, flip_images=False, resume=False)
        state, _ = train_style_soft_intro_vae(cfg)
        results.append(jax.tree_util.tree_map(np.asarray, state.params_d))
    for a, b in zip(jax.tree_util.tree_leaves(results[0]),
                    jax.tree_util.tree_leaves(results[1])):
        np.testing.assert_array_equal(a, b)
