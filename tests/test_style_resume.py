"""Style trainer resume + streaming TFRecord input (VERDICT round-1 items 2/4).

Reference semantics: checkpointer.load() + epoch loop starting at
scheduler.start_epoch() with LOD state restored
(style_soft_intro_vae/train_style_soft_intro_vae.py:233-234,268,277); the
streaming input mirrors dataloader.py:30-102 (per-LOD shards, shuffle buffer,
per-rank assignment).
"""

import os

import jax
import numpy as np
import pytest

from soft_intro_vae_tpu.cli.prepare_tfrecords import write_multires_shards
from soft_intro_vae_tpu.data.streaming import StreamingTFRecords
from soft_intro_vae_tpu.train.style import (
    MultiResImages,
    StyleConfig,
    train_style_soft_intro_vae,
)


def _tiny_cfg(out_dir, train_epochs=4, **kw):
    base = dict(
        layer_count=2, start_channel_count=8, max_channel_count=16,
        latent_space_size=8, mapping_layers=2, epochs_per_lod=2,
        train_epochs=train_epochs, num_vae=1, beta_neg=(32, 32),
        scale=1.0 / (3 * 8**2), use_synthetic=True, synthetic_n=32,
        max_resolution_level=3, output_dir=str(out_dir),
        lod_2_batch_tables={"1GPU": [8, 8]}, verbose=False, seed=0,
        snapshot_freq=(10**9,) * 9,  # end-of-epoch anchors only
    )
    base.update(kw)
    return StyleConfig(**base)


# ------------------------------------------------------------- streaming ---

def _write_shards(tmp_path, n=24, max_level=4, parts=2, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (n, 2**max_level, 2**max_level, 3), dtype=np.uint8)
    write_multires_shards(imgs, str(tmp_path), "toy", max_level, parts=parts)
    return imgs, os.path.join(str(tmp_path), "toy-r%02d.tfrecords.%03d")


def test_streaming_yields_same_pixels(tmp_path):
    imgs, pattern = _write_shards(tmp_path)
    ds = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                            max_resolution_level=4, buffer_size_mb=1,
                            seed=0, flip=False)
    got = np.concatenate(list(ds.epoch(16, 4, epoch_index=0)))
    assert got.shape == (24, 16, 16, 3)
    # the SAME multiset of images, order shuffled
    key = lambda a: tuple(np.asarray(a, np.uint8).ravel())
    assert sorted(map(key, got)) == sorted(map(key, imgs.astype(np.float32)))


def test_streaming_lower_lod_uses_stored_shards(tmp_path):
    imgs, pattern = _write_shards(tmp_path)
    ds = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                            max_resolution_level=4, seed=0, flip=False)
    assert 3 in ds.filenames  # per-LOD shards written by prepare_tfrecords
    got = np.concatenate(list(ds.epoch(8, 4, epoch_index=0)))
    assert got.shape == (24, 8, 8, 3)


def test_streaming_downscale_fallback(tmp_path):
    # only max-level shards on disk -> lower LOD streams via per-record downscale
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (12, 16, 16, 3), dtype=np.uint8)
    write_multires_shards(imgs, str(tmp_path), "solo", 4, min_level=4, parts=1)
    pattern = os.path.join(str(tmp_path), "solo-r%02d.tfrecords.%03d")
    ds = StreamingTFRecords(pattern, part_count=1, dataset_size=12,
                            max_resolution_level=4, seed=0, flip=False)
    assert list(ds.filenames.keys()) == [4]
    got = np.concatenate(list(ds.epoch(4, 4, epoch_index=0)))
    assert got.shape == (12, 4, 4, 3)
    # box-downscale parity with the offline writer's math
    ref = imgs.astype(np.float32).reshape(12, 4, 4, 4, 4, 3).mean(axis=(2, 4))
    ref = np.clip(np.rint(ref), 0, 255)
    key = lambda a: tuple(np.asarray(a).ravel().round(3))
    assert sorted(map(key, got)) == sorted(map(key, ref))


def test_streaming_epoch_index_deterministic(tmp_path):
    _, pattern = _write_shards(tmp_path)
    ds1 = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                             max_resolution_level=4, seed=7)
    ds2 = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                             max_resolution_level=4, seed=7)
    a = list(ds1.epoch(16, 8, epoch_index=3))
    b = list(ds2.epoch(16, 8, epoch_index=3))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = list(ds1.epoch(16, 8, epoch_index=4))
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_streaming_per_rank_assignment(tmp_path):
    imgs, pattern = _write_shards(tmp_path, parts=2)
    d0 = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                            max_resolution_level=4, rank=0, world_size=2, flip=False)
    d1 = StreamingTFRecords(pattern, part_count=2, dataset_size=24,
                            max_resolution_level=4, rank=1, world_size=2, flip=False)
    assert len(d0) == len(d1) == 12
    a = np.concatenate(list(d0.epoch(16, 4, epoch_index=0)))
    b = np.concatenate(list(d1.epoch(16, 4, epoch_index=0)))
    key = lambda arr: set(map(lambda x: tuple(x.ravel()), arr))
    assert not (key(a) & key(b))  # disjoint shards
    assert len(key(a) | key(b)) == 24  # full coverage


def test_multires_epoch_index_deterministic():
    ds = MultiResImages.synthetic(32, 16, seed=5)
    a = list(ds.epoch(16, 8, epoch_index=2))
    b = list(ds.epoch(16, 8, epoch_index=2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


# --------------------------------------------------------------- resume ----

@pytest.mark.slow
def test_kill_and_resume_equals_uninterrupted(tmp_path):
    """Train 4 epochs straight vs train 3 + resume 1 (landing mid-LOD, after
    the epoch-2 switch): final params, EMA, and opt step count must match."""
    cfg_a = _tiny_cfg(tmp_path / "a", train_epochs=4)
    state_a, summary_a = train_style_soft_intro_vae(cfg_a)

    cfg_b1 = _tiny_cfg(tmp_path / "b", train_epochs=3)
    train_style_soft_intro_vae(cfg_b1)
    cfg_b2 = _tiny_cfg(tmp_path / "b", train_epochs=4)
    state_b, summary_b = train_style_soft_intro_vae(cfg_b2)

    assert summary_a["lods_seen"] == summary_b["lods_seen"]
    assert int(jax.device_get(state_a.step)) == int(jax.device_get(state_b.step))
    for name in ("params_e", "params_d", "ema_e", "ema_d"):
        for x, y in zip(jax.tree_util.tree_leaves(getattr(state_a, name)),
                        jax.tree_util.tree_leaves(getattr(state_b, name))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=1e-6, err_msg=name)

    # rerunning a completed config resumes past the end: zero epochs execute
    # and the state is untouched (folded in here to reuse run B's training
    # instead of paying another ~90s one)
    state_c, summary_c = train_style_soft_intro_vae(cfg_b2)
    assert summary_c["epochs_run"] == 0
    for x, y in zip(jax.tree_util.tree_leaves(state_b.params_d),
                    jax.tree_util.tree_leaves(state_c.params_d)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
