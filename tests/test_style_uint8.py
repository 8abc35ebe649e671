"""uint8 style input feed: on-device normalization + prefetch overlap.

The style trainer's default feed now ships source bytes (uint8) and
normalizes to [-1, 1] ON DEVICE via a 256-entry LUT, with a prefetch thread
preparing batches ahead of the step (reference overlaps via DataLoader
workers + host-side /127.5-1, style_soft_intro_vae/dataloader.py +
train_style_soft_intro_vae.py:340-346). These tests pin the exactness and
equivalence claims:

- the device LUT reproduces the host ``x/127.5 - 1`` normalization bit-exactly
- uint8 vs float32 dataset storage trains IDENTICALLY at the stored
  resolution (pixels differ only at downscaled LODs, where uint8 storage
  intentionally matches the reference's per-LOD uint8 TFRecords via a
  rint-rounded box cascade — data/streaming.py _box_downscale semantics)
- blend_factor_at(it) is a pure reindexing of the stateful get_blend_factor
  sequence, so the prefetch producer sees the same blends the loop used to
"""

import numpy as np

import jax
import jax.numpy as jnp

from soft_intro_vae_tpu.train.lod import LODDriver
from soft_intro_vae_tpu.train.style import MultiResImages


def test_device_lut_matches_host_normalization():
    lut = np.arange(256, dtype=np.float32) / 127.5 - 1.0
    cast = jax.jit(lambda u: jnp.asarray(lut)[u.astype(jnp.int32)])
    u8 = np.arange(256, dtype=np.uint8).reshape(2, 8, 8, 2)
    got = np.asarray(cast(u8))
    want = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_array_equal(got, want)


def test_multires_uint8_storage_pixels():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    f = MultiResImages(base, flip=False)                      # float32 storage
    u = MultiResImages(base, flip=False, storage="uint8")
    # stored resolution: identical pixels (uint8 -> f32 cast is exact)
    np.testing.assert_array_equal(u.at_resolution(16).astype(np.float32),
                                  f.at_resolution(16))
    # downscaled LOD: uint8 storage = rint-rounded float cascade (the
    # reference's per-LOD TFRecord pixels); float storage keeps exact means
    lo_f = f.at_resolution(8)
    lo_u = u.at_resolution(8)
    assert lo_u.dtype == np.uint8 and lo_f.dtype == np.float32
    np.testing.assert_array_equal(
        lo_u, np.clip(np.rint(lo_f), 0, 255).astype(np.uint8))
    # epoch streams stay (seed, epoch_index)-deterministic under u8 storage
    a = list(MultiResImages(base, seed=3, storage="uint8").epoch(16, 4, epoch_index=1))
    b = list(MultiResImages(base, seed=3, storage="uint8").epoch(16, 4, epoch_index=1))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
        assert x.dtype == np.uint8


def test_blend_factor_at_is_pure_view_of_stepped_sequence():
    d = LODDriver(lod_2_batch=[8, 8], epochs_per_lod=4, layer_count=2,
                  dataset_size=64, world_size=1)
    d.set_epoch(4)  # first epoch of lod 1 = inside its transition window
    assert d.in_transition
    stepped, pure = [], []
    it = 0
    for _ in range(8):
        stepped.append(d.get_blend_factor())
        pure.append(d.blend_factor_at(it))
        d.step()
        it += d.get_batch_size()
    assert stepped == pure


def test_streaming_uint8_yields_same_bytes(tmp_path):
    from soft_intro_vae_tpu.cli.prepare_tfrecords import write_multires_shards
    from soft_intro_vae_tpu.data.streaming import StreamingTFRecords

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (12, 16, 16, 3), dtype=np.uint8)
    write_multires_shards(imgs, str(tmp_path), "toy", 4, parts=2)
    pattern = str(tmp_path / "toy-r%02d.tfrecords.%03d")
    kw = dict(part_count=2, dataset_size=12, max_resolution_level=4, flip=False, seed=0)
    f32 = StreamingTFRecords(pattern, **kw)
    u8 = StreamingTFRecords(pattern, storage="uint8", **kw)
    for bf, bu in zip(f32.epoch(16, 4, epoch_index=0), u8.epoch(16, 4, epoch_index=0)):
        assert bu.dtype == np.uint8 and bf.dtype == np.float32
        np.testing.assert_array_equal(bu.astype(np.float32), bf)


# The e2e half (full tiny progressive runs, uint8 vs float32 => identical
# trained params) lives in test_style_uint8_train.py so neither file exceeds
# the per-file wall-time budget (tests/README.md).
