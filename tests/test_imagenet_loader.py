"""ImageNet dataloader variants (style_soft_intro_vae/dataloader.py:153-305):
oversized sources, random crops, flips, optional labels."""

import numpy as np
import pytest

from soft_intro_vae_tpu.data.imagenet import ImageNetTFRecords, imagenet_source_size
from soft_intro_vae_tpu.data.tfrecords import TFRecordWriter, make_example


def _write_shards(tmp_path, level, parts, n_per_part, src, with_labels, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    idx = 0
    for part in range(parts):
        p = str(tmp_path / f"imagenet-r{level:02d}.tfrecords.{part:03d}")
        with TFRecordWriter(p) as w:
            for _ in range(n_per_part):
                img = rng.integers(0, 256, (3, src, src), dtype=np.uint8)
                feats = {"data": img.tobytes(), "shape": list(img.shape)}
                if with_labels:
                    feats["label"] = [idx % 7]
                w.write(make_example(feats))
                idx += 1
        paths.append(p)
    return paths


def test_source_size_formula():
    # train sources carry the 1/8 crop margin (dataloader.py:200-203)
    assert imagenet_source_size(256, train=True) == 256 + 32
    assert imagenet_source_size(128, train=True) == 128 + 16
    assert imagenet_source_size(256, train=False) == 256
    with pytest.raises(ValueError):
        imagenet_source_size(100)


def test_random_crops_and_flip(tmp_path):
    level, target = 4, 16
    src = imagenet_source_size(target, train=True)  # 18
    _write_shards(tmp_path, level, parts=2, n_per_part=6, src=src, with_labels=False)
    ds = ImageNetTFRecords(str(tmp_path / "imagenet-r%02d.tfrecords.%03d"),
                           part_count=2, dataset_size=12, max_resolution_level=level,
                           seed=1, train=True)
    assert len(ds) == 12
    batches = list(ds.epoch(target, batch_size=4))
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (4, target, target, 3) and b.dtype == np.float32
        assert 0.0 <= b.min() and b.max() <= 255.0
    # per-image independent crops: two images from the same source pool must
    # not all be identical crops across epochs (random offsets)
    b2 = list(ds.epoch(target, batch_size=4, epoch_index=99))
    assert not all(np.array_equal(a, b) for a, b in zip(batches, b2))


def test_labels_plumbed(tmp_path):
    level, target = 4, 16
    src = imagenet_source_size(target, train=True)
    _write_shards(tmp_path, level, parts=1, n_per_part=8, src=src, with_labels=True)
    ds = ImageNetTFRecords(str(tmp_path / "imagenet-r%02d.tfrecords.%03d"),
                           part_count=1, dataset_size=8, max_resolution_level=level,
                           needs_labels=True, flip=False, train=True)
    out = list(ds.epoch(target, batch_size=8))
    (batch, labels), = out
    assert batch.shape == (8, target, target, 3)
    assert sorted(labels.tolist()) == sorted([i % 7 for i in range(8)])


def test_eval_records_exact_size_no_crop(tmp_path):
    level, target = 4, 16
    _write_shards(tmp_path, level, parts=1, n_per_part=4, src=target, with_labels=False)
    ds = ImageNetTFRecords(str(tmp_path / "imagenet-r%02d.tfrecords.%03d"),
                           part_count=1, dataset_size=4, max_resolution_level=level,
                           train=False, flip=False)
    (b,) = list(ds.epoch(target, batch_size=4))
    assert b.shape == (4, target, target, 3)


def test_size_mismatch_raises(tmp_path):
    level, target = 4, 16
    _write_shards(tmp_path, level, parts=1, n_per_part=2, src=target,  # no margin
                  with_labels=False)
    ds = ImageNetTFRecords(str(tmp_path / "imagenet-r%02d.tfrecords.%03d"),
                           part_count=1, dataset_size=2, max_resolution_level=level,
                           train=True)  # train expects src=18
    with pytest.raises(ValueError, match="expected 18x18"):
        list(ds.epoch(target, batch_size=2))


def test_rank_sharding(tmp_path):
    level, target = 4, 16
    src = imagenet_source_size(target, train=True)
    _write_shards(tmp_path, level, parts=4, n_per_part=2, src=src, with_labels=False)
    pat = str(tmp_path / "imagenet-r%02d.tfrecords.%03d")
    d0 = ImageNetTFRecords(pat, part_count=4, dataset_size=8, max_resolution_level=level,
                           rank=0, world_size=2, flip=False)
    d1 = ImageNetTFRecords(pat, part_count=4, dataset_size=8, max_resolution_level=level,
                           rank=1, world_size=2, flip=False)
    assert len(d0) == len(d1) == 4
    assert d0.filenames[level] != d1.filenames[level]
    with pytest.raises(ValueError, match="divisible"):
        ImageNetTFRecords(pat, part_count=4, dataset_size=8,
                          max_resolution_level=level, world_size=3)
