"""Multi-host wiring (VERDICT r3 #9): per-host shard assignment, rank
auto-resolution from the jax runtime, and process-count-parameterized
partition coverage. The real 2-process jax.distributed path cannot run in
this single-host harness — docs/MULTIHOST.md records the launch recipe; these
tests pin the pure shard-assignment semantics it relies on
(reference launcher.py:26-29, dataloader.py:53-67)."""

import numpy as np
import pytest

from soft_intro_vae_tpu.data.tfrecords import shard_paths_for_rank
from soft_intro_vae_tpu.parallel.multihost import host_shard_info, per_host_slice


@pytest.mark.parametrize("world", [1, 2, 4, 8])
def test_shard_paths_partition_is_disjoint_and_complete(world):
    paths = [f"data-r08.tfrecords.{i:03d}" for i in range(16)]
    chunks = [shard_paths_for_rank(paths, r, world) for r in range(world)]
    assert all(len(c) == 16 // world for c in chunks)
    flat = sorted(p for c in chunks for p in c)
    assert flat == sorted(paths)  # complete, no overlap


def test_shard_paths_matches_reference_round_robin():
    # dataloader.py:53-67 assigns part i to rank i % world_size
    paths = [f"p.{i:03d}" for i in range(8)]
    assert shard_paths_for_rank(paths, 1, 4) == ["p.001", "p.005"]


@pytest.mark.parametrize("world", [1, 2, 4])
def test_per_host_slice_partitions(monkeypatch, world):
    import soft_intro_vae_tpu.parallel.multihost as mh

    seen = np.zeros(64, bool)
    for rank in range(world):
        monkeypatch.setattr(mh.jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(mh.jax, "process_count", lambda w=world: w)
        sl = per_host_slice(64)
        assert not seen[sl].any()
        seen[sl] = True
    assert seen.all()


def test_host_shard_info_single_process():
    assert host_shard_info() == (0, 1)


def test_style_dataset_autowires_rank_from_runtime(monkeypatch, tmp_path):
    """make_style_dataset resolves rank/world from jax.process_* when the
    config leaves them at defaults (launcher.py:26-29 equivalent)."""
    import soft_intro_vae_tpu.train.style as st

    captured = {}

    class FakeStreaming:
        def __init__(self, *a, **kw):
            captured.update(kw)

    import soft_intro_vae_tpu.data.streaming as streaming

    monkeypatch.setattr(streaming, "StreamingTFRecords", FakeStreaming)
    monkeypatch.setattr(st.jax, "process_index", lambda: 2)
    monkeypatch.setattr(st.jax, "process_count", lambda: 4)
    cfg = st.StyleConfig(dataset_path=str(tmp_path / "d-r%02d.tfrecords.%03d"),
                         part_count=8)
    st.make_style_dataset(cfg)
    assert captured["rank"] == 2 and captured["world_size"] == 4
    # explicit config wins over the runtime
    captured.clear()
    cfg2 = st.StyleConfig(dataset_path=str(tmp_path / "d-r%02d.tfrecords.%03d"),
                          part_count=8, rank=1, world_size=2)
    st.make_style_dataset(cfg2)
    assert captured["rank"] == 1 and captured["world_size"] == 2


def test_image_trainer_host_slices_dataset(monkeypatch):
    """train_soft_intro_vae keeps only this host's contiguous slice when the
    runtime reports multiple processes (checked up to dataset selection)."""
    import soft_intro_vae_tpu.train.image as im

    class Stop(Exception):
        pass

    monkeypatch.setattr(im.jax, "process_count", lambda: 2)
    import soft_intro_vae_tpu.parallel.multihost as mh

    monkeypatch.setattr(mh.jax, "process_index", lambda: 1)
    monkeypatch.setattr(mh.jax, "process_count", lambda: 2)
    seen = {}

    def fake_build(cfg, spec):
        raise Stop()

    monkeypatch.setattr(im, "build_image_training", fake_build)
    from soft_intro_vae_tpu.data.images import ArrayDataset, ImageSpec

    imgs = np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3)
    ds = ArrayDataset(imgs.astype(np.float32))
    spec = ImageSpec("cifar10", 4, (8,), 3)
    cfg = im.ImageConfig(dataset="cifar10", num_epochs=0)
    with pytest.raises(Stop):
        im.train_soft_intro_vae(cfg, dataset=ds, spec=spec)
    # rank 1 of 2 -> second half
    np.testing.assert_array_equal(ds.images, imgs[4:].astype(np.float32))
