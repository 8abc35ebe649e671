"""Per-source dataset creators (dataset_tool.py:537-658,741-755 parity):
source file layouts -> per-LOD shards + labels sidecar, with the exporter's
RandomState(123) shuffle."""

import gzip
import os
import pickle

import numpy as np
import pytest

from soft_intro_vae_tpu.cli.prepare_tfrecords import (
    SOURCE_CREATORS,
    create_from_source,
    load_cifar10_u8,
    load_mnist_u8,
    load_mnistrgb_u8,
    load_svhn_u8,
)
from soft_intro_vae_tpu.data.tfrecords import TFRecordFile, _parse_example_py


def _write_mnist(d):
    images = np.zeros((60000, 28, 28), np.uint8)
    images[0, 0, 0] = 255  # pad marker: must land at (2, 2) after padding
    labels = (np.arange(60000) % 10).astype(np.uint8)
    with gzip.open(os.path.join(d, "train-images-idx3-ubyte.gz"), "wb") as f:
        f.write(b"\x00" * 16 + images.tobytes())
    with gzip.open(os.path.join(d, "train-labels-idx1-ubyte.gz"), "wb") as f:
        f.write(b"\x00" * 8 + labels.tobytes())


@pytest.mark.slow
def test_load_mnist_pads_to_32(tmp_path):
    _write_mnist(str(tmp_path))
    images, onehot = load_mnist_u8(str(tmp_path))
    assert images.shape == (60000, 32, 32, 1)
    assert images[0, 2, 2, 0] == 255 and images[0, 0, 0, 0] == 0
    assert onehot.shape == (60000, 10) and onehot[3, 3] == 1.0


@pytest.mark.slow
def test_load_mnistrgb_triplets(tmp_path):
    _write_mnist(str(tmp_path))
    images, labels = load_mnistrgb_u8(str(tmp_path), num_images=16)
    assert images.shape == (16, 32, 32, 3) and labels is None


@pytest.mark.slow
def test_load_cifar10_batches(tmp_path):
    rng = np.random.RandomState(0)
    for batch in range(1, 6):
        data = {"data": rng.randint(0, 256, (10000, 3072), dtype=np.uint8)
                          .astype(np.uint8).reshape(10000, -1),
                "labels": list(rng.randint(0, 10, 10000))}
        with open(tmp_path / f"data_batch_{batch}", "wb") as f:
            pickle.dump(data, f)
    images, onehot = load_cifar10_u8(str(tmp_path))
    assert images.shape == (50000, 32, 32, 3) and onehot.shape == (50000, 10)
    # CHW -> HWC transpose round-trips the flat layout
    flat = images[0].transpose(2, 0, 1).reshape(-1)
    with open(tmp_path / "data_batch_1", "rb") as f:
        assert np.array_equal(flat, pickle.load(f)["data"][0])


def _write_svhn(d, n_per_batch=2):
    rng = np.random.RandomState(1)
    for batch in range(1, 4):
        images = rng.randint(0, 256, (n_per_batch, 3, 32, 32), dtype=np.uint8)
        labels = rng.randint(0, 10, n_per_batch).astype(np.uint8)
        with open(os.path.join(d, f"train_{batch}.pkl"), "wb") as f:
            pickle.dump((images, labels), f)


def test_create_from_source_svhn_end_to_end(tmp_path):
    src = tmp_path / "svhn"
    src.mkdir()
    _write_svhn(str(src))
    out = tmp_path / "tfr"
    paths = create_from_source("svhn", str(src), str(out), parts=1)
    # levels 5..2 shards + labels sidecar
    assert os.path.exists(out / "svhn-r05.tfrecords.000")
    assert os.path.exists(out / "svhn-r02.tfrecords.000")
    labels = np.load(out / "svhn-r05.labels.npy")
    assert labels.shape == (6, 10)
    # shuffled order is the exporter's RandomState(123) permutation
    images, onehot = load_svhn_u8(str(src))
    order = np.arange(6)
    np.random.RandomState(123).shuffle(order)
    recs = list(TFRecordFile(str(out / "svhn-r05.tfrecords.000")).records())
    assert len(recs) == 6
    data, _shape = _parse_example_py(recs[0], "data", "shape")
    got = np.frombuffer(data, np.uint8).reshape(3, 32, 32)
    assert np.array_equal(got.transpose(1, 2, 0), images[order[0]])
    assert np.array_equal(labels, onehot[order])


def test_create_from_source_celeba_crop(tmp_path):
    from PIL import Image

    src = tmp_path / "celeba" / "img_align_celeba_png"
    src.mkdir(parents=True)
    rng = np.random.RandomState(2)
    for i in range(4):
        arr = rng.randint(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(src / f"{i:06d}.png")
    out = tmp_path / "tfr"
    create_from_source("celeba", str(tmp_path / "celeba"), str(out),
                       expected_images=None)
    rec = next(iter(TFRecordFile(str(out / "celeba-r07.tfrecords.000")).records()))
    _data, shape = _parse_example_py(rec, "data", "shape")
    assert tuple(shape) == (3, 128, 128)
    assert os.path.exists(out / "celeba-r02.tfrecords.000")


def test_registry_covers_reference_sources():
    assert set(SOURCE_CREATORS) == {"mnist", "mnistrgb", "cifar10",
                                    "cifar100", "svhn", "celeba"}
