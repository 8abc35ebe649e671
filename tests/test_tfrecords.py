"""TFRecord reader/writer tests: native C++ reader vs pure-Python parser."""

import os

import numpy as np
import pytest

from soft_intro_vae_tpu.data import tfrecords as tfr


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (6, 3, 8, 8), dtype=np.uint8)
    examples = [
        tfr.make_example({"shape": [3, 8, 8], "data": img.tobytes(), "label": [i]})
        for i, img in enumerate(images)
    ]
    path = str(tmp_path / "part0.tfrecords")
    tfr.write_tfrecord(path, examples)
    return path, images


def test_native_library_builds():
    lib = tfr._load_native()
    assert lib is not None, "C++ TFRecord reader failed to build"


def test_roundtrip_native(shard):
    path, images = shard
    assert tfr._load_native() is not None
    got = tfr.load_uint8_images([path])
    assert got.shape == (6, 8, 8, 3)
    np.testing.assert_array_equal(got, images.transpose(0, 2, 3, 1))


def test_roundtrip_pure_python(shard, monkeypatch):
    path, images = shard
    monkeypatch.setattr(tfr, "_lib", None)
    monkeypatch.setattr(tfr, "_lib_failed", True)  # force python path
    got = tfr.load_uint8_images([path])
    np.testing.assert_array_equal(got, images.transpose(0, 2, 3, 1))


def test_native_and_python_agree_on_records(shard, monkeypatch):
    path, _ = shard
    native = list(tfr.TFRecordFile(path).records())
    monkeypatch.setattr(tfr, "_lib", None)
    monkeypatch.setattr(tfr, "_lib_failed", True)
    py = list(tfr.TFRecordFile(path).records())
    assert native == py


def test_crc_detects_corruption(shard, tmp_path):
    path, _ = shard
    raw = bytearray(open(path, "rb").read())
    raw[20] ^= 0xFF  # flip a data byte
    bad = str(tmp_path / "bad.tfrecords")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(tfr.TFRecordFile(bad).records())
    # crc check off -> no error
    n = len(list(tfr.TFRecordFile(bad, check_crc=False).records()))
    assert n == 6


def test_masked_crc_matches_tf_convention():
    # known-answer: crc32c("123456789") = 0xE3069283
    assert tfr._crc32c_py(b"123456789") == 0xE3069283


def test_shard_assignment_matches_reference_semantics():
    paths = [f"p{i:03d}" for i in range(8)]
    r0 = tfr.shard_paths_for_rank(paths, 0, 4)
    r3 = tfr.shard_paths_for_rank(paths, 3, 4)
    assert r0 == ["p000", "p004"]
    assert r3 == ["p003", "p007"]
    with pytest.raises(ValueError):
        tfr.shard_paths_for_rank(paths[:6], 0, 4)


def test_int64_feature_native(shard):
    path, _ = shard
    lib = tfr._load_native()
    assert lib is not None
    import ctypes

    h = lib.tfr_open(path.encode(), 1)
    assert h
    labels = []
    ints = (ctypes.c_int64 * 4)()
    while lib.tfr_next(h) >= 0:
        cnt = lib.tfr_feature_int64s(h, b"label", ints, 4)
        assert cnt == 1
        labels.append(int(ints[0]))
    lib.tfr_close(h)
    assert labels == list(range(6))
