"""First-party LMDB reader + LSUN/CelebA-HQ dataset creators.

Covers the dataset-preparation tail (reference
dataset_tool.py:658-740 create_lsun/create_lsun_wide and
prepare_celeba_hq_tfrecords.py:99-165 prepare_celeba): the LMDB reader is
exercised against a structurally valid environment built by the test-only
fixture writer (tests/lmdb_fixture.py) — inline values, overflow (F_BIGDATA)
values, multi-leaf B-trees, newest-meta selection — and the creators go
end-to-end from LMDB/folder to shards readable by the style data loader.
"""

import io
import os

import numpy as np
import pytest

from tests.lmdb_fixture import write_lmdb
from soft_intro_vae_tpu.data.lmdb_reader import LMDBFormatError, LMDBReader
from soft_intro_vae_tpu.data.tfrecords import TFRecordFile


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _webp_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="WEBP", lossless=True)
    return buf.getvalue()


class TestLMDBReader:
    def test_roundtrip_inline_values(self, tmp_path):
        p = str(tmp_path / "data.mdb")
        items = [(f"k{i:03d}".encode(), bytes([i]) * (10 + i)) for i in range(20)]
        write_lmdb(p, items)
        with LMDBReader(p) as db:
            assert len(db) == 20
            got = list(db.items())
        assert got == sorted(items)

    def test_env_directory_path(self, tmp_path):
        write_lmdb(str(tmp_path / "data.mdb"), [(b"a", b"1")])
        with LMDBReader(str(tmp_path)) as db:  # dir containing data.mdb
            assert list(db.items()) == [(b"a", b"1")]

    def test_overflow_values(self, tmp_path):
        """Values past the inline threshold land on overflow pages spanning
        multiple pages — the LSUN case (multi-KB image blobs)."""
        p = str(tmp_path / "data.mdb")
        rs = np.random.RandomState(0)
        items = [(f"{i:08d}".encode(), rs.bytes(3000 + 4096 * i)) for i in range(4)]
        items.append((b"small", b"xy"))
        write_lmdb(p, items)
        with LMDBReader(p) as db:
            got = dict(db.items())
        for k, v in items:
            assert got[k] == v, k

    def test_multi_leaf_btree(self, tmp_path):
        """Enough entries to force several leaf pages under a branch root;
        iteration stays in key order."""
        p = str(tmp_path / "data.mdb")
        items = [(f"key-{i:05d}".encode(), bytes([i % 256]) * 200)
                 for i in range(100)]
        write_lmdb(p, items)
        with LMDBReader(p) as db:
            assert db.meta.main_depth == 2
            got = list(db.items())
        assert [k for k, _ in got] == [k for k, _ in sorted(items)]
        assert dict(got) == dict(items)

    def test_bad_magic_rejected(self, tmp_path):
        p = str(tmp_path / "data.mdb")
        with open(p, "wb") as f:
            f.write(b"\0" * 8192)
        with pytest.raises(LMDBFormatError, match="magic"):
            LMDBReader(p)

    def test_empty_env(self, tmp_path):
        p = str(tmp_path / "data.mdb")
        write_lmdb(p, [])
        with LMDBReader(p) as db:
            assert len(db) == 0
            assert list(db.items()) == []


class TestLSUNCreators:
    def _make_lsun_env(self, tmp_path, n=6, h=96, w=128):
        """Webp-encoded landscape images keyed like LSUN (hash-ish keys)."""
        rs = np.random.RandomState(7)
        imgs = [rs.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)]
        items = [(f"{i:040x}".encode(), _webp_bytes(im)) for i, im in enumerate(imgs)]
        p = str(tmp_path / "data.mdb")
        write_lmdb(p, items)
        return p, imgs

    def test_create_lsun_shards(self, tmp_path):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import create_lsun

        env, imgs = self._make_lsun_env(tmp_path)
        out = str(tmp_path / "tfr")
        paths = create_lsun(out, env, resolution=32, max_images=4, name="lsun")
        # levels 2..5, 1 part each
        assert len(paths) == 4
        recs = list(TFRecordFile(os.path.join(out, "lsun-r05.tfrecords.000")).examples())
        assert len(recs) == 4
        data, shape = recs[0]
        assert tuple(shape) == (3, 32, 32)
        # center-crop-to-square semantics: the crop of the first source image,
        # resized, matches what PIL produces directly
        from PIL import Image

        src = imgs[0]
        crop = min(src.shape[:2])
        sq = src[(src.shape[0] - crop) // 2:(src.shape[0] + crop) // 2,
                 (src.shape[1] - crop) // 2:(src.shape[1] + crop) // 2]
        want = np.asarray(Image.fromarray(sq, "RGB").resize((32, 32), Image.LANCZOS))
        got = np.frombuffer(data, np.uint8).reshape(3, 32, 32).transpose(1, 2, 0)
        np.testing.assert_array_equal(got, want)

    def test_create_lsun_skips_bad_records(self, tmp_path):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import create_lsun

        rs = np.random.RandomState(8)
        items = [(b"00-good", _webp_bytes(rs.randint(0, 255, (64, 64, 3), np.uint8))),
                 (b"01-bad", b"this is not an image"),
                 (b"02-good", _webp_bytes(rs.randint(0, 255, (64, 64, 3), np.uint8)))]
        env = str(tmp_path / "data.mdb")
        write_lmdb(env, items)
        out = str(tmp_path / "tfr")
        create_lsun(out, env, resolution=16, name="x")
        recs = list(TFRecordFile(os.path.join(out, "x-r04.tfrecords.000")).examples())
        assert len(recs) == 2  # bad record skipped, not fatal (dataset_tool.py:686)

    def test_create_lsun_wide_letterbox(self, tmp_path):
        from soft_intro_vae_tpu.cli.prepare_tfrecords import create_lsun_wide

        rs = np.random.RandomState(9)
        # one wide-enough source, one too small (skipped)
        items = [(b"a", _webp_bytes(rs.randint(0, 255, (80, 130, 3), np.uint8))),
                 (b"b", _webp_bytes(rs.randint(0, 255, (10, 12, 3), np.uint8)))]
        env = str(tmp_path / "data.mdb")
        write_lmdb(env, items)
        out = str(tmp_path / "tfr")
        create_lsun_wide(out, env, width=32, height=16, name="w")
        recs = list(TFRecordFile(os.path.join(out, "w-r05.tfrecords.000")).examples())
        assert len(recs) == 1
        img = np.frombuffer(recs[0][0], np.uint8).reshape(3, 32, 32).transpose(1, 2, 0)
        # letterbox: top and bottom (32-16)/2 = 8 rows black
        assert (img[:8] == 0).all() and (img[-8:] == 0).all()
        assert img[8:24].any()


class TestCelebAHQCreator:
    def test_train_test_split_labels_and_lods(self, tmp_path):
        from PIL import Image

        from soft_intro_vae_tpu.cli.prepare_tfrecords import create_celeba_hq

        src = tmp_path / "imgs"
        src.mkdir()
        rs = np.random.RandomState(10)
        for i in range(10):
            Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
                src / f"{i:05d}.png")
        out = str(tmp_path / "tfr")
        paths = create_celeba_hq(str(src), out, train_size=8, test_size=2,
                                 parts=2, max_level=4, name="chq")
        # train: levels 2..4 x 2 parts; test: same
        assert len(paths) == 3 * 2 * 2
        train_labels, test_labels = set(), set()
        for part in range(2):
            f = TFRecordFile(os.path.join(out, f"chq-r04.tfrecords.{part:03d}"))
            for _data, shape, label in f.examples_with_label():
                assert tuple(shape) == (3, 16, 16)
                train_labels.add(label)
            f = TFRecordFile(os.path.join(out, f"chq-test-r04.tfrecords.{part:03d}"))
            for _data, shape, label in f.examples_with_label():
                test_labels.add(label)
        # first 8 indices train, next 2 test (prepare_celeba:106-121)
        assert train_labels == set(range(8))
        assert test_labels == {8, 9}

    def test_lod_cascade_truncating_downscale(self, tmp_path):
        """Reference avg_pool2d(...).to(uint8) truncates — e.g. four pixels
        averaging 10.75 must become 10, not 11."""
        from PIL import Image

        from soft_intro_vae_tpu.cli.prepare_tfrecords import create_celeba_hq

        src = tmp_path / "imgs"
        src.mkdir()
        img = np.full((8, 8, 3), 10, np.uint8)
        img[::2, ::2] = 13  # every 2x2 block mean = (13+10+10+10)/4 = 10.75
        Image.fromarray(img).save(src / "00000.png")
        out = str(tmp_path / "tfr")
        create_celeba_hq(str(src), out, train_size=1, test_size=0,
                         max_level=3, name="t")
        recs = list(TFRecordFile(os.path.join(out, "t-r02.tfrecords.000")).examples())
        assert len(recs) == 1
        data, shape = recs[0]
        got = np.frombuffer(data, np.uint8).reshape(tuple(shape))
        assert got.min() == 10 and got.max() == 10  # truncated, not rounded


def test_cli_subcommands(tmp_path):
    """create-lsun and create-celeba-hq via the CLI entry."""
    from PIL import Image

    from soft_intro_vae_tpu.cli.prepare_tfrecords import main

    rs = np.random.RandomState(11)
    env = str(tmp_path / "data.mdb")
    write_lmdb(env, [(b"k", _webp_bytes(rs.randint(0, 255, (40, 40, 3), np.uint8)))])
    main(["create-lsun", "-i", env, "-o", str(tmp_path / "o1"),
          "--resolution", "16", "--name", "l"])
    assert os.path.exists(tmp_path / "o1" / "l-r04.tfrecords.000")

    src = tmp_path / "imgs"
    src.mkdir()
    Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(src / "00000.png")
    main(["create-celeba-hq", "-i", str(src), "-o", str(tmp_path / "o2"),
          "--train-size", "1", "--test-size", "0", "--max-level", "3", "--name", "c"])
    assert os.path.exists(tmp_path / "o2" / "c-r03.tfrecords.000")
