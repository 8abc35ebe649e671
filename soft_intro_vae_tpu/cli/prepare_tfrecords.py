"""Dataset preparation: image folders -> per-LOD TFRecord shards.

Capability parity with the reference's dataset_preparation tools
(/root/reference/style_soft_intro_vae/dataset_preparation/dataset_tool.py
create_from_images + prepare_celeba_hq_tfrecords.py + split_tfrecords_ffhq.py)
WITHOUT TensorFlow: records are written by our own writer
(data/tfrecords.py), one file set per resolution level r (4..2^max_level),
split into ``parts`` shards per level so the per-rank shard assignment
(dataloader.py:53-67) works.

Record schema matches the reference reader: 'shape' int64 [C,H,W],
'data' bytes (CHW uint8).

Usage:
  python -m soft_intro_vae_tpu.cli.prepare_tfrecords -i ./images -o ./tfr \
      --max-level 8 --parts 16 --name celeba
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

from soft_intro_vae_tpu.data.tfrecords import make_example, write_tfrecord


def downscale_u8(img: np.ndarray) -> np.ndarray:
    """2x box downscale of an HWC uint8 image."""
    h, w, c = img.shape
    f = img.astype(np.float32).reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def load_folder(path: str, size: int, limit: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    files = sorted(f for f in os.listdir(path) if f.lower().endswith(exts))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    out = np.empty((len(files), size, size, 3), np.uint8)
    for i, name in enumerate(files):
        img = Image.open(os.path.join(path, name)).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.LANCZOS)
        out[i] = np.asarray(img, np.uint8)
    return out


def write_multires_shards(images_u8: np.ndarray, out_dir: str, name: str,
                          max_level: int, min_level: int = 2, parts: int = 1) -> List[str]:
    """images (N, H, W, C) uint8 at 2^max_level -> shard files
    '{name}-r{level:02d}.tfrecords.{part:03d}' for level in [min..max]."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    cur = images_u8
    n = cur.shape[0]
    order = np.arange(n)
    for level in range(max_level, min_level - 1, -1):
        res = 2 ** level
        assert cur.shape[1] == res, (cur.shape, res)
        for part in range(parts):
            sel = order[part::parts]
            examples = []
            for i in sel:
                chw = cur[i].transpose(2, 0, 1)
                examples.append(make_example({
                    "shape": list(chw.shape),
                    "data": chw.tobytes(),
                }))
            p = os.path.join(out_dir, f"{name}-r{level:02d}.tfrecords.{part:03d}")
            write_tfrecord(p, examples)
            paths.append(p)
        if level > min_level:
            cur = np.stack([downscale_u8(im) for im in cur])
    return paths


def write_multires_shards_streaming(image_paths: List[str], out_dir: str, name: str,
                                    max_level: int, min_level: int = 2,
                                    parts: int = 1) -> List[str]:
    """Streaming variant of write_multires_shards: one image in memory at a
    time (the reference's dataset_tool.py processes FFHQ image-by-image the
    same way) — constant host memory for arbitrarily large folders."""
    from PIL import Image

    from soft_intro_vae_tpu.data.tfrecords import TFRecordWriter

    os.makedirs(out_dir, exist_ok=True)
    size = 2 ** max_level
    writers = {
        (level, part): TFRecordWriter(
            os.path.join(out_dir, f"{name}-r{level:02d}.tfrecords.{part:03d}"))
        for level in range(min_level, max_level + 1)
        for part in range(parts)
    }
    try:
        for i, path in enumerate(image_paths):
            img = Image.open(path).convert("RGB")
            if img.size != (size, size):
                img = img.resize((size, size), Image.LANCZOS)
            cur = np.asarray(img, np.uint8)
            part = i % parts
            for level in range(max_level, min_level - 1, -1):
                chw = cur.transpose(2, 0, 1)
                writers[(level, part)].write(make_example({
                    "shape": list(chw.shape), "data": chw.tobytes()}))
                if level > min_level:
                    cur = downscale_u8(cur)
    finally:
        for w in writers.values():
            w.close()
    return [w.path for w in writers.values()]


# ------------------------------------------------------- per-source loaders
# Parity with dataset_tool.py:537-658 (create_mnist/mnistrgb/cifar10/
# cifar100/svhn) and :741-755 (create_celeba): same file layouts, shape
# asserts, pad/crop specifics, and the exporter's RandomState(123) shuffle
# (dataset_tool.py:301-303). Labels ride along as '{name}-rNN.labels' (.npy),
# matching TFRecordExporter.add_labels' sidecar.
#
# NB the `_u8` suffix is deliberate: these return (uint8 images, onehot
# labels) for the TFRecord exporter — NOT the float32-[0,1] unlabeled
# trainer loaders of the same datasets in data/images.py.

_SHUFFLE_SEED = 123  # TFRecordExporter.choose_shuffled_order


def _shuffled_order(n: int) -> np.ndarray:
    order = np.arange(n)
    np.random.RandomState(_SHUFFLE_SEED).shuffle(order)
    return order


def _onehot(labels: np.ndarray) -> np.ndarray:
    out = np.zeros((labels.size, int(np.max(labels)) + 1), np.float32)
    out[np.arange(labels.size), labels] = 1.0
    return out


def load_mnist_u8(mnist_dir: str) -> tuple:
    """idx3/idx1 gz files -> ((60000,32,32,1) u8 zero-padded from 28, onehot)."""
    import gzip

    with gzip.open(os.path.join(mnist_dir, "train-images-idx3-ubyte.gz"), "rb") as f:
        images = np.frombuffer(f.read(), np.uint8, offset=16)
    with gzip.open(os.path.join(mnist_dir, "train-labels-idx1-ubyte.gz"), "rb") as f:
        labels = np.frombuffer(f.read(), np.uint8, offset=8)
    images = images.reshape(-1, 28, 28, 1)
    images = np.pad(images, [(0, 0), (2, 2), (2, 2), (0, 0)], constant_values=0)
    assert images.shape == (60000, 32, 32, 1) and images.dtype == np.uint8
    assert labels.shape == (60000,) and 0 == np.min(labels) and np.max(labels) == 9
    return images, _onehot(labels)


def load_mnistrgb_u8(mnist_dir: str, num_images: int = 1_000_000,
                  random_seed: int = 123) -> tuple:
    """Random MNIST digit triplets as RGB channels (dataset_tool.py:562-576)."""
    images, _ = load_mnist_u8(mnist_dir)
    images = images[..., 0]
    rnd = np.random.RandomState(random_seed)
    idx = rnd.randint(images.shape[0], size=(num_images, 3))
    return images[idx].transpose(0, 2, 3, 1), None  # (N,32,32,3)


def load_cifar10_u8(cifar10_dir: str) -> tuple:
    import pickle

    images, labels = [], []
    for batch in range(1, 6):
        with open(os.path.join(cifar10_dir, f"data_batch_{batch}"), "rb") as f:
            data = pickle.load(f, encoding="latin1")
        images.append(data["data"].reshape(-1, 3, 32, 32))
        labels.append(data["labels"])
    images = np.concatenate(images).transpose(0, 2, 3, 1)
    labels = np.concatenate(labels)
    assert images.shape == (50000, 32, 32, 3) and images.dtype == np.uint8
    assert 0 == np.min(labels) and np.max(labels) == 9
    return images, _onehot(labels)


def load_cifar100_u8(cifar100_dir: str) -> tuple:
    import pickle

    with open(os.path.join(cifar100_dir, "train"), "rb") as f:
        data = pickle.load(f, encoding="latin1")
    images = data["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.asarray(data["fine_labels"])
    assert images.shape == (50000, 32, 32, 3) and images.dtype == np.uint8
    assert 0 == np.min(labels) and np.max(labels) == 99
    return images, _onehot(labels)


def load_svhn_u8(svhn_dir: str) -> tuple:
    import pickle

    images, labels = [], []
    for batch in range(1, 4):
        with open(os.path.join(svhn_dir, f"train_{batch}.pkl"), "rb") as f:
            data = pickle.load(f, encoding="latin1")
        images.append(data[0])
        labels.append(data[1])
    images = np.concatenate(images)
    labels = np.concatenate(labels)
    assert images.shape[1:] == (3, 32, 32) and images.dtype == np.uint8
    return images.transpose(0, 2, 3, 1), _onehot(labels)


def load_celeba_u8(celeba_dir: str, cx: int = 89, cy: int = 121,
                expected_images: Optional[int] = 202599) -> tuple:
    """img_align_celeba_png/*.png -> 128x128 center crops at (cx, cy)."""
    import glob

    from PIL import Image

    files = sorted(glob.glob(os.path.join(celeba_dir, "img_align_celeba_png", "*.png")))
    if expected_images is not None and len(files) != expected_images:
        raise FileNotFoundError(
            f"expected {expected_images} images, found {len(files)}")
    out = np.empty((len(files), 128, 128, 3), np.uint8)
    for i, path in enumerate(files):
        img = np.asarray(Image.open(path))
        assert img.shape == (218, 178, 3), (path, img.shape)
        out[i] = img[cy - 64: cy + 64, cx - 64: cx + 64]
    return out, None


SOURCE_CREATORS = {
    "mnist": (load_mnist_u8, 5),
    "mnistrgb": (load_mnistrgb_u8, 5),
    "cifar10": (load_cifar10_u8, 5),
    "cifar100": (load_cifar100_u8, 5),
    "svhn": (load_svhn_u8, 5),
    "celeba": (load_celeba_u8, 7),
}


def create_from_source(source: str, input_dir: str, out_dir: str,
                       name: Optional[str] = None, parts: int = 1,
                       min_level: int = 2, **loader_kwargs) -> List[str]:
    """One per-source creator: load + shuffled order + per-LOD shards
    (+ '{name}-rNN.labels' sidecar when the source carries labels)."""
    loader, max_level = SOURCE_CREATORS[source]
    images, labels = loader(input_dir, **loader_kwargs)
    order = _shuffled_order(images.shape[0])
    images = images[order]
    name = name or source
    paths = write_multires_shards(images, out_dir, name, max_level,
                                  min_level=min_level, parts=parts)
    if labels is not None:
        lp = os.path.join(out_dir, f"{name}-r{max_level:02d}.labels")
        np.save(lp, labels[order])
        paths.append(lp + ".npy")
    return paths


def split_tfrecords(source_pattern: str, out_pattern: str, part_count: int,
                    train_size: int, min_level: int = 2, max_level: int = 10,
                    out_test_pattern: Optional[str] = None,
                    part_count_test: int = 1) -> int:
    """Split one-file-per-level TFRecords into per-part shards (capability
    parity with split_tfrecords_ffhq.py:96-130, without TensorFlow): the
    first ``train_size`` records of each level go round into ``part_count``
    train parts of train_size//part_count records; the remainder goes to
    test parts."""
    from soft_intro_vae_tpu.data.tfrecords import TFRecordFile, TFRecordWriter

    if train_size < part_count:
        raise ValueError(f"train_size {train_size} < part_count {part_count}")
    part_size = train_size // part_count
    total = 0  # records actually written (dropped tails are not counted)
    for level in range(min_level, max_level + 1):
        src = source_pattern % level
        if not os.path.exists(src):
            continue
        writers = []
        for part in range(part_count):
            path = out_pattern % (level, part)
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            writers.append(TFRecordWriter(path))
        test_writers = []
        if out_test_pattern:
            for part in range(part_count_test):
                path = out_test_pattern % (level, part)
                os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
                test_writers.append(TFRecordWriter(path))
        try:
            for n, rec in enumerate(TFRecordFile(src).records()):
                if n < train_size:
                    writers[min(n // part_size, part_count - 1)].write(rec)
                    total += 1
                elif test_writers:
                    test_writers[(n - train_size) % len(test_writers)].write(rec)
                    total += 1
        finally:
            for w in writers + test_writers:
                w.close()
    return total


def main(argv=None):
    ap = argparse.ArgumentParser(prog="prepare-tfrecords")
    sub = ap.add_subparsers(dest="command", required=True)

    p_create = sub.add_parser("create", help="image folder -> per-LOD shards")
    p_create.add_argument("-i", "--input", required=True, help="image folder")
    p_create.add_argument("-o", "--output", required=True, help="output dir")
    p_create.add_argument("--name", default="data")
    p_create.add_argument("--max-level", type=int, default=8)
    p_create.add_argument("--parts", type=int, default=1)
    p_create.add_argument("--limit", type=int, default=None)
    p_create.add_argument("--streaming", action="store_true",
                          help="constant-memory, one image at a time")

    p_src = sub.add_parser("create-source",
                           help="known source layout -> per-LOD shards "
                                "(mnist/mnistrgb/cifar10/cifar100/svhn/celeba)")
    p_src.add_argument("source", choices=sorted(SOURCE_CREATORS))
    p_src.add_argument("-i", "--input", required=True, help="source data dir")
    p_src.add_argument("-o", "--output", required=True, help="output dir")
    p_src.add_argument("--name", default=None)
    p_src.add_argument("--parts", type=int, default=1)
    p_src.add_argument("--num-images", type=int, default=1_000_000,
                       help="mnistrgb only: synthetic RGB triplet count")

    p_split = sub.add_parser("split", help="one-file-per-level -> per-part shards")
    p_split.add_argument("--source", required=True, help="pattern with one %%d (level)")
    p_split.add_argument("--out", required=True, help="pattern with two %% fields (level, part)")
    p_split.add_argument("--out-test", default=None)
    p_split.add_argument("--parts", type=int, required=True)
    p_split.add_argument("--parts-test", type=int, default=1)
    p_split.add_argument("--train-size", type=int, required=True)
    p_split.add_argument("--min-level", type=int, default=2)
    p_split.add_argument("--max-level", type=int, default=10)

    args = ap.parse_args(argv)
    if args.command == "create-source":
        kwargs = {"num_images": args.num_images} if args.source == "mnistrgb" else {}
        paths = create_from_source(args.source, args.input, args.output,
                                   name=args.name, parts=args.parts, **kwargs)
        print(f"wrote {len(paths)} files to {args.output}")
        return
    if args.command == "split":
        n = split_tfrecords(args.source, args.out, args.parts, args.train_size,
                            args.min_level, args.max_level, args.out_test, args.parts_test)
        print(f"split {n} records")
        return
    # default / "create"
    if args.streaming:
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        files = sorted(os.path.join(args.input, f) for f in os.listdir(args.input)
                       if f.lower().endswith(exts))
        if args.limit:
            files = files[: args.limit]
        paths = write_multires_shards_streaming(files, args.output, args.name,
                                                args.max_level, parts=args.parts)
    else:
        imgs = load_folder(args.input, 2 ** args.max_level, args.limit)
        paths = write_multires_shards(imgs, args.output, args.name, args.max_level,
                                      parts=args.parts)
    print(f"wrote {len(paths)} shards to {args.output}")


if __name__ == "__main__":
    main()
