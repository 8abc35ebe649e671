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
