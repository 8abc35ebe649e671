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


def main(argv=None):
    ap = argparse.ArgumentParser(prog="prepare-tfrecords")
    ap.add_argument("-i", "--input", required=True, help="image folder")
    ap.add_argument("-o", "--output", required=True, help="output dir")
    ap.add_argument("--name", default="data")
    ap.add_argument("--max-level", type=int, default=8)
    ap.add_argument("--parts", type=int, default=1)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)
    imgs = load_folder(args.input, 2 ** args.max_level, args.limit)
    paths = write_multires_shards(imgs, args.output, args.name, args.max_level, parts=args.parts)
    print(f"wrote {len(paths)} shards to {args.output}")


if __name__ == "__main__":
    main()
