#!/usr/bin/env python
"""Offline dataset prep: raw RGBA byte dump -> per-view PNGs.

Equivalent of the reference's read_image.py (SURVEY §2.4,
/root/reference/read_image.py:7-33): a renderer app writes a raw
byte file of N concatenated RGBA views; this reshapes to (N, H, W, 4)
and writes ``image-{i}.png`` files in the layout the multiview loader
expects (nerf_rs_tpu/data/images.py). Not on the training path.

Usage:
  python tools/read_image.py dump.bin out_dir --width 128 --height 128
"""

import argparse
import os

import numpy as np
from PIL import Image


def read_raw_views(path: str, width: int, height: int) -> np.ndarray:
    data = np.fromfile(path, dtype=np.uint8)
    px = width * height * 4
    assert data.size % px == 0, (
        f"file size {data.size} is not a multiple of one {width}x{height} RGBA view"
    )
    n = data.size // px
    return data.reshape(n, height, width, 4)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("out_dir")
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    args = p.parse_args()
    views = read_raw_views(args.input, args.width, args.height)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, v in enumerate(views):
        Image.fromarray(v).save(os.path.join(args.out_dir, f"image-{i}.png"))
    print(f"wrote {len(views)} views to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
