"""Bulk image resizing utility (reference: resize_images.py).

Usage: ``python -m stablediffusion_pytorch_tpu.tools.resize_images
--in-dir <src> --out-dir <dst> --size 256 [--mode bilinear|nearest]``
"""

from __future__ import annotations

import argparse
import logging
import os

from PIL import Image

log = logging.getLogger("sdtpu")


def resize_dir(in_dir: str, out_dir: str, size: int,
               mode: str = "bilinear") -> int:
    os.makedirs(out_dir, exist_ok=True)
    resample = Image.BILINEAR if mode == "bilinear" else Image.NEAREST
    n = 0
    for f in sorted(os.listdir(in_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        with Image.open(os.path.join(in_dir, f)) as im:
            im.resize((size, size), resample).save(os.path.join(out_dir, f))
        n += 1
    log.info("resized %d images -> %s", n, out_dir)
    return n


def main():
    parser = argparse.ArgumentParser(description="Bulk image resize")
    parser.add_argument("--in-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--mode", choices=["bilinear", "nearest"],
                        default="bilinear")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    resize_dir(args.in_dir, args.out_dir, args.size, args.mode)


if __name__ == "__main__":
    main()
