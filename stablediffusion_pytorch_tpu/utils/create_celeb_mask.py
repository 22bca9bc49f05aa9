"""CelebAMask-HQ preprocessing: merge the 18 per-part annotation pngs into
one 512^2 label map per image.

Usage: ``python -m stablediffusion_pytorch_tpu.utils.create_celeb_mask
--anno-dir <CelebAMask-HQ-mask-anno> --out-dir <CelebAMask-HQ-mask>
[--num-images 30000]``

Re-implements reference utils/create_celeb_mask.py:12-32 (itself a copy of
the CelebAMask-HQ official script): annotation files live in
``<anno-dir>/<k//2000>/<k>_<part>.png``; each part paints label index i+1
into the label map (later parts overwrite earlier ones).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from PIL import Image

log = logging.getLogger("sdtpu")

# part order defines label indices 1..18 (reference list)
PARTS = ["skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow",
         "l_ear", "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat",
         "ear_r", "neck_l", "neck", "cloth"]


def build_mask(anno_dir: str, k: int, size: int = 512) -> np.ndarray:
    folder = os.path.join(anno_dir, str(k // 2000))
    label = np.zeros((size, size), np.uint8)
    for idx, part in enumerate(PARTS, start=1):
        path = os.path.join(folder, f"{k:05d}_{part}.png")
        if not os.path.exists(path):
            continue
        with Image.open(path) as im:
            part_map = np.asarray(im.convert("L"))
        label[part_map != 0] = idx
    return label


def main():
    parser = argparse.ArgumentParser(description="Merge CelebAMask parts")
    parser.add_argument("--anno-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--num-images", type=int, default=30000)
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for k in range(args.num_images):
        label = build_mask(args.anno_dir, k)
        Image.fromarray(label, "L").save(
            os.path.join(args.out_dir, f"{k}.png"))
        if k % 1000 == 0:
            log.info("merged %d/%d", k, args.num_images)


if __name__ == "__main__":
    main()
