"""Image grid saving (PIL): the framework's torchvision.utils.make_grid
stand-in for recon sheets and sample dumps (reference usage:
tools/train_vqvae.py:106-121, tools/sample_ddpm_text_image_cond.py:94-107).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float HWC -> uint8 HWC."""
    img = np.clip((np.asarray(img, np.float32) + 1.0) / 2.0, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def make_grid(images: Sequence[np.ndarray], nrow: int = 8,
              padding: int = 2) -> np.ndarray:
    """Stack HWC uint8/float images into a grid (row-major, nrow per row)."""
    imgs = [to_uint8(im) if im.dtype != np.uint8 else im for im in images]
    n = len(imgs)
    h, w, c = imgs[0].shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), np.uint8)
    for i, im in enumerate(imgs):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = im
    return grid


def save_image_grid(path: str, images: Sequence[np.ndarray],
                    nrow: int = 8) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = make_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
