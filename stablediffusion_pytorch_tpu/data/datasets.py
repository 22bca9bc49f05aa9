"""Image datasets returning NHWC numpy arrays in [-1, 1] plus condition
dicts — the framework-side equivalents of the reference's torch Datasets.

  * MnistDataset  — class-subdir png scan, optional {'class': int} condition,
    optional precomputed-latent mode (reference: dataset/mnist_dataset.py:10-95)
  * CelebDataset  — CelebA-HQ-img / celeba-caption / CelebAMask-HQ-mask scan,
    resize + center-crop, random caption line per item, 19-class mask one-hot
    with background dropped, module-level list/latent caches, corrupted-file
    resampling (reference: dataset/celeb_dataset.py:16-238)

The reference returns CHW torch tensors; here everything is HWC numpy (TPU
layout), and masks are (H, W, 18) float32.
"""

from __future__ import annotations

import glob
import logging
import os
import random
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageFile, UnidentifiedImageError

from stablediffusion_pytorch_tpu.utils.diffusion_utils import load_latents

ImageFile.LOAD_TRUNCATED_IMAGES = True  # tolerate truncated files (celeb_dataset.py:13)

log = logging.getLogger(__name__)

_GLOBAL_IMAGE_CACHE: dict = {}
_GLOBAL_LATENT_CACHE: dict = {}

# CelebAMask-HQ part labels (celeb_dataset.py:104-105)
CELEB_MASK_LABELS = [
    "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear",
    "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l",
    "neck", "cloth",
]


def _to_unit_range(im: Image.Image, channels: int) -> np.ndarray:
    """PIL -> HWC float32 in [-1, 1]."""
    if channels == 1:
        im = im.convert("L")
        arr = np.asarray(im, dtype=np.float32)[..., None] / 255.0
    else:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return 2.0 * arr - 1.0


def _resize_center_crop(im: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(size) + CenterCrop(size) semantics."""
    w, h = im.size
    scale = size / min(w, h)
    im = im.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                   Image.BILINEAR)
    w, h = im.size
    left = (w - size) // 2
    top = (h - size) // 2
    return im.crop((left, top, left + size, top + size))


class MnistDataset:
    def __init__(self, split: str, im_path: str, im_size: int = 28,
                 im_channels: int = 1, use_latents: bool = False,
                 latent_path: Optional[str] = None,
                 condition_config: Optional[dict] = None):
        self.split = split
        self.im_size = im_size
        self.im_channels = im_channels
        self.condition_types = ([] if condition_config is None
                                else condition_config["condition_types"])
        self.latent_maps = None
        self.use_latents = False

        self.images, self.labels = self._load_images(im_path)

        if use_latents and latent_path is not None:
            latent_maps = load_latents(latent_path)
            if len(latent_maps) == len(self.images):
                self.use_latents = True
                self.latent_maps = latent_maps
                log.info("Found %d latents", len(latent_maps))
            else:
                log.info("Latents not found")

    def _load_images(self, im_path) -> Tuple[List[str], List[int]]:
        assert os.path.exists(im_path), f"images path {im_path} does not exist"
        ims, labels = [], []
        for d_name in sorted(os.listdir(im_path)):
            fnames = []
            for ext in ("png", "jpg", "jpeg"):
                fnames += glob.glob(os.path.join(im_path, d_name, f"*.{ext}"))
            for fname in sorted(fnames):
                ims.append(fname)
                if "class" in self.condition_types:
                    labels.append(int(d_name))
        log.info("Found %d images for split %s", len(ims), self.split)
        return ims, labels

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        cond_inputs: Dict = {}
        if "class" in self.condition_types:
            cond_inputs["class"] = self.labels[index]

        if self.use_latents:
            latent = np.asarray(self.latent_maps[self.images[index]])
            return latent if not self.condition_types else (latent, cond_inputs)

        with Image.open(self.images[index]) as im:
            arr = _to_unit_range(im, self.im_channels)
        return arr if not self.condition_types else (arr, cond_inputs)


class CelebDataset:
    def __init__(self, split: str, im_path: str, im_size: int = 256,
                 im_channels: int = 3, im_ext: str = "jpg",
                 use_latents: bool = False, latent_path: Optional[str] = None,
                 condition_config: Optional[dict] = None,
                 mask_hw: Optional[Tuple[int, int]] = None):
        self.split = split
        self.im_size = im_size
        self.im_channels = im_channels
        self.im_path = im_path
        self.use_latents = False
        self._latents = None
        self.condition_types = ([] if condition_config is None
                                else condition_config["condition_types"])

        self.idx_to_cls_map = {}
        self.cls_to_idx_map = {}
        if "image" in self.condition_types:
            icc = condition_config["image_condition_config"]
            self.mask_channels = icc["image_condition_input_channels"]
            # mask_hw: consumer-side resolution hint. One-hot commutes with
            # nearest resize, so a trainer that immediately downsamples the
            # mask to latent resolution (tools/train_ddpm_cond.py) can ask
            # the dataset to produce it there directly — at 512^2 the
            # per-item one-hot alone is ~9 ms of host time (measured,
            # PERF.md round 3), ~250x the latent-res cost, and the single
            # data-feed CPU is part of the train-step critical path.
            self.mask_h, self.mask_w = mask_hw or (
                icc["image_condition_h"], icc["image_condition_w"])

        self.images, self.texts, self.masks = self._load_images(im_path)

        if use_latents and latent_path is not None:
            latents = self._prepare_latents(latent_path)
            if latents is not None:
                self.use_latents = True
                self._latents = latents
                log.info("Found %d latents", latents.shape[0])
            else:
                log.info("Latents not found")

    # ------------------------------------------------------------------
    def _load_images(self, im_path):
        assert os.path.exists(im_path), f"images path {im_path} does not exist"
        caption_dir = os.path.join(im_path, "celeba-caption")
        mask_dir = os.path.join(im_path, "CelebAMask-HQ-mask")
        img_dir = os.path.join(im_path, "CelebA-HQ-img")

        cache_key = (img_dir, tuple(self.condition_types))
        cached = _GLOBAL_IMAGE_CACHE.get(cache_key)
        if cached is not None:
            return (cached["images"][:], cached["texts"][:], cached["masks"][:])

        entries = []
        with os.scandir(img_dir) as it:
            for entry in it:
                if entry.is_file() and entry.name.lower().endswith(
                        (".png", ".jpg", ".jpeg")):
                    entries.append(entry.path)

        def _sort_key(path):
            stem = os.path.splitext(os.path.basename(path))[0]
            try:
                return (0, int(stem))
            except ValueError:
                return (1, stem)

        entries.sort(key=_sort_key)

        if "image" in self.condition_types:
            self.idx_to_cls_map = dict(enumerate(CELEB_MASK_LABELS))
            self.cls_to_idx_map = {v: k for k, v in self.idx_to_cls_map.items()}

        ims, texts, masks = [], [], []
        for fname in entries:
            ims.append(fname)
            stem = os.path.splitext(os.path.basename(fname))[0]
            if "text" in self.condition_types:
                caption_path = os.path.join(caption_dir, f"{stem}.txt")
                if not os.path.exists(caption_path):
                    raise FileNotFoundError(
                        f"Caption file not found for image {fname}")
                texts.append(caption_path)
            if "image" in self.condition_types:
                masks.append(os.path.join(mask_dir, f"{int(stem)}.png"))
        if "text" in self.condition_types:
            assert len(texts) == len(ims), \
                "Condition Type Text but could not find captions for all images"
        if "image" in self.condition_types:
            assert len(masks) == len(ims), \
                "Condition Type Image but could not find masks for all images"
        log.info("Found %d images / %d masks / %d captions",
                 len(ims), len(masks), len(texts))
        _GLOBAL_IMAGE_CACHE[cache_key] = {
            "images": ims, "texts": texts, "masks": masks}
        return ims, texts, masks

    def _prepare_latents(self, latent_path):
        """Stack all latents into one shared array (the reference keeps one
        share_memory_() tensor so DDP workers don't duplicate it,
        celeb_dataset.py:136-162)."""
        cache_key = (latent_path,)
        cached = _GLOBAL_LATENT_CACHE.get(cache_key)
        if cached is not None:
            return cached
        latent_maps = load_latents(latent_path)
        if len(latent_maps) != len(self.images):
            return None
        latents = []
        for img_path in self.images:
            latent = latent_maps.get(img_path)
            if latent is None:
                latent = latent_maps.get(os.path.basename(img_path))
            if latent is None:
                return None
            latents.append(np.asarray(latent))
        arr = np.stack(latents)
        _GLOBAL_LATENT_CACHE[cache_key] = arr
        return arr

    # ------------------------------------------------------------------
    def get_mask(self, index: int) -> np.ndarray:
        """Label-map png -> nearest-resize to (mask_h, mask_w) -> clamp ->
        one-hot 19 -> drop background -> (H, W, 18) float32
        (reference: celeb_dataset.py:164-184)."""
        try:
            with Image.open(self.masks[index]) as mask_im:
                mask_im = mask_im.resize((self.mask_w, self.mask_h),
                                         Image.NEAREST)
                label = np.asarray(mask_im, dtype=np.int64)
            label = np.clip(label, 0, self.mask_channels)
            one_hot = np.eye(self.mask_channels + 1, dtype=np.float32)[label]
            return one_hot[..., 1:]  # discard background channel
        except (OSError, UnidentifiedImageError) as e:
            log.warning("Skipping corrupted mask at %s (%s)",
                        self.masks[index], e)
            return np.zeros((self.mask_h, self.mask_w, self.mask_channels),
                            np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        cond_inputs: Dict = {}
        if "text" in self.condition_types:
            captions = _read_captions(self.texts[index])
            cond_inputs["text"] = random.sample(captions, k=1)[0]
        if "image" in self.condition_types:
            cond_inputs["image"] = self.get_mask(index)

        if self.use_latents and self._latents is not None:
            latent = self._latents[index]
            return latent if not self.condition_types else (latent, cond_inputs)

        # corrupted-image resample-up-to-10x fallback (celeb_dataset.py:208-220)
        for _ in range(10):
            try:
                with Image.open(self.images[index]) as im:
                    im = _resize_center_crop(im, self.im_size)
                    arr = _to_unit_range(im, self.im_channels)
                break
            except (OSError, UnidentifiedImageError) as e:
                log.warning("corrupted image %s (%s); resampling...",
                            self.images[index], e)
                index = random.randint(0, len(self.images) - 1)
        else:
            log.error("too many corrupted images; returning zero image")
            arr = np.zeros((self.im_size, self.im_size, self.im_channels),
                           np.float32)
        return arr if not self.condition_types else (arr, cond_inputs)


@lru_cache(maxsize=4096)
def _read_captions(caption_path: str):
    with open(caption_path, "r", encoding="utf-8") as f:
        return tuple(line.strip() for line in f if line.strip())
