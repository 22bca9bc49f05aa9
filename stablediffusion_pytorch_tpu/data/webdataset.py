"""Tar-shard streaming dataset (WebDataset-style).

Re-implements reference dataset/load_data.py:24-143 (experimental loader
over ``data_*.tar`` shards of a 512^2 flux-generated 2M-image set; not wired
into trainers there either — provided for parity and large-scale input
pipelines) without the webdataset dependency: plain tarfile streaming of
(image, caption) pairs grouped by key, plus shard summary tooling.
"""

from __future__ import annotations

import glob
import io
import logging
import os
import tarfile
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

log = logging.getLogger("sdtpu")

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp")
TEXT_EXTS = (".txt", ".caption")


def list_shards(path: str, pattern: str = "data_*.tar") -> List[str]:
    return sorted(glob.glob(os.path.join(path, pattern)))


def iter_samples(shard_paths: List[str], im_size: Optional[int] = None,
                 shard_index: int = 0, num_shards: int = 1
                 ) -> Iterator[Tuple[np.ndarray, str]]:
    """Stream (image [-1,1] HWC, caption) pairs; shards are striped across
    workers by index for multi-host input."""
    for spath in shard_paths[shard_index::num_shards]:
        with tarfile.open(spath, "r") as tf:
            current: Dict[str, bytes] = {}
            current_key = None
            for member in tf:
                if not member.isfile():
                    continue
                key, ext = os.path.splitext(member.name)
                if current_key is not None and key != current_key and current:
                    sample = _assemble(current, im_size)
                    if sample is not None:
                        yield sample
                    current = {}
                current_key = key
                current[ext.lower()] = tf.extractfile(member).read()
            if current:
                sample = _assemble(current, im_size)
                if sample is not None:
                    yield sample


def _assemble(parts: Dict[str, bytes], im_size: Optional[int]):
    img_bytes = next((parts[e] for e in IMAGE_EXTS if e in parts), None)
    if img_bytes is None:
        return None
    caption = next((parts[e].decode("utf-8", "replace").strip()
                    for e in TEXT_EXTS if e in parts), "")
    try:
        with Image.open(io.BytesIO(img_bytes)) as im:
            im = im.convert("RGB")
            if im_size:
                im = im.resize((im_size, im_size), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0
    except Exception as e:
        log.warning("skipping corrupt sample: %s", e)
        return None
    return arr, caption


def summarize_shards(path: str, pattern: str = "data_*.tar") -> Dict:
    """Per-shard sample counts + totals (reference's summary tooling)."""
    out = {"shards": {}, "total_samples": 0}
    for spath in list_shards(path, pattern):
        with tarfile.open(spath, "r") as tf:
            keys = {os.path.splitext(m.name)[0] for m in tf if m.isfile()}
        out["shards"][os.path.basename(spath)] = len(keys)
        out["total_samples"] += len(keys)
    return out
