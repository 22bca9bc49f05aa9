"""Latent store: pickle shards of {image_path: latent} in 1000-image parts.

Write-side counterpart of utils.diffusion_utils.load_latents, matching the
reference shard contract: ``<dir>/<part>.pkl`` holding a dict of
``{image_path: latent_array[None]}`` per 1000 images
(reference: tools/infer_vqvae.py:85-111, gen_vqvae_latents.py:80-107). The
dataset switches to latent mode only when latent count == image count
(celeb_dataset.py:142-144).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, Tuple

import numpy as np

SHARD_SIZE = 1000


def save_latent_shards(latent_dir: str,
                       items: Iterable[Tuple[str, np.ndarray]],
                       shard_size: int = SHARD_SIZE) -> int:
    """Stream (image_path, latent HWC) pairs into numbered pickle shards.
    Returns the number of latents written."""
    os.makedirs(latent_dir, exist_ok=True)
    shard: Dict[str, np.ndarray] = {}
    part = 0
    count = 0

    def flush():
        nonlocal shard, part
        if shard:
            with open(os.path.join(latent_dir, f"{part}.pkl"), "wb") as f:
                pickle.dump(shard, f)
            part += 1
            shard = {}

    for path, latent in items:
        # stored with a leading singleton axis, as the reference does
        # (infer_vqvae.py keeps encoded_output of batch-size-1 loops)
        shard[path] = np.asarray(latent)[None]
        count += 1
        if len(shard) >= shard_size:
            flush()
    flush()
    return count
