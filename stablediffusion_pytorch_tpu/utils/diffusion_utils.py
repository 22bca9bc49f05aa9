"""Classifier-free-guidance training dropout + precomputed-latent loading.

Re-implements reference utils/diffusion_utils.py:7-46 with explicit PRNG
keys (jit-safe; drop probabilities are static floats, 0 disables the draw):

  * drop_text_condition  — per-sample Bernoulli(p) replaces rows with the
    empty-string embedding
  * drop_image_condition — per-sample keep-mask multiply (zeroed mask)
  * drop_class_condition — per-sample keep-mask multiply on the one-hot
  * load_latents         — merge '<dir>/*.pkl' shard dicts {path: latent}
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def load_latents(latent_path: str) -> Dict[str, np.ndarray]:
    """Merge pickled latent shards written by the latent-precompute tools
    (reference: utils/diffusion_utils.py:7-18; shards written by
    tools/infer_vqvae.py:85-111 / gen_vqvae_latents.py:80-107)."""
    latent_maps: Dict[str, np.ndarray] = {}
    for fname in glob.glob(os.path.join(latent_path, "*.pkl")):
        with open(fname, "rb") as f:
            s = pickle.load(f)
        for k, v in s.items():
            latent_maps[k] = np.asarray(v[0] if hasattr(v, "__getitem__") and
                                        getattr(v, "ndim", 0) == 4 else v)
    return latent_maps


def nearest_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """``jax.image.resize(method="nearest")`` on NHWC, with an exact
    strided-slice fast path for integer downsample ratios.

    XLA lowers nearest resize to a gather, which on TPU reads the FULL
    input through scattered HBM accesses — measured ~5.7 ms/step for the
    as-reference 512^2 18-ch mask at batch 32 (the bulk of the 3x
    as-reference bench penalty, VERDICT W9). For integer ratios the TF
    half-pixel convention picks input index ``i*r + r//2``, so a strided
    slice is bit-identical (verified vs jax.image.resize) and touches only
    the selected rows.
    """
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    if h % out_h == 0 and w % out_w == 0 and h >= out_h and w >= out_w:
        rh, rw = h // out_h, w // out_w
        return x[:, rh // 2::rh, rw // 2::rw, :]
    return jax.image.resize(x, (b, out_h, out_w, c), method="nearest")


def nearest_resize_np(x, out_h: int, out_w: int):
    """Host-side (numpy) twin of ``nearest_resize``'s strided-slice fast
    path, for integer downsample ratios only (returns None otherwise so the
    caller falls back to the device path).

    Running the slice BEFORE the host->device transfer matters on a
    relay-attached chip: serving a batch-8 request with full-res 256^2
    18-ch masks ships ~37 MB per call through the tunnel, vs ~0.6 MB after
    the slice — the transfer, not compute, dominated the serving benchmark
    (PERF.md round 3, tools/bench_serving.py). Bit-identical to the device
    slice: same TF half-pixel index ``i*r + r//2``.
    """
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return np.asarray(x)
    if h % out_h == 0 and w % out_w == 0 and h >= out_h and w >= out_w:
        rh, rw = h // out_h, w // out_w
        # contiguous copy: the strided view would otherwise force an
        # implicit copy at jnp.asarray time, with less predictable timing
        return np.ascontiguousarray(
            np.asarray(x)[:, rh // 2::rh, rw // 2::rw, :])
    return None


def resize_mask_to_latent(mask: jax.Array, latent_hw: int) -> jax.Array:
    """Pre-resize an NHWC mask condition to the latent resolution (nearest).

    The models resize internally (matching the reference,
    unet_cond_base.py:135 / transformer.py:162), but doing it once outside
    the sampler scan / train step saves re-reading the full-res mask every
    denoise step — measured 2x on the DiT-12L forward (512^2 18-channel mask
    at batch 32 costs ~6 ms/step on v5e). The 1x1 cond conv commutes with
    nearest resize, so numerics are identical.
    """
    return nearest_resize(mask, latent_hw, latent_hw)


def drop_text_condition(text_embed: jax.Array, key: jax.Array,
                        empty_text_embed: jax.Array,
                        text_drop_prob: float) -> jax.Array:
    """Replace dropped rows with the empty-string embedding.

    Reference: diffusion_utils.py:21-28 (mask = U(0,1) < p).
    """
    if text_drop_prob <= 0:
        return text_embed
    assert empty_text_embed is not None, (
        "Text Conditioning required as well as text dropping but empty text "
        "representation not created")
    b = text_embed.shape[0]
    drop = jax.random.uniform(key, (b,)) < text_drop_prob
    empty = jnp.broadcast_to(empty_text_embed[0][None], text_embed.shape)
    return jnp.where(drop[:, None, None], empty.astype(text_embed.dtype), text_embed)


def drop_image_condition(image_condition: jax.Array, key: jax.Array,
                         im_drop_prob: float) -> jax.Array:
    """Zero the mask condition per sample with probability p (NHWC).

    Reference: diffusion_utils.py:31-37 (keep-mask = U(0,1) > p).
    """
    if im_drop_prob <= 0:
        return image_condition
    b = image_condition.shape[0]
    keep = jax.random.uniform(key, (b, 1, 1, 1)) > im_drop_prob
    return image_condition * keep.astype(image_condition.dtype)


def drop_class_condition(class_condition: jax.Array, key: jax.Array,
                         class_drop_prob: float) -> jax.Array:
    """Zero the one-hot class per sample with probability p.

    Reference: diffusion_utils.py:40-46.
    """
    if class_drop_prob <= 0:
        return class_condition
    b = class_condition.shape[0]
    keep = jax.random.uniform(key, (b, 1)) > class_drop_prob
    return class_condition * keep.astype(class_condition.dtype)
