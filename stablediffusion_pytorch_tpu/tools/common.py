"""Shared plumbing for the CLI tools: seeding, dataset/model factories,
device batching."""

from __future__ import annotations

import os
import random
from typing import Optional

import jax

# Honor an explicit JAX_PLATFORMS env even when a site customization
# pre-imported jax with a different platform pinned (the axon TPU relay does
# this); harmless no-op if backends are already initialized.
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and _env_platforms != "axon":
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # pragma: no cover - backend already initialized
        pass
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.config.loader import Config, load_config

# Persistent XLA compilation cache for every CLI tool. The axon relay's
# remote compile latency is wildly variable (the same VQVAE-256 train step
# measured 152 s cold and 29 s warm-from-cache this round; single programs
# were observed taking >6 min cold), so caching executables to disk is the
# difference between pipeline stages resuming in seconds vs minutes.
# Opt out with SDTPU_NO_CACHE=1. A tool forced onto the host backend
# (JAX_PLATFORMS=cpu) gets the host-fingerprinted CPU cache instead — its
# AOT entries are machine-shape-specific (see utils/xla_cache.py).
if os.environ.get("SDTPU_NO_CACHE") != "1":
    from stablediffusion_pytorch_tpu.utils.xla_cache import (
        configure_persistent_cache,
    )

    configure_persistent_cache(
        jax, "cpu" if _env_platforms == "cpu" else "tpu")
from stablediffusion_pytorch_tpu.data import CelebDataset, MnistDataset
from stablediffusion_pytorch_tpu.models import DIT, VQVAE, Unet


def seed_everything(seed: int) -> jax.Array:
    """Global seeding (reference: tools/train_vqvae.py:34-41); returns the
    root PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def build_dataset(cfg: Config, split: str = "train", use_latents: bool = False,
                  latent_path: Optional[str] = None,
                  condition_config: Optional[dict] = None,
                  mask_hw: Optional[tuple] = None):
    """Dataset by config name ('mnist' | 'celebhq'), matching the name->class
    map the reference asks users to edit (tools/train_ddpm_vqvae.py:40).

    mask_hw: optional consumer-side mask resolution hint (see
    CelebDataset.__init__) — a trainer that immediately downsamples masks
    to latent resolution can have the dataset one-hot them there directly.
    """
    dp = cfg.dataset_params
    name = dp["name"]
    kwargs = dict(split=split, im_path=dp["im_path"], im_size=dp["im_size"],
                  im_channels=dp["im_channels"], use_latents=use_latents,
                  latent_path=latent_path, condition_config=condition_config)
    if name == "mnist":
        return MnistDataset(**kwargs)
    if name == "celebhq":
        return CelebDataset(**kwargs, mask_hw=mask_hw)
    raise ValueError(f"unknown dataset {name!r}")


def build_vqvae(cfg: Config, seed: int = 0, dtype=None) -> VQVAE:
    return VQVAE(cfg.dataset_params["im_channels"],
                 dict(cfg.autoencoder_params), rngs=nnx.Rngs(seed),
                 dtype=dtype)


def build_denoiser(cfg: Config, seed: int = 0, dtype=None):
    """UNet from ldm_params, or DiT when the config carries
    dit_model_config (the flat-python experiment configs)."""
    z = cfg.autoencoder_params["z_channels"]
    if "dit_model_config" in cfg:
        return DIT(z, dict(cfg.dit_model_config), rngs=nnx.Rngs(seed),
                   dtype=dtype)
    return Unet(z, dict(cfg.ldm_params), rngs=nnx.Rngs(seed), dtype=dtype)


def latent_hw(cfg: Config):
    """Latent spatial size = im_size / 2^(num_downsamples)
    (reference: tools/sample_ddpm_text_image_cond.py:28-35)."""
    factor = 2 ** sum(bool(d) for d in cfg.autoencoder_params["down_sample"])
    return cfg.dataset_params["im_size"] // factor


__all__ = ["seed_everything", "build_dataset", "build_vqvae",
           "build_denoiser", "latent_hw", "load_config"]
