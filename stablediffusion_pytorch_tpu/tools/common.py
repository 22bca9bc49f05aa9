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
                  condition_config: Optional[dict] = None):
    """Dataset by config name ('mnist' | 'celebhq'), matching the name->class
    map the reference asks users to edit (tools/train_ddpm_vqvae.py:40)."""
    dp = cfg.dataset_params
    name = dp["name"]
    kwargs = dict(split=split, im_path=dp["im_path"], im_size=dp["im_size"],
                  im_channels=dp["im_channels"], use_latents=use_latents,
                  latent_path=latent_path, condition_config=condition_config)
    if name == "mnist":
        return MnistDataset(**kwargs)
    if name == "celebhq":
        return CelebDataset(**kwargs)
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
