"""Data layer: MNIST / CelebAMask-HQ datasets (NHWC numpy), latent stores,
prefetching loader, text encoders."""

from stablediffusion_pytorch_tpu.data.datasets import MnistDataset, CelebDataset
from stablediffusion_pytorch_tpu.data.loader import DataLoader
from stablediffusion_pytorch_tpu.data.latents import save_latent_shards
from stablediffusion_pytorch_tpu.utils.diffusion_utils import load_latents
