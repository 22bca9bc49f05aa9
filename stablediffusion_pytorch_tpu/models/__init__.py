"""flax.nnx model zoo: UNet/VQVAE blocks, VQVAE/VAE, conditional UNet, DiT,
LPIPS, PatchGAN discriminator."""

from stablediffusion_pytorch_tpu.models.common import (
    get_time_embedding,
    MultiheadAttention,
)
from stablediffusion_pytorch_tpu.models.blocks import (
    DownBlock,
    MidBlock,
    UpBlock,
    UpBlockUnet,
)
from stablediffusion_pytorch_tpu.models.vqvae import VQVAE
from stablediffusion_pytorch_tpu.models.vae import VAE
from stablediffusion_pytorch_tpu.models.unet import Unet
from stablediffusion_pytorch_tpu.models.dit import DIT, PatchEmbedding, TransformerLayer
from stablediffusion_pytorch_tpu.models.discriminator import Discriminator
