"""Training layer: EMA, LDM trainer, VQVAE GAN trainer, run artifacts,
checkpointing."""

from stablediffusion_pytorch_tpu.training.ema import ema_update, EmaParams
from stablediffusion_pytorch_tpu.training.ldm import LdmTrainer
from stablediffusion_pytorch_tpu.training.pp import PPLdmTrainer
from stablediffusion_pytorch_tpu.training.vqvae import VqvaeTrainer
