"""TPU-native latent-diffusion framework (JAX/XLA/Pallas/pjit).

A brand-new framework with the capabilities of wangze22/StableDiffusion-PyTorch:
stage-1 VQVAE/VAE autoencoders (LPIPS + PatchGAN losses), conditional UNet and
DiT denoisers (class / CLIP-text / semantic-mask conditioning), DDPM/DDIM
samplers with classifier-free guidance as jitted ``lax.scan`` loops, sharded
data-parallel training over a ``jax.sharding.Mesh``, and the full CIM
quantization-aware-training stack (LSQ fake-quant, ADC/DAC bit-split analog
simulation, progressive bit/noise schedules, weight-array mapping, energy
reports).

Subpackages
-----------
config      typed config system (YAML + flat-python presets, width scaling)
schedulers  DDPM linear-noise schedule, DDPM/DDIM samplers, CFG
models      flax.nnx modules: blocks, VQVAE/VAE, UNet, DiT, LPIPS, PatchGAN
ops         STE/quant primitives, bit-split, Pallas kernels, native ext
cim         quantized layer zoo, progressive QAT harness, weight mapper
data        MNIST / CelebA-HQ datasets, latent stores, text encoders
parallel    mesh construction + sharding rules
training    train states, EMA, trainers, run artifacts
tools       CLI entry points (train/sample/gen-latents/FID)
analysis    size / ops / energy analyzers
"""

__version__ = "0.1.0"
