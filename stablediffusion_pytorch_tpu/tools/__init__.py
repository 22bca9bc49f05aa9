"""CLI entry points (the reference's tools/ layer): train/infer the VQVAE,
train unconditional/conditional LDMs, sample with DDPM/DDIM + CFG, generate
latents, evaluate FID. All accept ``--config <path-or-preset>``."""
