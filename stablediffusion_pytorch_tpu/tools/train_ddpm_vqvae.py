"""Unconditional latent-DDPM training CLI
(reference: tools/train_ddpm_vqvae.py — same loop as the conditional
trainer minus condition handling; this delegates to train_ddpm_cond with an
unconditional config such as 'mnist' or 'celebhq')."""

from stablediffusion_pytorch_tpu.tools.train_ddpm_cond import main, train  # noqa: F401

if __name__ == "__main__":
    main()
