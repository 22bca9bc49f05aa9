"""Thin alias of sample_ddpm preserving the reference entry-point name
(reference: tools/sample_ddpm_text_cond.py)."""

from stablediffusion_pytorch_tpu.tools.sample_ddpm import main, sample  # noqa: F401

if __name__ == "__main__":
    main()
