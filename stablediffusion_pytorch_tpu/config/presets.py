"""Flat-python config presets: the newer reference config style.

Each function returns a Config with the same assembled dicts the reference's
flat config modules export — ``condition_config``, ``diffusion_model_config``,
``dit_model_config`` — plus dataset/diffusion/train scalars
(reference: Model_DiT_12L_config.py:95-133, Model_DiT_9L_config.py:145-153,
config/celebhq_text_image_cond_tc05.py:94-123).
"""

from __future__ import annotations

from stablediffusion_pytorch_tpu.config.ldm_scaling import build_ldm_scaling
from stablediffusion_pytorch_tpu.config.loader import Config


def _tc05_base(condition_types=("image",), cond_drop_prob=0.9) -> Config:
    """tc05 = base UNet scaled by c_factor 2.58 (Model_DiT_12L_config.py:3)."""
    scaling = build_ldm_scaling(c_factor=2.58)
    condition_config = {
        "condition_types": list(condition_types),
        "text_condition_config": {
            "text_embed_model": "clip",
            "train_text_embed_model": False,
            "text_embed_dim": 512,
            "cond_drop_prob": cond_drop_prob,
        },
        "image_condition_config": {
            "image_condition_input_channels": 18,
            "image_condition_output_channels": 3,
            "image_condition_h": 512,
            "image_condition_w": 512,
            "cond_drop_prob": cond_drop_prob,
        },
    }
    diffusion_model_config = {
        "down_channels": scaling["down_channels"],
        "mid_channels": scaling["mid_channels"],
        "down_sample": [True, True, True],
        "attn_down": [True, True, True],
        "time_emb_dim": scaling["time_emb_dim"],
        "norm_channels": scaling["norm_channels"],
        "num_heads": scaling["num_heads"],
        "conv_out_channels": scaling["conv_out_channels"],
        "num_down_layers": 2,
        "num_mid_layers": 2,
        "num_up_layers": 2,
        "condition_config": condition_config,
    }
    return Config(
        dataset_params={
            "im_path": "data/CelebAMask-HQ",
            "im_channels": 3,
            "im_size": 256,
            "name": "celebhq",
        },
        diffusion_params={
            "num_timesteps": 1000,
            "beta_start": 0.00085,
            "beta_end": 0.012,
        },
        autoencoder_params={
            "z_channels": 4,
            "codebook_size": 8192,
            "down_channels": [64, 128, 256, 256],
            "mid_channels": [256, 256],
            "down_sample": [True, True, True],
            "attn_down": [False, False, False],
            "norm_channels": 32,
            "num_heads": 4,
            "num_down_layers": 2,
            "num_mid_layers": 2,
            "num_up_layers": 2,
        },
        train_params={
            "seed": 1111,
            "task_name": "celebhq",
            "ldm_batch_size": 28,
            "ldm_epochs": 500,
            "num_samples": 1,
            "num_grid_rows": 1,
            "ldm_lr": 1e-4,
            "save_latents": True,
            "vqvae_latent_dir_name": "vqvae_latents",
            "ldm_save_every_epochs": 30,
        },
        condition_config=condition_config,
        diffusion_model_config=diffusion_model_config,
    )


def celebhq_text_image_cond_tc05() -> Config:
    """UNet tc05 config (reference: config/celebhq_text_image_cond_tc05.py)."""
    cfg = _tc05_base(condition_types=("text", "image"), cond_drop_prob=0.1)
    return cfg


def model_unet() -> Config:
    """Model_Unet experiment: tc05 UNet, image-cond only
    (reference: Model_Unet_config.py)."""
    return _tc05_base(condition_types=("image",), cond_drop_prob=0.9)


def model_unet_wo_attention() -> Config:
    """Model_Unet_wo_attention experiment: same tc05 UNet with every
    self-attention disabled (reference: Model_Unet_wo_attention_config.py,
    attn_down all False)."""
    cfg = _tc05_base(condition_types=("image",), cond_drop_prob=0.9)
    cfg["diffusion_model_config"]["attn_down"] = [False, False, False]
    return cfg


def _dit(num_layers: int) -> Config:
    cfg = _tc05_base(condition_types=("image",), cond_drop_prob=0.9)
    cfg["dit_model_config"] = {
        "hidden_size": 288,
        "patch_size": 2,
        "timestep_emb_dim": cfg["diffusion_model_config"]["time_emb_dim"],
        "num_layers": num_layers,
        "num_heads": 9,
        "head_dim": 32,
        "condition_config": cfg["condition_config"],
    }
    return cfg


def model_dit_9l() -> Config:
    """DiT-9L experiment config (reference: Model_DiT_9L_config.py:145-153)."""
    return _dit(9)


def model_dit_12l() -> Config:
    """DiT-12L experiment config (reference: Model_DiT_12L_config.py:125-133)."""
    return _dit(12)
