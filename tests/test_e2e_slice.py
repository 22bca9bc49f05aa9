"""Minimum end-to-end slice (SURVEY.md §7 step 2): tiny MNIST-style
class-conditional LDM through the real CLI entry points —
train_vqvae -> infer_vqvae --save-latents -> train_ddpm_cond -> sample.
Everything runs on CPU with a micro config."""

import argparse
import os

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "mnist" / "train"
    for cls in range(2):
        d = data_dir / str(cls)
        d.mkdir(parents=True)
        rng = np.random.default_rng(cls)
        for i in range(8):
            arr = rng.integers(0, 255, (16, 16), np.uint8)
            Image.fromarray(arr, "L").save(d / f"{i}.png")

    cfg = {
        "dataset_params": {"im_path": str(data_dir), "im_channels": 1,
                           "im_size": 16, "name": "mnist"},
        "diffusion_params": {"num_timesteps": 20, "beta_start": 0.0015,
                             "beta_end": 0.0195},
        "ldm_params": {
            "down_channels": [8, 16, 16, 24], "mid_channels": [24, 24, 16],
            "down_sample": [True, False, False],
            "attn_down": [False, False, False], "time_emb_dim": 16,
            "norm_channels": 4, "num_heads": 2, "conv_out_channels": 16,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
            "condition_config": {
                "condition_types": ["class"],
                "class_condition_config": {"num_classes": 2,
                                           "cond_drop_prob": 0.1},
            },
        },
        "autoencoder_params": {
            "z_channels": 2, "codebook_size": 8,
            "down_channels": [8, 16], "mid_channels": [16, 16],
            "down_sample": [True], "attn_down": [False],
            "norm_channels": 4, "num_heads": 2, "num_down_layers": 1,
            "num_mid_layers": 1, "num_up_layers": 1,
        },
        "train_params": {
            "seed": 7, "task_name": "tiny", "ldm_batch_size": 4,
            "autoencoder_batch_size": 4, "disc_start": 10_000,
            "disc_weight": 0.5, "codebook_weight": 1.0,
            "commitment_beta": 0.2, "perceptual_weight": 0.0,
            "ldm_epochs": 1, "autoencoder_epochs": 1, "num_samples": 4,
            "num_grid_rows": 2, "ldm_lr": 1e-3, "autoencoder_lr": 1e-3,
            "autoencoder_acc_steps": 1, "autoencoder_img_save_steps": 1000,
            "save_latents": True, "cf_guidance_scale": 2.0,
            "vqvae_latent_dir_name": "vqvae_latents",
            "ldm_ckpt_name": "ddpm_ckpt",
            "vqvae_autoencoder_ckpt_name": "vqvae_autoencoder_ckpt",
            "vqvae_discriminator_ckpt_name": "vqvae_discriminator_ckpt",
        },
    }
    cfg_path = root / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return {"root": str(root), "cfg": str(cfg_path)}


@pytest.mark.slow
def test_full_slice(tiny_env):
    from stablediffusion_pytorch_tpu.tools import (
        infer_vqvae, sample_ddpm, train_ddpm_cond, train_vqvae,
    )

    out_root = os.path.join(tiny_env["root"], "runs")

    # 1. stage-1 training
    arts = train_vqvae.train(argparse.Namespace(
        config=tiny_env["cfg"], epochs=1, noise_scale=0.0,
        lpips_weights=None, output_root=out_root, log_every=1))
    vq_ckpt = os.path.join(arts["ckpt_dir"], "vqvae_autoencoder_ckpt")
    assert os.path.exists(vq_ckpt)

    # 2. latent precompute (+ recon sheet)
    out_dir = infer_vqvae.infer(argparse.Namespace(
        config=tiny_env["cfg"], ckpt=vq_ckpt, save_latents=True,
        num_samples=4, batch_size=4, output_root=out_root))
    latent_dir = os.path.join(out_dir, "vqvae_latents")
    assert os.path.exists(os.path.join(out_dir, "vqvae_recon.png"))
    assert len(os.listdir(latent_dir)) >= 1

    # 3. conditional LDM training on precomputed latents
    arts2 = train_ddpm_cond.train(argparse.Namespace(
        config=tiny_env["cfg"], epochs=1, bf16=False, vqvae_ckpt=vq_ckpt,
        text_weights=None, latent_root=out_root, output_root=out_root))
    ldm_ckpt = os.path.join(arts2["ckpt_dir"], "ddpm_ckpt_latest")
    assert os.path.exists(ldm_ckpt)
    assert os.path.exists(os.path.join(arts2["run_dir"], "losses.csv"))
    assert os.path.exists(os.path.join(arts2["run_dir"],
                                       "config_snapshot.json"))

    # 4. class-conditional sampling with CFG through both samplers
    imgs = sample_ddpm.sample(argparse.Namespace(
        config=tiny_env["cfg"], ckpt=ldm_ckpt, vqvae_ckpt=vq_ckpt,
        text_weights=None, sampler="ddim", steps=5, method="quadratic",
        eta=0.0, prompt=None, class_id=1, mask_from_dataset=False,
        cf_guidance_scale=2.0, num_samples=2, seed=3,
        output_root=out_root))
    assert imgs.shape == (2, 16, 16, 1)
    assert np.isfinite(imgs).all()

    imgs2 = sample_ddpm.sample(argparse.Namespace(
        config=tiny_env["cfg"], ckpt=ldm_ckpt, vqvae_ckpt=vq_ckpt,
        text_weights=None, sampler="ddpm", steps=5, method="quadratic",
        eta=0.0, prompt=None, class_id=0, mask_from_dataset=False,
        cf_guidance_scale=1.0, num_samples=2, seed=4,
        output_root=out_root))
    assert np.isfinite(imgs2).all()
