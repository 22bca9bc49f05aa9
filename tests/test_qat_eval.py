"""train_qat.evaluate_model: quantized-model sampling + framework-FID
(VERDICT r2 task 4 eval harness). Runs the eval path on CPU with a tiny
LSQ-converted UNet: DDIM sampling straight through the quant layers,
VQVAE decode, grid + FID + provenance sidecar."""

import argparse
import glob
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def qat_eval_env(tmp_path_factory):
    from PIL import Image

    from stablediffusion_pytorch_tpu.tools.common import (
        build_vqvae, load_config,
    )
    from stablediffusion_pytorch_tpu.training.checkpoint import save_model

    root = tmp_path_factory.mktemp("qat_eval")
    img_root = root / "images"
    for cls in range(2):
        d = img_root / str(cls)
        d.mkdir(parents=True)
        rng = np.random.default_rng(cls)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (16, 16), np.uint8),
                            "L").save(d / f"{i}.png")

    cfg = {
        "dataset_params": {"im_path": str(img_root), "im_channels": 1,
                           "im_size": 16, "name": "mnist"},
        "diffusion_params": {"num_timesteps": 10, "beta_start": 0.0015,
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
            "seed": 7, "task_name": "tiny_qat", "ldm_batch_size": 2,
            "autoencoder_batch_size": 2, "disc_start": 10_000,
            "disc_weight": 0.5, "codebook_weight": 1.0,
            "commitment_beta": 0.2, "perceptual_weight": 0.0,
            "ldm_epochs": 1, "autoencoder_epochs": 1, "num_samples": 2,
            "num_grid_rows": 2, "ldm_lr": 1e-3, "autoencoder_lr": 1e-3,
            "autoencoder_acc_steps": 1, "autoencoder_img_save_steps": 1000,
            "save_latents": False, "cf_guidance_scale": 2.0,
            "vqvae_latent_dir_name": "vqvae_latents",
            "ldm_ckpt_name": "ddpm_ckpt",
            "vqvae_autoencoder_ckpt_name": "vqvae_autoencoder_ckpt",
            "vqvae_discriminator_ckpt_name": "vqvae_discriminator_ckpt",
        },
    }
    cfg_path = root / "tiny_qat.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    loaded = load_config(str(cfg_path))
    vq_ckpt = str(root / "vq_ckpt")
    save_model(vq_ckpt, build_vqvae(loaded))
    return {"root": str(root), "cfg": loaded, "vq": vq_ckpt,
            "images": str(img_root)}


@pytest.mark.slow
def test_evaluate_quantized_model(qat_eval_env):
    import jax.numpy as jnp
    from flax import nnx

    from stablediffusion_pytorch_tpu.cim import (
        calibrate_quant_layers, ProgressiveTrain,
    )
    from stablediffusion_pytorch_tpu.cim import registry as reg_dict
    from stablediffusion_pytorch_tpu.models import Unet
    from stablediffusion_pytorch_tpu.tools.train_qat import evaluate_model

    cfg = qat_eval_env["cfg"]
    model = Unet(cfg.autoencoder_params["z_channels"],
                 dict(cfg.ldm_params), rngs=nnx.Rngs(0))
    pt = ProgressiveTrain(model)
    n_conv = pt.convert_to_layers(list(reg_dict.nn_layers), "layers_qn_lsq",
                                  noise_scale=0.0, input_bit=8,
                                  output_bit=8, weight_bit=8)
    assert n_conv > 0
    lat = jnp.zeros((2, 8, 8, cfg.autoencoder_params["z_channels"]))
    cond = {"class": jnp.eye(2, dtype=jnp.float32)}
    calibrate_quant_layers(
        model, lambda m: m(lat, jnp.zeros((2,), jnp.int32), cond))

    out_dir = os.path.join(qat_eval_env["root"], "eval_out")
    os.makedirs(out_dir, exist_ok=True)
    args = argparse.Namespace(eval_samples=4, eval_steps=2,
                              eval_vqvae_ckpt=qat_eval_env["vq"],
                              eval_fid_images=qat_eval_env["images"])
    row = evaluate_model(model, cfg, args, out_dir, "quantized")

    assert row["tag"] == "quantized"
    assert os.path.exists(row["grid"])
    assert np.isfinite(row["fid_internal"])
    assert "DDIM-2" in row["fid_protocol"]
    sidecars = glob.glob(os.path.join(out_dir, "*.provenance.json"))
    assert sidecars
