"""train_qat text+image conditioning: the production-shape QAT path.

The reference's AnDi pipelines run on the text+mask-conditioned celebhq
models (train_ddpm_cond_celebhq_multi_gpu_tc05_andi.py:497-546,
Model_DiT_9L_train.py:577-626 — those models condition on the mask, the
tc05 ones on text+mask). Round-3 extends tools/train_qat the same way:
`_dataset_data_iter` joins precomputed latents with captions + masks
(the flagship trainer's dataset path) and `evaluate_model` samples with
dataset condition pairs under CFG — these tests pin both on a tiny DiT.
"""

import argparse
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def text_cond_env(tmp_path_factory):
    from PIL import Image

    from stablediffusion_pytorch_tpu.data.latents import save_latent_shards
    from stablediffusion_pytorch_tpu.tools.common import (
        build_dataset, build_vqvae, load_config,
    )
    from stablediffusion_pytorch_tpu.training.checkpoint import save_model

    root = tmp_path_factory.mktemp("qat_text")
    (root / "CelebA-HQ-img").mkdir()
    (root / "celeba-caption").mkdir()
    (root / "CelebAMask-HQ-mask").mkdir()
    for i in range(6):
        rng = np.random.default_rng(i)
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8)).save(
            root / "CelebA-HQ-img" / f"{i}.jpg")
        (root / "celeba-caption" / f"{i}.txt").write_text(
            f"a synthetic face number {i}\n")
        mask = rng.integers(0, 19, (16, 16), np.uint8)
        Image.fromarray(mask, "L").save(
            root / "CelebAMask-HQ-mask" / f"{i}.png")

    cond = {
        "condition_types": ["text", "image"],
        "text_condition_config": {"text_embed_model": "clip",
                                  "text_embed_dim": 512,
                                  "cond_drop_prob": 0.1},
        "image_condition_config": {
            "image_condition_input_channels": 18,
            "image_condition_output_channels": 3,
            "image_condition_h": 16, "image_condition_w": 16,
            "cond_drop_prob": 0.1,
        },
    }
    cfg = {
        "dataset_params": {"im_path": str(root), "im_channels": 3,
                           "im_size": 16, "name": "celebhq"},
        "diffusion_params": {"num_timesteps": 10, "beta_start": 0.0015,
                             "beta_end": 0.0195},
        "ldm_params": {"condition_config": cond},
        "dit_model_config": {
            "hidden_size": 16, "patch_size": 2, "timestep_emb_dim": 16,
            "num_layers": 1, "num_heads": 2, "head_dim": 8,
            "condition_config": cond,
        },
        "autoencoder_params": {
            "z_channels": 2, "codebook_size": 8,
            "down_channels": [8, 16], "mid_channels": [16, 16],
            "down_sample": [True], "attn_down": [False],
            "norm_channels": 4, "num_heads": 2, "num_down_layers": 1,
            "num_mid_layers": 1, "num_up_layers": 1,
        },
        "train_params": {
            "seed": 7, "task_name": "tiny_text_qat", "ldm_batch_size": 2,
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
    cfg_path = root / "tiny_text_qat.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    loaded = load_config(str(cfg_path))

    # latents keyed by the dataset's image paths (latent 8x8, z=2)
    ds0 = build_dataset(loaded)
    latent_dir = str(root / "latents")
    items = [(p, np.random.default_rng(i).normal(
        size=(8, 8, 2)).astype(np.float32)) for i, p in enumerate(ds0.images)]
    save_latent_shards(latent_dir, items)

    vq_ckpt = str(root / "vq_ckpt")
    save_model(vq_ckpt, build_vqvae(loaded))
    return {"root": str(root), "cfg": loaded, "latents": latent_dir,
            "vq": vq_ckpt, "images": str(root / "CelebA-HQ-img")}


def test_dataset_data_iter_yields_text_and_mask(text_cond_env):
    import jax.numpy as jnp

    from stablediffusion_pytorch_tpu.tools.train_qat import (
        _dataset_data_iter,
    )

    it = _dataset_data_iter(text_cond_env["cfg"], text_cond_env["latents"],
                            batch_size=2, max_batches=2)
    batches = list(it())
    assert len(batches) == 2
    lat, cond = batches[0]
    assert lat.shape == (2, 8, 8, 2)
    assert cond["text"].shape == (2, 77, 512)
    assert cond["image"].shape == (2, 8, 8, 18)  # mask at latent res
    assert bool(jnp.isfinite(cond["text"]).all())
    # second epoch reshuffles (different counter), still well-formed
    b2 = list(it())
    assert len(b2) == 2


@pytest.mark.slow
def test_evaluate_model_text_image_cond(text_cond_env):
    import jax.numpy as jnp
    from flax import nnx

    from stablediffusion_pytorch_tpu.cim import (
        ProgressiveTrain, calibrate_quant_layers,
    )
    from stablediffusion_pytorch_tpu.cim import registry as reg_dict
    from stablediffusion_pytorch_tpu.models import DIT
    from stablediffusion_pytorch_tpu.tools.train_qat import evaluate_model

    cfg = text_cond_env["cfg"]
    model = DIT(cfg.autoencoder_params["z_channels"],
                dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
    pt = ProgressiveTrain(model)
    n_conv = pt.convert_to_layers(list(reg_dict.nn_layers), "layers_qn_lsq",
                                  noise_scale=0.0, input_bit=8,
                                  output_bit=8, weight_bit=8)
    assert n_conv > 0
    lat = jnp.zeros((2, 8, 8, cfg.autoencoder_params["z_channels"]))
    cond = {"text": jnp.zeros((2, 77, 512)),
            "image": jnp.zeros((2, 8, 8, 18))}
    calibrate_quant_layers(
        model, lambda m: m(lat, jnp.zeros((2,), jnp.int32), cond))

    out_dir = os.path.join(text_cond_env["root"], "eval_out")
    os.makedirs(out_dir, exist_ok=True)
    args = argparse.Namespace(eval_samples=2, eval_steps=2,
                              eval_vqvae_ckpt=text_cond_env["vq"],
                              eval_fid_images=text_cond_env["images"],
                              eval_guidance=2.0)
    row = evaluate_model(model, cfg, args, out_dir, "quantized")
    assert row["tag"] == "quantized"
    assert os.path.exists(row["grid"])
    assert np.isfinite(row["fid_internal"])  # flat image dir scored
