"""prompt_ab tool: controlled text-steering A/B (VERDICT r2 task 5).

Runs the full tool path on CPU with a tiny text+image conditioned UNet and
a micro procedural-synthface dataset: fixed mask, two prompts, identical
initial noise, DDIM+CFG sampling, then the region-color and feature-space
separation metrics + provenance sidecar. Asserts mechanics (fixed mask
selection, identical-noise contract, report schema, finite metrics) — not
steering itself, which needs a trained checkpoint (the committed evidence
run's job)."""

import argparse
import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def ab_env(tmp_path_factory):
    from flax import nnx

    from stablediffusion_pytorch_tpu.tools.make_synth_data import make_faces
    from stablediffusion_pytorch_tpu.tools.common import (
        build_denoiser, build_vqvae, load_config,
    )
    from stablediffusion_pytorch_tpu.training.checkpoint import save_model

    root = tmp_path_factory.mktemp("prompt_ab")
    data_root = root / "faces"
    make_faces(str(data_root), count=6, im_size=16, seed=5)

    cfg = {
        "dataset_params": {"im_path": str(data_root), "im_channels": 3,
                           "im_size": 16, "name": "celebhq"},
        "diffusion_params": {"num_timesteps": 20, "beta_start": 0.0015,
                             "beta_end": 0.0195},
        "ldm_params": {
            "down_channels": [8, 16, 16, 24], "mid_channels": [24, 24, 16],
            "down_sample": [True, False, False],
            "attn_down": [True, True, True], "time_emb_dim": 16,
            "norm_channels": 4, "num_heads": 2, "conv_out_channels": 16,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
            "condition_config": {
                "condition_types": ["text", "image"],
                "text_condition_config": {
                    "text_embed_model": "clip",
                    "train_text_embed_model": False,
                    "text_embed_dim": 512, "cond_drop_prob": 0.1},
                "image_condition_config": {
                    "image_condition_input_channels": 18,
                    "image_condition_output_channels": 3,
                    "image_condition_h": 32, "image_condition_w": 32,
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
            "seed": 7, "task_name": "tiny_ab", "ldm_batch_size": 2,
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
    cfg_path = root / "tiny_ab.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # untrained-but-loadable checkpoints: the tool's contract under test is
    # the experiment harness, not sample quality
    loaded = load_config(str(cfg_path))
    den_ckpt = str(root / "den_ckpt")
    vq_ckpt = str(root / "vq_ckpt")
    save_model(den_ckpt, build_denoiser(loaded))
    save_model(vq_ckpt, build_vqvae(loaded))
    return {"root": str(root), "cfg": str(cfg_path),
            "den": den_ckpt, "vq": vq_ckpt}


@pytest.mark.slow
def test_prompt_ab_report(ab_env):
    from stablediffusion_pytorch_tpu.tools import prompt_ab

    out_root = os.path.join(ab_env["root"], "runs")
    report = prompt_ab.run(argparse.Namespace(
        config=ab_env["cfg"], ckpt=ab_env["den"], vqvae_ckpt=ab_env["vq"],
        text_weights=None, fid_weights=None,
        prompts=("This person has long black hair.|"
                 "This person has long blond hair."),
        region="hair", mask_index=None, num_per_prompt=2, steps=4,
        method="quadratic", cf_guidance_scale=3.0, seed=11,
        output_root=out_root))

    assert report["prompts"][0] != report["prompts"][1]
    assert report["mask_index"] >= 0
    color = report["region_color"]
    assert color["region"] == "hair"
    assert len(color["group_mean_rgb"]) == 2
    assert all(np.isfinite(c).all() for c in
               np.asarray(color["group_mean_rgb"]))
    assert np.isfinite(color["separation"])
    assert np.isfinite(report["feature_space"]["ratio"])

    ab_dir = os.path.join(out_root, "tiny_ab", "prompt_ab")
    for f in ("group_0.png", "group_1.png", "ab_sheet.png",
              "ab_report.json", "ab_report.json.provenance.json"):
        assert os.path.exists(os.path.join(ab_dir, f)), f

    with open(os.path.join(ab_dir,
                           "ab_report.json.provenance.json")) as fh:
        prov = json.load(fh)
    assert "text_encoder" in prov["provenance"]
    assert "fid_extractor" in prov["provenance"]


def test_pick_mask_skips_hairless():
    from stablediffusion_pytorch_tpu.tools.prompt_ab import _pick_mask

    class FakeDs:
        def __init__(self, masks):
            self.masks = masks

        def __len__(self):
            return len(self.masks)

        def __getitem__(self, i):
            return None, {"image": self.masks[i]}

    bald = np.zeros((8, 8, 18), np.float32)
    hairy = np.zeros((8, 8, 18), np.float32)
    hairy[:4, :, 12] = 1.0
    m, idx = _pick_mask(FakeDs([bald, hairy]), region_idx=12, index=None)
    assert idx == 1 and m[..., 12].mean() > 0.02

    m, idx = _pick_mask(FakeDs([bald, hairy]), region_idx=12, index=0)
    assert idx == 0


def test_region_means_and_pairwise():
    from stablediffusion_pytorch_tpu.tools.prompt_ab import (
        _pairwise_mean_dist, _region_means,
    )

    imgs = np.zeros((2, 4, 4, 3), np.float32)
    imgs[0, :2, :, 0] = 1.0     # red in top half of sample 0
    region = np.zeros((4, 4), np.float32)
    region[:2, :] = 1.0          # region = top half
    means = _region_means(imgs, region)
    np.testing.assert_allclose(means[0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(means[1], [0.0, 0.0, 0.0], atol=1e-6)

    a = np.array([[0.0], [0.0]])
    b = np.array([[3.0], [5.0]])
    assert _pairwise_mean_dist(a) == 0.0
    assert _pairwise_mean_dist(a, b) == pytest.approx(4.0)
