"""Config system tests: preset loading, key parity, width scaler."""

import pytest

from stablediffusion_pytorch_tpu.config import (
    build_ldm_scaling,
    load_config,
    presets,
)
from stablediffusion_pytorch_tpu.config.loader import available_presets


class TestYamlPresets:
    def test_available(self):
        names = available_presets()
        for expected in ["celebhq", "celebhq_text_image_cond", "mnist",
                         "mnist_class_cond"]:
            assert expected in names

    def test_celebhq_keys_match_reference(self):
        cfg = load_config("celebhq")
        # key values pinned to reference config/celebhq.yaml
        assert cfg.diffusion_params.num_timesteps == 1000
        assert cfg.diffusion_params.beta_start == 0.0015
        assert cfg.diffusion_params.beta_end == 0.0195
        assert cfg.ldm_params.down_channels == [256, 384, 512, 768]
        assert cfg.autoencoder_params.codebook_size == 8192
        assert cfg.train_params.disc_start == 15000
        assert cfg.train_params.autoencoder_acc_steps == 4
        assert cfg.train_params.commitment_beta == 0.2

    def test_text_image_cond_condition_config(self):
        cfg = load_config("celebhq_text_image_cond")
        cc = cfg.ldm_params.condition_config
        assert cc.condition_types == ["text", "image"]
        assert cc.text_condition_config.text_embed_dim == 512
        assert cc.image_condition_config.image_condition_input_channels == 18
        assert cfg.diffusion_params.beta_start == 0.00085

    def test_synthface_preset_mirrors_flagship_conditioning(self):
        """The reduced synthface preset must carry the SAME conditioning
        shape as celebhq_text_image_cond (text cross-attn + 18-ch mask)."""
        cfg = load_config("synthface_text_image_cond")
        ref = load_config("celebhq_text_image_cond")
        cc = cfg.ldm_params.condition_config
        rc = ref.ldm_params.condition_config
        assert cc.condition_types == rc.condition_types
        assert (cc.text_condition_config.text_embed_dim
                == rc.text_condition_config.text_embed_dim)
        assert (cc.image_condition_config.image_condition_input_channels
                == rc.image_condition_config.image_condition_input_channels)
        assert cfg.diffusion_params.beta_start == ref.diffusion_params.beta_start

    def test_synthface256_dit_presets_match_reference_geometry(self):
        """The 256^2 DiT presets carry the reference's DiT geometry
        (Model_DiT_12L_config.py:125-133 / Model_DiT_9L_config.py:145-153:
        hidden 288, patch 2, 9 heads x head_dim 32) and the flagship's
        text+mask conditioning so the three-way family comparison is
        apples-to-apples."""
        for name, layers in [("synthface256_dit12", 12),
                             ("synthface256_dit9", 9)]:
            cfg = load_config(name)
            dm = cfg.dit_model_config
            assert dm.hidden_size == 288
            assert dm.patch_size == 2
            assert dm.num_layers == layers
            assert dm.num_heads == 9
            assert dm.head_dim == 32
            assert dm.condition_config.condition_types == ["text", "image"]
            # same latent geometry as the UNet flagship run
            assert cfg.dataset_params.im_size == 256
            assert cfg.autoencoder_params.down_sample == [True, True, True]
            # dit_model_config and ldm_params must agree on conditioning
            # (trainer data-prep reads ldm_params, model builder reads
            # dit_model_config)
            lc = cfg.ldm_params.condition_config
            assert (lc.text_condition_config.text_embed_dim
                    == dm.condition_config.text_condition_config.text_embed_dim)

    def test_unknown_config_raises(self):
        with pytest.raises(FileNotFoundError):
            load_config("nonexistent_config")


class TestLdmScaling:
    def test_identity_factor(self):
        out = build_ldm_scaling(1.0)
        assert out["down_channels"] == [256, 384, 512, 768]
        assert out["mid_channels"] == [768, 512]
        assert out["num_heads"] == 16
        assert out["norm_channels"] == 32

    def test_tc05_factor(self):
        # c_factor=2.58 is the tc05 model (Model_DiT_12L_config.py:3)
        out = build_ldm_scaling(2.58)
        assert all(c % 16 == 0 for c in out["down_channels"])
        assert out["mid_channels"] == [out["down_channels"][-1],
                                       out["down_channels"][-2]]
        for c in out["down_channels"] + out["mid_channels"]:
            assert c % out["num_heads"] == 0
            assert c % out["norm_channels"] == 0

    def test_invalid_factor(self):
        with pytest.raises(ValueError):
            build_ldm_scaling(0)


class TestFlatPresets:
    def test_dit_12l(self):
        cfg = presets.model_dit_12l()
        d = cfg.dit_model_config
        assert (d.hidden_size, d.patch_size, d.num_layers,
                d.num_heads, d.head_dim) == (288, 2, 12, 9, 32)
        assert d.condition_config.condition_types == ["image"]

    def test_dit_9l(self):
        assert presets.model_dit_9l().dit_model_config.num_layers == 9

    def test_tc05_text_image(self):
        cfg = presets.celebhq_text_image_cond_tc05()
        cc = cfg.condition_config
        assert cc["condition_types"] == ["text", "image"]
        assert cc["text_condition_config"]["cond_drop_prob"] == 0.1
        assert cfg.train_params.ldm_batch_size == 28
