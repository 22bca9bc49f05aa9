"""FULL-MODEL cross-framework parity: the reference's own torch models
(/root/reference/models/{unet_cond_base,transformer,vqvae}.py), instantiated
with random weights, ported through utils/torch_convert.py, must match our
NHWC nnx models' forward pass at fp32 (VERDICT r3 missing-#2).

This validates the checkpoint importers end-to-end AND gives a
reference-comparable numerical gate that needs no downloaded weights: any
layout/ordering/eps divergence between the frameworks shows up as a
max-abs-diff failure here.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference's model modules (read-only; torch CPU)."""
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    return {
        "unet": importlib.import_module("models.unet_cond_base").Unet,
        "dit": importlib.import_module("models.transformer").DIT,
        "vqvae": importlib.import_module("models.vqvae").VQVAE,
    }


COND = {
    "condition_types": ["text", "image", "class"],
    "class_condition_config": {"num_classes": 5,
                               "cond_drop_prob": 0.1},
    "text_condition_config": {"text_embed_model": "clip",
                              "text_embed_dim": 12,
                              "cond_drop_prob": 0.1},
    "image_condition_config": {"image_condition_input_channels": 18,
                               "image_condition_output_channels": 3,
                               "image_condition_h": 8,
                               "image_condition_w": 8,
                               "cond_drop_prob": 0.1},
}

UNET_CFG = {
    "down_channels": [8, 16, 16],
    "mid_channels": [16, 16],
    "time_emb_dim": 16,
    "down_sample": [True, False],
    "num_down_layers": 1,
    "num_mid_layers": 1,
    "num_up_layers": 1,
    "attn_down": [True, True],
    "norm_channels": 4,
    "num_heads": 2,
    "conv_out_channels": 8,
    "condition_config": COND,
}

DIT_CFG = {
    "hidden_size": 32,
    "patch_size": 2,
    "timestep_emb_dim": 32,
    "num_layers": 2,
    "num_heads": 2,
    "head_dim": 16,
    "condition_config": COND,
}

VQVAE_CFG = {
    "z_channels": 3,
    "codebook_size": 32,
    "down_channels": [8, 16],
    "mid_channels": [16, 16],
    "down_sample": [True],
    "attn_down": [True],
    "norm_channels": 4,
    "num_heads": 2,
    "num_down_layers": 1,
    "num_mid_layers": 1,
    "num_up_layers": 1,
}

B, Z, HW = 2, 4, 8


def _state(tmodel):
    return {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}


def _cond_np(rng, latent_hw=HW):
    """Text + latent-res mask + one-hot class conditioning. The mask is
    already at latent resolution so the reference's internal
    F.interpolate(size=x.shape[-2:]) is the identity, matching our
    pre-resized-mask convention (tools/train_ddpm_cond.prepare_cond_batch)."""
    text = rng.normal(size=(B, 7, 12)).astype(np.float32)
    mask = (rng.uniform(size=(B, 18, latent_hw, latent_hw)) > 0.5).astype(
        np.float32)
    cls = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=B)]
    return text, mask, cls


def _max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


class TestFullUnetParity:
    def test_text_image_class_cond_forward(self, ref_models):
        """Reference Unet (unet_cond_base.py:124-183) vs models.Unet on the
        same random weights + text/mask/class conditioned input."""
        from stablediffusion_pytorch_tpu.models import Unet
        from stablediffusion_pytorch_tpu.utils.torch_convert import (
            load_torch_unet,
        )

        torch.manual_seed(0)
        tmodel = ref_models["unet"](Z, UNET_CFG).eval()
        model = Unet(Z, UNET_CFG, rngs=nnx.Rngs(0))
        load_torch_unet(model, _state(tmodel))

        rng = np.random.default_rng(0)
        x = rng.normal(size=(B, Z, HW, HW)).astype(np.float32)
        t = np.array([3, 911])
        text, mask, cls = _cond_np(rng)

        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                         {"text": torch.from_numpy(text),
                          "image": torch.from_numpy(mask),
                          "class": torch.from_numpy(cls)}).numpy()
        got = model(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                    {"text": jnp.asarray(text),
                     "image": jnp.asarray(mask.transpose(0, 2, 3, 1)),
                     "class": jnp.asarray(cls)})
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert ref.shape == got.shape
        assert _max_abs(ref, got) < 1e-4


class TestFullDitParity:
    def test_text_image_cond_forward(self, ref_models):
        """Reference DIT (transformer.py:153-213) vs models.DIT, including
        the batched-adaLN fast path, on text+mask conditioned input."""
        from stablediffusion_pytorch_tpu.models import DIT
        from stablediffusion_pytorch_tpu.utils.torch_convert import (
            load_torch_dit,
        )

        cfg = dict(DIT_CFG)
        cfg["condition_config"] = {
            "condition_types": ["text", "image"],
            "text_condition_config": COND["text_condition_config"],
            "image_condition_config": COND["image_condition_config"],
        }
        torch.manual_seed(1)
        tmodel = ref_models["dit"](Z, cfg, image_size=HW).eval()
        model = DIT(Z, cfg, image_size=HW, rngs=nnx.Rngs(0))
        load_torch_dit(model, _state(tmodel))

        rng = np.random.default_rng(1)
        x = rng.normal(size=(B, Z, HW, HW)).astype(np.float32)
        t = np.array([17, 501])
        text, mask, _ = _cond_np(rng)

        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                         {"text": torch.from_numpy(text),
                          "image": torch.from_numpy(mask)}).numpy()
        got = model(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                    {"text": jnp.asarray(text),
                     "image": jnp.asarray(mask.transpose(0, 2, 3, 1))})
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert ref.shape == got.shape
        assert _max_abs(ref, got) < 1e-4

    def test_class_cond_forward(self, ref_models):
        """Class-conditioned DIT (the einsum-into-t-emb branch,
        transformer.py:176-182)."""
        from stablediffusion_pytorch_tpu.models import DIT
        from stablediffusion_pytorch_tpu.utils.torch_convert import (
            load_torch_dit,
        )

        cfg = dict(DIT_CFG)
        cfg["condition_config"] = {
            "condition_types": ["class"],
            "class_condition_config": COND["class_condition_config"],
        }
        torch.manual_seed(2)
        tmodel = ref_models["dit"](Z, cfg, image_size=HW).eval()
        model = DIT(Z, cfg, image_size=HW, rngs=nnx.Rngs(0))
        load_torch_dit(model, _state(tmodel))

        rng = np.random.default_rng(2)
        x = rng.normal(size=(B, Z, HW, HW)).astype(np.float32)
        t = np.array([0, 999])
        _, _, cls = _cond_np(rng)

        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                         {"class": torch.from_numpy(cls)}).numpy()
        got = model(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                    {"class": jnp.asarray(cls)})
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert _max_abs(ref, got) < 1e-4


class TestFullVqvaeParity:
    def test_forward_recon_z_and_losses(self, ref_models):
        """Reference VQVAE (vqvae.py:93-158) vs models.VQVAE: recon image,
        quantized latent, and codebook/commitment losses all match."""
        from stablediffusion_pytorch_tpu.models import VQVAE
        from stablediffusion_pytorch_tpu.utils.torch_convert import (
            load_torch_vqvae,
        )

        torch.manual_seed(3)
        tmodel = ref_models["vqvae"](3, VQVAE_CFG).eval()
        model = VQVAE(3, VQVAE_CFG, rngs=nnx.Rngs(0))
        load_torch_vqvae(model, _state(tmodel))

        rng = np.random.default_rng(3)
        x = rng.normal(size=(B, 3, 16, 16)).astype(np.float32)

        with torch.no_grad():
            ref_out, ref_z, ref_losses = tmodel(torch.from_numpy(x))
        got_out, got_z, got_losses = model(
            jnp.asarray(x.transpose(0, 2, 3, 1)))

        assert _max_abs(ref_z.numpy(),
                        np.asarray(got_z).transpose(0, 3, 1, 2)) < 1e-4
        assert _max_abs(ref_out.numpy(),
                        np.asarray(got_out).transpose(0, 3, 1, 2)) < 1e-4
        for k_ref, k_ours in (("codebook_loss", "codebook_loss"),
                              ("commitment_loss", "commitment_loss")):
            assert abs(float(ref_losses[k_ref]) -
                       float(got_losses[k_ours])) < 1e-5
