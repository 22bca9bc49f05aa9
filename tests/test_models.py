"""Model forward-pass tests: shapes, conditioning paths, jit-ability.

Mirrors the reference's smoke scripts (transformer_test.py:36-50 one cond
forward with random text+mask; temp_model.py param counting) with small
configs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from stablediffusion_pytorch_tpu.models import VQVAE, VAE, Unet, DIT, Discriminator
from stablediffusion_pytorch_tpu.models.common import get_time_embedding


TINY_AE = {
    "down_channels": [16, 32, 32],
    "mid_channels": [32, 32],
    "down_sample": [True, True],
    "num_down_layers": 1,
    "num_mid_layers": 1,
    "num_up_layers": 1,
    "attn_down": [False, False],
    "z_channels": 4,
    "codebook_size": 32,
    "norm_channels": 8,
    "num_heads": 4,
}

TINY_UNET = {
    "down_channels": [16, 32, 32, 48],
    "mid_channels": [48, 48, 32],
    "down_sample": [True, True, False],
    "attn_down": [True, True, True],
    "time_emb_dim": 32,
    "norm_channels": 8,
    "num_heads": 4,
    "conv_out_channels": 24,
    "num_down_layers": 1,
    "num_mid_layers": 1,
    "num_up_layers": 1,
}

COND_CFG = {
    "condition_types": ["class", "text", "image"],
    "class_condition_config": {"num_classes": 10},
    "text_condition_config": {"text_embed_dim": 24},
    "image_condition_config": {
        "image_condition_input_channels": 18,
        "image_condition_output_channels": 3,
    },
}

TINY_DIT = {
    "hidden_size": 32,
    "patch_size": 2,
    "timestep_emb_dim": 16,
    "num_layers": 2,
    "num_heads": 4,
    "head_dim": 8,
}


class TestTimeEmbedding:
    def test_formula(self):
        t = jnp.array([0, 5])
        emb = get_time_embedding(t, 8)
        factor = 10000 ** (np.arange(4) / 4)
        expected0 = np.concatenate([np.sin(0 / factor), np.cos(0 / factor)])
        expected5 = np.concatenate([np.sin(5 / factor), np.cos(5 / factor)])
        np.testing.assert_allclose(emb[0], expected0, rtol=1e-5)
        np.testing.assert_allclose(emb[1], expected5, rtol=1e-5, atol=1e-6)


class TestVQVAE:
    def test_roundtrip_shapes_and_losses(self):
        model = VQVAE(3, TINY_AE, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        out, z, losses = model(x)
        assert out.shape == (2, 32, 32, 3)
        assert z.shape == (2, 8, 8, 4)  # 2x downsample twice
        assert set(losses) == {"codebook_loss", "commitment_loss"}
        assert np.isfinite(float(losses["codebook_loss"]))

    def test_quantize_ste_gradient_reaches_encoder_input(self):
        model = VQVAE(3, TINY_AE, rngs=nnx.Rngs(0))

        def loss_fn(m, x):
            out, _, losses = m(x)
            return jnp.mean(out**2) + losses["codebook_loss"] + losses["commitment_loss"]

        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        grads = nnx.grad(loss_fn)(model, x)
        g_in = grads.encoder_conv_in.kernel[...]
        assert float(jnp.abs(g_in).max()) > 0, "STE must pass grads through quantize"
        g_emb = grads.embedding.embedding[...]
        assert float(jnp.abs(g_emb).max()) > 0, "codebook loss must update embeddings"

    def test_quantize_snaps_to_codebook(self):
        model = VQVAE(3, TINY_AE, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
        q, _, idx = model.quantize(x)
        emb = np.asarray(model.embedding.embedding[...])
        np.testing.assert_allclose(
            np.asarray(q).reshape(-1, 4), emb[np.asarray(idx).reshape(-1)], rtol=1e-5
        )

    def test_noise_encode_variant(self):
        model = VQVAE(3, TINY_AE, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        z1, _ = model.encode(x)
        z2, _ = model.encode(x, n_scale=0.5, key=jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(z1), np.asarray(z2))


class TestVAE:
    def test_encode_decode(self):
        model = VAE(3, TINY_AE, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        out, enc = model(x, jax.random.PRNGKey(1))
        assert out.shape == x.shape
        assert enc.shape == (1, 8, 8, 8)  # 2 * z_channels


class TestUnet:
    def test_unconditional_forward(self):
        model = Unet(4, TINY_UNET, rngs=nnx.Rngs(0))
        x = jnp.ones((2, 16, 16, 4))
        out = model(x, jnp.array([3, 7]))
        assert out.shape == x.shape

    def test_full_conditioning(self):
        cfg = dict(TINY_UNET, condition_config=COND_CFG)
        model = Unet(4, cfg, rngs=nnx.Rngs(0))
        x = jnp.ones((2, 16, 16, 4))
        cond = {
            "class": jax.nn.one_hot(jnp.array([1, 5]), 10),
            "text": jnp.ones((2, 7, 24)),
            "image": jnp.ones((2, 64, 64, 18)),
        }
        out = model(x, jnp.array([1, 2]), cond)
        assert out.shape == x.shape

    def test_missing_cond_raises(self):
        cfg = dict(TINY_UNET, condition_config=COND_CFG)
        model = Unet(4, cfg, rngs=nnx.Rngs(0))
        with pytest.raises(AssertionError):
            model(jnp.ones((1, 16, 16, 4)), jnp.array([0]))

    def test_jit_forward(self):
        model = Unet(4, TINY_UNET, rngs=nnx.Rngs(0))

        @nnx.jit
        def f(m, x, t):
            return m(x, t)

        out = f(model, jnp.ones((1, 16, 16, 4)), jnp.array([0]))
        assert out.shape == (1, 16, 16, 4)


class TestDIT:
    def test_unconditional_forward(self):
        model = DIT(4, TINY_DIT, rngs=nnx.Rngs(0))
        x = jnp.ones((2, 16, 16, 4))
        out = model(x, jnp.array([3, 7]))
        assert out.shape == x.shape

    def test_zero_init_gives_zero_output_shift(self):
        # proj_out is zero-init, so the raw output must be exactly zero
        model = DIT(4, TINY_DIT, rngs=nnx.Rngs(0))
        out = model(jnp.ones((1, 16, 16, 4)), jnp.array([5]))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_mask_and_class_and_text_conditioning(self):
        cfg = dict(TINY_DIT, condition_config=COND_CFG)
        model = DIT(4, cfg, rngs=nnx.Rngs(0))
        x = jnp.ones((2, 16, 16, 4))
        cond = {
            "class": jax.nn.one_hot(jnp.array([0, 3]), 10),
            "text": jnp.ones((2, 7, 24)),
            "image": jnp.ones((2, 64, 64, 18)),
        }
        out = model(x, jnp.array([1, 2]), cond)
        assert out.shape == x.shape

    def test_patchify_unpatchify_inverse(self):
        from stablediffusion_pytorch_tpu.models.dit import PatchEmbedding

        pe = PatchEmbedding(4, 2, 2, 32, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        out = pe(x)
        assert out.shape == (1, 16, 32)


class TestDiscriminator:
    def test_patch_logits_grid(self):
        model = Discriminator(3, rngs=nnx.Rngs(0))
        x = jnp.ones((2, 64, 64, 3))
        out = model(x)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert out.shape[1] == 7  # 64 -> 32 -> 16 -> 8 -> 7 (stride 1, pad 1, k 4)


class TestBatchedAdaln:
    def test_batched_mods_match_per_layer_adaln(self):
        """DIT batches all layers' adaLN modulation GEMMs into one; the
        result must equal running each layer's own adaptive_norm_layer."""
        from stablediffusion_pytorch_tpu.models.common import (
            get_time_embedding,
        )

        model = DIT(4, dict(TINY_DIT), rngs=nnx.Rngs(0))
        # randomize the zero-init adaLN + proj_out so the check is non-trivial
        key = jax.random.PRNGKey(5)
        for i, l in enumerate(model.transformer_layers):
            l.adaptive_norm_layer.kernel[...] = 0.1 * jax.random.normal(
                jax.random.fold_in(key, i),
                l.adaptive_norm_layer.kernel[...].shape)
        model.adaptive_norm_layer.kernel[...] = 0.1 * jax.random.normal(
            jax.random.fold_in(key, 99),
            model.adaptive_norm_layer.kernel[...].shape)
        model.proj_out.kernel[...] = 0.1 * jax.random.normal(
            jax.random.fold_in(key, 100), model.proj_out.kernel[...].shape)

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        t = jnp.array([3, 7])
        got = model(x, t)

        # manual forward with per-layer adaLN (mods=None path)
        out = model.patch_embed_layer(x)
        t_emb = get_time_embedding(jnp.atleast_1d(t),
                                   model.timestep_emb_dim)
        t_emb = model.t_proj_2(nnx.relu(model.t_proj_1(t_emb)))
        for layer in model.transformer_layers:
            out = layer(out, t_emb, None)
        shift, scale = jnp.split(
            model.adaptive_norm_layer(nnx.relu(t_emb)), 2, axis=-1)
        out = model.norm(out) * (1 + scale[:, None]) + shift[:, None]
        out = model.proj_out(out)
        b, h, w, _ = x.shape
        ph = model.patch_height
        out = out.reshape(b, h // ph, w // ph, ph, ph, 4)
        want = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


class TestNearestResize:
    def test_strided_fast_path_matches_jax_image_resize(self):
        """Integer-ratio nearest downsample must be bit-identical to
        jax.image.resize (the strided-slice fast path, VERDICT W9 perf)."""
        from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
            nearest_resize,
        )

        for (h, w, oh, ow) in [(64, 64, 16, 16), (512, 512, 32, 32),
                               (48, 96, 16, 32), (33, 33, 11, 11)]:
            x = jax.random.normal(jax.random.PRNGKey(h + w), (2, h, w, 3))
            want = jax.image.resize(x, (2, oh, ow, 3), method="nearest")
            got = nearest_resize(x, oh, ow)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_non_integer_ratio_falls_back(self):
        from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
            nearest_resize,
        )

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, 30, 2))
        want = jax.image.resize(x, (1, 8, 8, 2), method="nearest")
        np.testing.assert_array_equal(np.asarray(nearest_resize(x, 8, 8)),
                                      np.asarray(want))


class TestMaskPreResize:
    def test_pre_resized_mask_is_numerically_identical(self):
        """resize_mask_to_latent commutes with the in-model resize + 1x1
        cond conv (the PERF.md mask optimization must not change numerics)."""
        from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
            resize_mask_to_latent,
        )

        cfg = dict(TINY_DIT, condition_config={
            "condition_types": ["image"],
            "image_condition_config": {
                "image_condition_input_channels": 18,
                "image_condition_output_channels": 3,
            },
        })
        model = DIT(4, cfg, rngs=nnx.Rngs(1))
        # give proj_out real weights so outputs are non-zero
        model.proj_out.kernel[...] = jax.random.normal(
            jax.random.PRNGKey(9), model.proj_out.kernel[...].shape) * 0.1
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        t = jnp.array([3, 7])
        mask_full = jnp.asarray(
            (jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 18))
             > 0.5).astype(jnp.float32))
        out_full = model(x, t, {"image": mask_full})
        mask_small = resize_mask_to_latent(mask_full, 16)
        out_small = model(x, t, {"image": mask_small})
        np.testing.assert_allclose(np.asarray(out_full),
                                   np.asarray(out_small), rtol=1e-5,
                                   atol=1e-6)
