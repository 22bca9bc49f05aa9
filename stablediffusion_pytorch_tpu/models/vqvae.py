"""VQVAE stage-1 autoencoder with nearest-codebook quantization and
straight-through gradients, plus the analog-noise-robust encode variant.

Re-implements reference models/vqvae.py (encoder/decoder built from
Down/Mid/Up blocks, codebook lookup via distance argmin + STE, codebook &
commitment MSE losses) and models/vqvae_noise.py (encode(x, n_scale, key)
adds uniform-range Gaussian noise to the pre-quant latent so the decoder
learns robustness to CIM analog noise).

Config keys match the reference YAML (config/celebhq.yaml:25-37):
down_channels, mid_channels, down_sample, num_down_layers, num_mid_layers,
num_up_layers, attn_down, z_channels, codebook_size, norm_channels,
num_heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.models.blocks import DownBlock, MidBlock, UpBlock


def _blk_fwd(blk, x):
    """Module-level thunk for nnx.remat (VQVAE blocks take no t_emb)."""
    return blk(x)


# Gradient checkpointing for the stage-1 autoencoder: at 256² batch 8 the
# encoder/decoder resnet+attention activations dominate training HBM (the
# GAN step holds generator AND discriminator graphs live). Recompute each
# block in the backward pass via ``gradient_checkpointing: true`` in the
# autoencoder config / ``model.remat = True`` / ``train_vqvae --remat``.
_blk_fwd_remat = nnx.remat(_blk_fwd)


class VQVAE(nnx.Module):
    def __init__(self, im_channels: int, model_config: dict, *, rngs: nnx.Rngs,
                 dtype=None):
        down_channels = model_config["down_channels"]
        mid_channels = model_config["mid_channels"]
        self.down_sample = model_config["down_sample"]
        num_down_layers = model_config["num_down_layers"]
        num_mid_layers = model_config["num_mid_layers"]
        num_up_layers = model_config["num_up_layers"]
        attns = model_config["attn_down"]
        self.z_channels = model_config["z_channels"]
        self.codebook_size = model_config["codebook_size"]
        norm_channels = model_config["norm_channels"]
        num_heads = model_config["num_heads"]
        # gradient checkpointing: recompute block activations in backward
        self.remat = bool(model_config.get("gradient_checkpointing", False))

        assert mid_channels[0] == down_channels[-1]
        assert mid_channels[-1] == down_channels[-1]
        assert len(self.down_sample) == len(down_channels) - 1
        assert len(attns) == len(down_channels) - 1

        kw = dict(rngs=rngs, dtype=dtype)

        # ----- encoder (reference: vqvae.py:35-64) -----
        self.encoder_conv_in = nnx.Conv(im_channels, down_channels[0],
                                        kernel_size=(3, 3), padding="SAME", **kw)
        self.encoder_layers = nnx.List([
            DownBlock(down_channels[i], down_channels[i + 1], t_emb_dim=None,
                      down_sample=self.down_sample[i], num_heads=num_heads,
                      num_layers=num_down_layers, attn=attns[i],
                      norm_channels=norm_channels, **kw)
            for i in range(len(down_channels) - 1)
        ])
        self.encoder_mids = nnx.List([
            MidBlock(mid_channels[i], mid_channels[i + 1], t_emb_dim=None,
                     num_heads=num_heads, num_layers=num_mid_layers,
                     norm_channels=norm_channels, **kw)
            for i in range(len(mid_channels) - 1)
        ])
        self.encoder_norm_out = nnx.GroupNorm(down_channels[-1],
                                              num_groups=norm_channels, epsilon=1e-5, **kw)
        self.encoder_conv_out = nnx.Conv(down_channels[-1], self.z_channels,
                                         kernel_size=(3, 3), padding="SAME", **kw)
        self.pre_quant_conv = nnx.Conv(self.z_channels, self.z_channels,
                                       kernel_size=(1, 1), **kw)
        self.embedding = nnx.Embed(self.codebook_size, self.z_channels, rngs=rngs)

        # ----- decoder (reference: vqvae.py:66-91) -----
        self.post_quant_conv = nnx.Conv(self.z_channels, self.z_channels,
                                        kernel_size=(1, 1), **kw)
        self.decoder_conv_in = nnx.Conv(self.z_channels, mid_channels[-1],
                                        kernel_size=(3, 3), padding="SAME", **kw)
        self.decoder_mids = nnx.List([
            MidBlock(mid_channels[i], mid_channels[i - 1], t_emb_dim=None,
                     num_heads=num_heads, num_layers=num_mid_layers,
                     norm_channels=norm_channels, **kw)
            for i in reversed(range(1, len(mid_channels)))
        ])
        self.decoder_layers = nnx.List([
            UpBlock(down_channels[i], down_channels[i - 1], t_emb_dim=None,
                    up_sample=self.down_sample[i - 1], num_heads=num_heads,
                    num_layers=num_up_layers, attn=attns[i - 1],
                    norm_channels=norm_channels, **kw)
            for i in reversed(range(1, len(down_channels)))
        ])
        self.decoder_norm_out = nnx.GroupNorm(down_channels[0],
                                              num_groups=norm_channels, epsilon=1e-5, **kw)
        self.decoder_conv_out = nnx.Conv(down_channels[0], im_channels,
                                         kernel_size=(3, 3), padding="SAME", **kw)

    # ------------------------------------------------------------------
    def quantize(self, x: jax.Array):
        """Nearest-codebook lookup with straight-through estimator.

        x is NHWC; distances computed as ||x||^2 - 2 x.E^T + ||E||^2 (one
        MXU matmul instead of the reference's torch.cdist,
        reference: vqvae.py:93-126). Returns (quantized NHWC, losses dict,
        indices (B, H, W)).
        """
        b, h, w, c = x.shape
        flat = x.reshape(-1, c)
        emb = self.embedding.embedding[...].astype(flat.dtype)  # (K, C)

        x_sq = jnp.sum(flat**2, axis=-1, keepdims=True)
        e_sq = jnp.sum(emb**2, axis=-1)[None, :]
        dist = x_sq - 2.0 * flat @ emb.T + e_sq
        indices = jnp.argmin(dist, axis=-1)

        quant = emb[indices]
        commitment_loss = jnp.mean((jax.lax.stop_gradient(quant) - flat) ** 2)
        codebook_loss = jnp.mean((quant - jax.lax.stop_gradient(flat)) ** 2)
        losses = {"codebook_loss": codebook_loss,
                  "commitment_loss": commitment_loss}
        quant = flat + jax.lax.stop_gradient(quant - flat)  # STE (vqvae.py:121)
        return quant.reshape(b, h, w, c), losses, indices.reshape(b, h, w)

    def _encode_features(self, x: jax.Array) -> jax.Array:
        fwd = _blk_fwd_remat if self.remat else _blk_fwd
        out = self.encoder_conv_in(x)
        for down in self.encoder_layers:
            out = fwd(down, out)
        for mid in self.encoder_mids:
            out = fwd(mid, out)
        out = nnx.silu(self.encoder_norm_out(out))
        out = self.encoder_conv_out(out)
        return self.pre_quant_conv(out)

    def encode(self, x: jax.Array, n_scale: float = 0.0,
               key: Optional[jax.Array] = None):
        """Encode to quantized latent. With ``n_scale > 0`` adds
        range-relative Gaussian noise to the pre-quant latent
        (reference: vqvae_noise.py:144-183 add_noise: n_scale*(max-min)*randn).
        """
        out = self._encode_features(x)
        if n_scale:
            assert key is not None, "encode with n_scale > 0 needs a PRNG key"
            rng_range = jnp.max(out) - jnp.min(out)
            out = out + rng_range * n_scale * jax.random.normal(key, out.shape, out.dtype)
        out, quant_losses, _ = self.quantize(out)
        return out, quant_losses

    def decode(self, z: jax.Array) -> jax.Array:
        fwd = _blk_fwd_remat if self.remat else _blk_fwd
        out = self.post_quant_conv(z)
        out = self.decoder_conv_in(out)
        for mid in self.decoder_mids:
            out = fwd(mid, out)
        for up in self.decoder_layers:
            out = fwd(up, out)
        out = nnx.silu(self.decoder_norm_out(out))
        return self.decoder_conv_out(out)

    def __call__(self, x: jax.Array, n_scale: float = 0.0,
                 key: Optional[jax.Array] = None):
        z, quant_losses = self.encode(x, n_scale=n_scale, key=key)
        out = self.decode(z)
        return out, z, quant_losses
