"""KL-VAE stage-1 alternative (mean/logvar heads + reparameterized sample).

Re-implements reference models/vae.py:1-121 in NHWC flax.nnx. The encoder
emits 2*z_channels (mean ‖ logvar); ``encode`` returns the reparameterized
sample plus the raw encoder output (for the KL loss, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.models.blocks import DownBlock, MidBlock, UpBlock


class VAE(nnx.Module):
    def __init__(self, im_channels: int, model_config: dict, *, rngs: nnx.Rngs,
                 dtype=None):
        down_channels = model_config["down_channels"]
        mid_channels = model_config["mid_channels"]
        self.down_sample = model_config["down_sample"]
        attns = model_config["attn_down"]
        self.z_channels = model_config["z_channels"]
        norm_channels = model_config["norm_channels"]
        num_heads = model_config["num_heads"]

        assert mid_channels[0] == down_channels[-1]
        assert mid_channels[-1] == down_channels[-1]
        assert len(self.down_sample) == len(down_channels) - 1

        kw = dict(rngs=rngs, dtype=dtype)

        self.encoder_conv_in = nnx.Conv(im_channels, down_channels[0],
                                        kernel_size=(3, 3), padding="SAME", **kw)
        self.encoder_layers = nnx.List([
            DownBlock(down_channels[i], down_channels[i + 1], t_emb_dim=None,
                      down_sample=self.down_sample[i], num_heads=num_heads,
                      num_layers=model_config["num_down_layers"], attn=attns[i],
                      norm_channels=norm_channels, **kw)
            for i in range(len(down_channels) - 1)
        ])
        self.encoder_mids = nnx.List([
            MidBlock(mid_channels[i], mid_channels[i + 1], t_emb_dim=None,
                     num_heads=num_heads,
                     num_layers=model_config["num_mid_layers"],
                     norm_channels=norm_channels, **kw)
            for i in range(len(mid_channels) - 1)
        ])
        self.encoder_norm_out = nnx.GroupNorm(down_channels[-1],
                                              num_groups=norm_channels, epsilon=1e-5, **kw)
        # 2x z-channels: mean and logvar (reference: vae.py:98)
        self.encoder_conv_out = nnx.Conv(down_channels[-1], 2 * self.z_channels,
                                         kernel_size=(3, 3), padding="SAME", **kw)
        self.pre_quant_conv = nnx.Conv(2 * self.z_channels, 2 * self.z_channels,
                                       kernel_size=(1, 1), **kw)

        self.post_quant_conv = nnx.Conv(self.z_channels, self.z_channels,
                                        kernel_size=(1, 1), **kw)
        self.decoder_conv_in = nnx.Conv(self.z_channels, mid_channels[-1],
                                        kernel_size=(3, 3), padding="SAME", **kw)
        self.decoder_mids = nnx.List([
            MidBlock(mid_channels[i], mid_channels[i - 1], t_emb_dim=None,
                     num_heads=num_heads,
                     num_layers=model_config["num_mid_layers"],
                     norm_channels=norm_channels, **kw)
            for i in reversed(range(1, len(mid_channels)))
        ])
        self.decoder_layers = nnx.List([
            UpBlock(down_channels[i], down_channels[i - 1], t_emb_dim=None,
                    up_sample=self.down_sample[i - 1], num_heads=num_heads,
                    num_layers=model_config["num_up_layers"], attn=attns[i - 1],
                    norm_channels=norm_channels, **kw)
            for i in reversed(range(1, len(down_channels)))
        ])
        self.decoder_norm_out = nnx.GroupNorm(down_channels[0],
                                              num_groups=norm_channels, epsilon=1e-5, **kw)
        self.decoder_conv_out = nnx.Conv(down_channels[0], im_channels,
                                         kernel_size=(3, 3), padding="SAME", **kw)

    def encode(self, x: jax.Array, key: jax.Array):
        out = self.encoder_conv_in(x)
        for down in self.encoder_layers:
            out = down(out)
        for mid in self.encoder_mids:
            out = mid(out)
        out = nnx.silu(self.encoder_norm_out(out))
        out = self.encoder_conv_out(out)
        out = self.pre_quant_conv(out)
        mean, logvar = jnp.split(out, 2, axis=-1)
        std = jnp.exp(0.5 * logvar)
        sample = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return sample, out

    def decode(self, z: jax.Array) -> jax.Array:
        out = self.post_quant_conv(z)
        out = self.decoder_conv_in(out)
        for mid in self.decoder_mids:
            out = mid(out)
        for up in self.decoder_layers:
            out = up(out)
        out = nnx.silu(self.decoder_norm_out(out))
        return self.decoder_conv_out(out)

    def __call__(self, x: jax.Array, key: jax.Array):
        z, encoder_output = self.encode(x, key)
        out = self.decode(z)
        return out, encoder_output
