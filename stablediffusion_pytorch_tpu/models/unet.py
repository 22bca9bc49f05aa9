"""Conditional latent UNet denoiser (covers the unconditional case too).

Re-implements reference models/unet_cond_base.py:9-183 (and its uncond twin
models/unet_base.py:7-100, which is the same network without a condition
config) in NHWC flax.nnx:

  * class conditioning: one-hot @ embedding table summed into the t-emb
    (reference: unet_cond_base.py:58-62, 151-156)
  * text conditioning: cross-attention on every Down/Mid/Up block with
    context_dim = text_embed_dim (reference: 89-119)
  * image/mask conditioning: 1x1 cond_conv_in maps the mask channels, resize
    to latent size, channel-concat, then conv_in_concat (reference: 64-74,
    131-141)

CFG dropout is done by the caller, not here (same contract as the reference).
Config keys match the reference YAML (config/celebhq_text_image_cond.yaml).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.models.blocks import DownBlock, MidBlock, UpBlockUnet
from stablediffusion_pytorch_tpu.models.common import get_time_embedding
from stablediffusion_pytorch_tpu.utils.config_utils import (
    get_config_value,
    validate_class_config,
    validate_class_conditional_input,
    validate_image_conditional_input,
    validate_text_config,
)


def _block_fwd(blk, x, t_emb, context):
    """Module-level thunk for nnx.remat (down/mid blocks)."""
    return blk(x, t_emb, context)


def _up_fwd(blk, x, skip, t_emb, context):
    """Module-level thunk for nnx.remat (up blocks take the skip tensor)."""
    return blk(x, skip, t_emb, context)


# Gradient checkpointing: recompute each block's activations in the
# backward pass (jax.checkpoint) — activation HBM drops from O(blocks) to
# O(1) blocks for one extra forward, the standard TPU trade for training
# larger batches/resolutions per chip. The skip tensors the UNet topology
# needs (down_outs) are NOT freed — they are carried between blocks — so
# the savings come from the per-block internals (resnet/attention
# activations), which dominate. Enable via ``gradient_checkpointing: true``
# in the model config / ``model.remat = True`` / ``--remat`` on trainers.
_block_fwd_remat = nnx.remat(_block_fwd)
_up_fwd_remat = nnx.remat(_up_fwd)


class Unet(nnx.Module):
    def __init__(self, im_channels: int, model_config: dict, *, rngs: nnx.Rngs,
                 dtype=None):
        down_channels = model_config["down_channels"]
        mid_channels = model_config["mid_channels"]
        self.t_emb_dim = model_config["time_emb_dim"]
        self.down_sample = model_config["down_sample"]
        attns = model_config["attn_down"]
        norm_channels = model_config["norm_channels"]
        num_heads = model_config["num_heads"]
        conv_out_channels = model_config["conv_out_channels"]
        # gradient checkpointing: recompute block activations in backward
        self.remat = bool(model_config.get("gradient_checkpointing", False))

        assert mid_channels[0] == down_channels[-1]
        assert mid_channels[-1] == down_channels[-2]
        assert len(self.down_sample) == len(down_channels) - 1
        assert len(attns) == len(down_channels) - 1

        # ----- conditioning config (reference: unet_cond_base.py:35-76) -----
        self.class_cond = False
        self.text_cond = False
        self.image_cond = False
        self.text_embed_dim = None
        condition_config = get_config_value(model_config, "condition_config", None)
        if condition_config is not None:
            assert "condition_types" in condition_config, \
                "Condition Type not provided in model config"
            condition_types = condition_config["condition_types"]
            if "class" in condition_types:
                validate_class_config(condition_config)
                self.class_cond = True
                self.num_classes = condition_config["class_condition_config"]["num_classes"]
            if "text" in condition_types:
                validate_text_config(condition_config)
                self.text_cond = True
                self.text_embed_dim = condition_config["text_condition_config"]["text_embed_dim"]
            if "image" in condition_types:
                self.image_cond = True
                self.im_cond_input_ch = condition_config["image_condition_config"][
                    "image_condition_input_channels"]
                self.im_cond_output_ch = condition_config["image_condition_config"][
                    "image_condition_output_channels"]
        self.cond = self.text_cond or self.image_cond or self.class_cond

        kw = dict(rngs=rngs, dtype=dtype)

        if self.class_cond:
            # no special null class: unconditional = all-zero one-hot
            self.class_emb = nnx.Embed(self.num_classes, self.t_emb_dim, rngs=rngs)

        if self.image_cond:
            self.cond_conv_in = nnx.Conv(self.im_cond_input_ch,
                                         self.im_cond_output_ch,
                                         kernel_size=(1, 1), use_bias=False, **kw)
            self.conv_in_concat = nnx.Conv(im_channels + self.im_cond_output_ch,
                                           down_channels[0], kernel_size=(3, 3),
                                           padding="SAME", **kw)
        else:
            self.conv_in = nnx.Conv(im_channels, down_channels[0],
                                    kernel_size=(3, 3), padding="SAME", **kw)

        self.t_proj_1 = nnx.Linear(self.t_emb_dim, self.t_emb_dim, **kw)
        self.t_proj_2 = nnx.Linear(self.t_emb_dim, self.t_emb_dim, **kw)

        self.downs = nnx.List([
            DownBlock(down_channels[i], down_channels[i + 1], self.t_emb_dim,
                      down_sample=self.down_sample[i], num_heads=num_heads,
                      num_layers=model_config["num_down_layers"],
                      attn=attns[i], norm_channels=norm_channels,
                      cross_attn=self.text_cond,
                      context_dim=self.text_embed_dim, **kw)
            for i in range(len(down_channels) - 1)
        ])
        self.mids = nnx.List([
            MidBlock(mid_channels[i], mid_channels[i + 1], self.t_emb_dim,
                     num_heads=num_heads,
                     num_layers=model_config["num_mid_layers"],
                     norm_channels=norm_channels, cross_attn=self.text_cond,
                     context_dim=self.text_embed_dim, **kw)
            for i in range(len(mid_channels) - 1)
        ])
        self.ups = nnx.List([
            UpBlockUnet(down_channels[i] * 2,
                        down_channels[i - 1] if i != 0 else conv_out_channels,
                        self.t_emb_dim, up_sample=self.down_sample[i],
                        num_heads=num_heads,
                        num_layers=model_config["num_up_layers"],
                        norm_channels=norm_channels, cross_attn=self.text_cond,
                        context_dim=self.text_embed_dim, **kw)
            for i in reversed(range(len(down_channels) - 1))
        ])

        self.norm_out = nnx.GroupNorm(conv_out_channels,
                                      num_groups=norm_channels, epsilon=1e-5, **kw)
        self.conv_out = nnx.Conv(conv_out_channels, im_channels,
                                 kernel_size=(3, 3), padding="SAME", **kw)

    def __call__(self, x: jax.Array, t: jax.Array,
                 cond_input: Optional[dict] = None) -> jax.Array:
        """x: (B, H, W, C) latent; t: () or (B,) int timesteps; cond_input:
        dict with optional keys 'class' (B, num_classes one-hot), 'text'
        (B, seq, text_embed_dim), 'image' (B, Hm, Wm, mask_ch)."""
        if self.cond:
            assert cond_input is not None, \
                "Model initialized with conditioning so cond_input cannot be None"

        if self.image_cond:
            validate_image_conditional_input(cond_input, x)
            from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
                nearest_resize,
            )

            im_cond = cond_input["image"].astype(x.dtype)
            im_cond = nearest_resize(im_cond, x.shape[1], x.shape[2])
            im_cond = self.cond_conv_in(im_cond)
            out = self.conv_in_concat(jnp.concatenate([x, im_cond], axis=-1))
        else:
            out = self.conv_in(x)

        t = jnp.atleast_1d(jnp.asarray(t))
        t_emb = get_time_embedding(t, self.t_emb_dim)
        t_emb = self.t_proj_2(nnx.silu(self.t_proj_1(t_emb)))

        if self.class_cond:
            validate_class_conditional_input(cond_input, x, self.num_classes)
            # einsum('b n, n d -> b d') of one-hot with the embedding table
            class_embed = cond_input["class"].astype(t_emb.dtype) @ \
                self.class_emb.embedding[...].astype(t_emb.dtype)
            t_emb = t_emb + class_embed

        context = None
        if self.text_cond:
            assert "text" in cond_input, \
                "Model initialized with text conditioning but cond_input has no text information"
            context = cond_input["text"]

        blk_fwd = _block_fwd_remat if self.remat else _block_fwd
        up_fwd = _up_fwd_remat if self.remat else _up_fwd
        down_outs = []
        for down in self.downs:
            down_outs.append(out)
            out = blk_fwd(down, out, t_emb, context)
        for mid in self.mids:
            out = blk_fwd(mid, out, t_emb, context)
        for up in self.ups:
            out = up_fwd(up, out, down_outs.pop(), t_emb, context)
        out = nnx.silu(self.norm_out(out))
        return self.conv_out(out)
