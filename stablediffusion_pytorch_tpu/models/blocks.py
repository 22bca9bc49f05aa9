"""UNet / VQVAE composite blocks: Down, Mid, Up, UpBlockUnet.

Structural re-implementation of the reference's models/blocks.py (NHWC,
shared ResnetBlock/attention primitives from models/common.py):

  DownBlock   : N x [resnet (+t-emb) -> optional self-attn -> optional
                cross-attn] -> optional 4/2/SAME strided downsample conv
                (reference: blocks.py:27-146)
  MidBlock    : resnet, then N x [self-attn (+cross-attn) -> resnet]
                (reference: blocks.py:149-267)
  UpBlock     : ConvTranspose upsample -> skip concat -> N x [resnet ->
                optional self-attn]            (reference: blocks.py:270-370)
  UpBlockUnet : same but always self-attn + optional cross-attn, upsample on
                in_channels // 2               (reference: blocks.py:373-499)
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import nnx
import jax.numpy as jnp

from stablediffusion_pytorch_tpu.models.common import (
    ResnetBlock,
    SpatialCrossAttention,
    SpatialSelfAttention,
)


class DownBlock(nnx.Module):
    def __init__(self, in_channels, out_channels, t_emb_dim, down_sample,
                 num_heads, num_layers, attn, norm_channels,
                 cross_attn=False, context_dim=None, *, rngs: nnx.Rngs,
                 dtype=None):
        self.num_layers = num_layers
        self.down_sample = down_sample
        self.attn = attn
        self.cross_attn = cross_attn
        kw = dict(rngs=rngs, dtype=dtype)
        self.resnets = nnx.List([
            ResnetBlock(in_channels if i == 0 else out_channels, out_channels,
                        t_emb_dim, norm_channels, **kw)
            for i in range(num_layers)
        ])
        if attn:
            self.attentions = nnx.List([
                SpatialSelfAttention(out_channels, num_heads, norm_channels, **kw)
                for _ in range(num_layers)
            ])
        if cross_attn:
            assert context_dim is not None, "Context Dimension must be passed for cross attention"
            self.cross_attentions = nnx.List([
                SpatialCrossAttention(out_channels, num_heads, norm_channels,
                                      context_dim, **kw)
                for _ in range(num_layers)
            ])
        if down_sample:
            # 4x4 stride-2 conv, torch padding=1 == 'SAME' for even input
            self.down_sample_conv = nnx.Conv(
                out_channels, out_channels, kernel_size=(4, 4), strides=(2, 2),
                padding=[(1, 1), (1, 1)], **kw)

    def __call__(self, x, t_emb=None, context=None):
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i](out, t_emb)
            if self.attn:
                out = out + self.attentions[i](out)
            if self.cross_attn:
                assert context is not None, "context cannot be None if cross attention layers are used"
                out = out + self.cross_attentions[i](out, context)
        if self.down_sample:
            out = self.down_sample_conv(out)
        return out


class MidBlock(nnx.Module):
    def __init__(self, in_channels, out_channels, t_emb_dim, num_heads,
                 num_layers, norm_channels, cross_attn=False,
                 context_dim=None, *, rngs: nnx.Rngs, dtype=None):
        self.num_layers = num_layers
        self.cross_attn = cross_attn
        kw = dict(rngs=rngs, dtype=dtype)
        self.resnets = nnx.List([
            ResnetBlock(in_channels if i == 0 else out_channels, out_channels,
                        t_emb_dim, norm_channels, **kw)
            for i in range(num_layers + 1)
        ])
        self.attentions = nnx.List([
            SpatialSelfAttention(out_channels, num_heads, norm_channels, **kw)
            for _ in range(num_layers)
        ])
        if cross_attn:
            assert context_dim is not None, "Context Dimension must be passed for cross attention"
            self.cross_attentions = nnx.List([
                SpatialCrossAttention(out_channels, num_heads, norm_channels,
                                      context_dim, **kw)
                for _ in range(num_layers)
            ])

    def __call__(self, x, t_emb=None, context=None):
        out = self.resnets[0](x, t_emb)
        for i in range(self.num_layers):
            out = out + self.attentions[i](out)
            if self.cross_attn:
                assert context is not None, "context cannot be None if cross attention layers are used"
                out = out + self.cross_attentions[i](out, context)
            out = self.resnets[i + 1](out, t_emb)
        return out


class _Upsampler(nnx.Module):
    """ConvTranspose 4x4 stride-2 upsample (reference: blocks.py:339-341)."""

    def __init__(self, channels, *, rngs: nnx.Rngs, dtype=None):
        self.conv = nnx.ConvTranspose(channels, channels, kernel_size=(4, 4),
                                      strides=(2, 2), padding="SAME",
                                      dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class UpBlock(nnx.Module):
    def __init__(self, in_channels, out_channels, t_emb_dim, up_sample,
                 num_heads, num_layers, attn, norm_channels, *,
                 rngs: nnx.Rngs, dtype=None):
        self.num_layers = num_layers
        self.up_sample = up_sample
        self.attn = attn
        kw = dict(rngs=rngs, dtype=dtype)
        self.resnets = nnx.List([
            ResnetBlock(in_channels if i == 0 else out_channels, out_channels,
                        t_emb_dim, norm_channels, **kw)
            for i in range(num_layers)
        ])
        if attn:
            self.attentions = nnx.List([
                SpatialSelfAttention(out_channels, num_heads, norm_channels, **kw)
                for _ in range(num_layers)
            ])
        if up_sample:
            self.up_sample_conv = _Upsampler(in_channels, **kw)

    def __call__(self, x, out_down=None, t_emb=None):
        if self.up_sample:
            x = self.up_sample_conv(x)
        if out_down is not None:
            x = jnp.concatenate([x, out_down], axis=-1)
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i](out, t_emb)
            if self.attn:
                out = out + self.attentions[i](out)
        return out


class UpBlockUnet(nnx.Module):
    def __init__(self, in_channels, out_channels, t_emb_dim, up_sample,
                 num_heads, num_layers, norm_channels, cross_attn=False,
                 context_dim=None, *, rngs: nnx.Rngs, dtype=None):
        self.num_layers = num_layers
        self.up_sample = up_sample
        self.cross_attn = cross_attn
        kw = dict(rngs=rngs, dtype=dtype)
        self.resnets = nnx.List([
            ResnetBlock(in_channels if i == 0 else out_channels, out_channels,
                        t_emb_dim, norm_channels, **kw)
            for i in range(num_layers)
        ])
        self.attentions = nnx.List([
            SpatialSelfAttention(out_channels, num_heads, norm_channels, **kw)
            for _ in range(num_layers)
        ])
        if cross_attn:
            assert context_dim is not None, "Context Dimension must be passed for cross attention"
            self.cross_attentions = nnx.List([
                SpatialCrossAttention(out_channels, num_heads, norm_channels,
                                      context_dim, **kw)
                for _ in range(num_layers)
            ])
        if up_sample:
            # upsample acts on the pre-concat half (reference: blocks.py:457-459)
            self.up_sample_conv = _Upsampler(in_channels // 2, **kw)

    def __call__(self, x, out_down=None, t_emb=None, context=None):
        if self.up_sample:
            x = self.up_sample_conv(x)
        if out_down is not None:
            x = jnp.concatenate([x, out_down], axis=-1)
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i](out, t_emb)
            out = out + self.attentions[i](out)
            if self.cross_attn:
                assert context is not None, "context cannot be None if cross attention layers are used"
                out = out + self.cross_attentions[i](out, context)
        return out
