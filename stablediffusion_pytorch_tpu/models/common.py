"""Shared model primitives: sinusoidal time embedding, multi-head attention
with CIM-friendly separate q/k/v/out projections, and the resnet block.

All spatial tensors are NHWC (TPU-native layout; XLA convs want channels
last). The reference is NCHW torch (models/blocks.py) — layout is the one
deliberate departure, everything else matches structurally.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.ops.attention import scaled_dot_product_attention


def get_time_embedding(time_steps: jax.Array, temb_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding, factor = 10000^(i/(d/2)).

    Reference: models/blocks.py:5-24 (same formula in transformer.py:18-40).
    """
    assert temb_dim % 2 == 0, "time embedding dimension must be divisible by 2"
    factor = 10000 ** (
        jnp.arange(0, temb_dim // 2, dtype=jnp.float32) / (temb_dim // 2)
    )
    t_emb = time_steps.astype(jnp.float32)[:, None] / factor[None, :]
    return jnp.concatenate([jnp.sin(t_emb), jnp.cos(t_emb)], axis=-1)


class MultiheadAttention(nnx.Module):
    """Multi-head attention with separate q/k/v/out nnx.Linear projections.

    Mirrors the reference's CustomMultiheadAttention
    (models/multihead_attention.py:10-126), whose whole point is that the
    projections are plain Linears the CIM converter can find and quantize —
    the same property the NNX surgery harness (cim/progressive.py) relies on.
    Used for UNet spatial self/cross-attention and DiT cross-attention.
    """

    def __init__(self, embed_dim: int, num_heads: int, *, rngs: nnx.Rngs,
                 dtype=None):
        assert embed_dim % num_heads == 0
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        kw = dict(dtype=dtype, rngs=rngs)
        self.q_proj = nnx.Linear(embed_dim, embed_dim, **kw)
        self.k_proj = nnx.Linear(embed_dim, embed_dim, **kw)
        self.v_proj = nnx.Linear(embed_dim, embed_dim, **kw)
        self.out_proj = nnx.Linear(embed_dim, embed_dim, **kw)

    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array) -> jax.Array:
        b, nq, _ = query.shape
        nk = key.shape[1]
        h, d = self.num_heads, self.head_dim
        q = self.q_proj(query).reshape(b, nq, h, d)
        k = self.k_proj(key).reshape(b, nk, h, d)
        v = self.v_proj(value).reshape(b, nk, h, d)
        out = scaled_dot_product_attention(q, k, v)
        return self.out_proj(out.reshape(b, nq, h * d))


class ResnetBlock(nnx.Module):
    """GN -> SiLU -> 3x3 conv (+ t-emb add) -> GN -> SiLU -> 3x3 conv,
    with a 1x1 residual conv on the input.

    Reference: the per-layer resnet body repeated inside
    models/blocks.py DownBlock:111-120 / MidBlock:228-234 / UpBlock:352-359.
    """

    def __init__(self, in_channels: int, out_channels: int,
                 t_emb_dim: Optional[int], norm_channels: int, *,
                 rngs: nnx.Rngs, dtype=None):
        self.t_emb_dim = t_emb_dim
        kw = dict(dtype=dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(in_channels, num_groups=norm_channels, epsilon=1e-5, **kw)
        self.conv1 = nnx.Conv(in_channels, out_channels, kernel_size=(3, 3),
                              padding="SAME", **kw)
        if t_emb_dim is not None:
            self.t_emb_proj = nnx.Linear(t_emb_dim, out_channels, **kw)
        self.norm2 = nnx.GroupNorm(out_channels, num_groups=norm_channels, epsilon=1e-5, **kw)
        self.conv2 = nnx.Conv(out_channels, out_channels, kernel_size=(3, 3),
                              padding="SAME", **kw)
        self.residual_conv = nnx.Conv(in_channels, out_channels,
                                      kernel_size=(1, 1), **kw)

    def __call__(self, x: jax.Array, t_emb: Optional[jax.Array] = None) -> jax.Array:
        h = self.conv1(nnx.silu(self.norm1(x)))
        if self.t_emb_dim is not None:
            # t_emb path is SiLU -> Linear, added per-channel (blocks.py:56-63)
            h = h + self.t_emb_proj(nnx.silu(t_emb))[:, None, None, :]
        h = self.conv2(nnx.silu(self.norm2(h)))
        return h + self.residual_conv(x)


class SpatialSelfAttention(nnx.Module):
    """GroupNorm + MHA over flattened H*W tokens, residual added by caller.

    Reference: the attention sub-block in models/blocks.py:122-130 (GN over
    channels of the flattened (B, C, H*W) map, then nn.MultiheadAttention).
    """

    def __init__(self, channels: int, num_heads: int, norm_channels: int, *,
                 rngs: nnx.Rngs, dtype=None):
        self.norm = nnx.GroupNorm(channels, num_groups=norm_channels, epsilon=1e-5,
                                  dtype=dtype, rngs=rngs)
        self.attn = MultiheadAttention(channels, num_heads, rngs=rngs, dtype=dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        tokens = self.norm(x).reshape(b, hh * ww, c)
        out = self.attn(tokens, tokens, tokens)
        return out.reshape(b, hh, ww, c)


class SpatialCrossAttention(nnx.Module):
    """GroupNorm + context projection + MHA against text context tokens.

    Reference: the cross-attention sub-block in models/blocks.py:132-142
    (context_proj Linear maps context_dim -> channels, K/V = projected
    context).
    """

    def __init__(self, channels: int, num_heads: int, norm_channels: int,
                 context_dim: int, *, rngs: nnx.Rngs, dtype=None):
        self.context_dim = context_dim
        self.norm = nnx.GroupNorm(channels, num_groups=norm_channels, epsilon=1e-5,
                                  dtype=dtype, rngs=rngs)
        self.context_proj = nnx.Linear(context_dim, channels, dtype=dtype, rngs=rngs)
        self.attn = MultiheadAttention(channels, num_heads, rngs=rngs, dtype=dtype)

    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        assert context.shape[0] == b and context.shape[-1] == self.context_dim
        tokens = self.norm(x).reshape(b, hh * ww, c)
        ctx = self.context_proj(context)
        out = self.attn(tokens, ctx, ctx)
        return out.reshape(b, hh, ww, c)
