"""PatchGAN discriminator for the stage-1 adversarial loss.

Re-implements reference models/discriminator.py:5-41: conv stack
64 -> 128 -> 256 -> 1 with 4x4 kernels, stride 2 (stride 1 on the last two
in the reference's padding scheme), BatchNorm + LeakyReLU(0.2), emitting a
grid of real/fake logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class _Identity(nnx.Module):
    def __call__(self, x):
        return x


class _TrainBatchNorm(nnx.Module):
    """Stateless train-mode batch norm: normalizes by the current batch's
    (N, H, W) statistics with learned scale/bias. The reference discriminator
    only ever runs in training mode (tools/train_vqvae.py never calls
    .eval() on it), so running averages are dead state — omitting them keeps
    the GAN train step pure."""

    def __init__(self, num_features: int, eps: float = 1e-5, *,
                 rngs: nnx.Rngs, dtype=None):
        self.eps = eps
        self.scale = nnx.Param(jnp.ones((num_features,)))
        self.bias = nnx.Param(jnp.zeros((num_features,)))

    def __call__(self, x):
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * self.scale[...] + self.bias[...]


class Discriminator(nnx.Module):
    def __init__(self, im_channels: int = 3,
                 conv_channels=(64, 128, 256),
                 kernels=(4, 4, 4, 4),
                 strides=(2, 2, 2, 1),
                 paddings=(1, 1, 1, 1), *, rngs: nnx.Rngs, dtype=None):
        layers_dim = [im_channels] + list(conv_channels) + [1]
        self.num_layers = len(layers_dim) - 1
        kw = dict(dtype=dtype, rngs=rngs)
        self.convs = nnx.List([
            nnx.Conv(layers_dim[i], layers_dim[i + 1],
                     kernel_size=(kernels[i], kernels[i]),
                     strides=(strides[i], strides[i]),
                     padding=[(paddings[i], paddings[i])] * 2,
                     use_bias=(i == 0), **kw)
            for i in range(self.num_layers)
        ])
        # BatchNorm on all but first and last (discriminator.py:26-31)
        self.norms = nnx.List([
            _TrainBatchNorm(layers_dim[i + 1], rngs=rngs)
            if 0 < i < self.num_layers - 1 else _Identity()
            for i in range(self.num_layers)
        ])

    def __call__(self, x: jax.Array) -> jax.Array:
        out = x
        for i in range(self.num_layers):
            out = self.convs[i](out)
            out = self.norms[i](out)
            if i != self.num_layers - 1:
                out = nnx.leaky_relu(out, negative_slope=0.2)
        return out
