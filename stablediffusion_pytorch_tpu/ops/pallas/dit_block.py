"""Fused adaLN-modulated MLP kernel for DiT blocks.

Targets the measured non-GEMM overhead of the DiT transformer core
(PERF.md: 1.2ms of a 2.8ms step is LayerNorm/modulation/residual HBM
round-trips). This kernel fuses, per batch sample:

    out = x + gate * W2 @ relu(W1 @ (LN(x) * (1 + scale) + shift))

into one VMEM-resident pass — the affine-free LayerNorm reduction, the
per-sample adaLN modulation (reference: models/transformer_layer.py:103-105),
both MLP matmuls, the ReLU, the output gate, and the residual add, with
activations loaded from HBM exactly once.

Grid: one program per batch sample; weights use constant index maps so
Mosaic keeps them VMEM-resident across the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


def _kernel(x_ref, shift_ref, scale_ref, gate_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, o_ref, *, h_true: int, eps: float):
    x = x_ref[0].astype(jnp.float32)              # (N, Hpad), pads zero
    # affine-free LN over the TRUE hidden width (pads are zero, so sums are
    # unaffected; divide by h_true, not Hpad)
    mean = jnp.sum(x, axis=-1, keepdims=True) / h_true
    xc = x - mean
    # zero the padded lanes so variance and downstream matmuls stay exact
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xc = jnp.where(lane < h_true, xc, 0.0)
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) / h_true
    xn = xc * jax.lax.rsqrt(var + eps)

    mod = xn * (1.0 + scale_ref[0]) + shift_ref[0]
    mod = jnp.where(lane < h_true, mod, 0.0)

    h = jnp.dot(mod, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...], 0.0)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    o_ref[0] = (x + gate_ref[0] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_adaln_mlp(x, shift, scale, gate, w1, b1, w2, b2,
                    interpret: bool = False):
    """x (B, N, H); shift/scale/gate (B, H); w1 (H, F), w2 (F, H).

    Returns x + gate * MLP(LN(x) * (1+scale) + shift), fp32-accurate.
    """
    b, n, h = x.shape
    f = w1.shape[1]
    hp, fp, np_ = _round_up(h, 128), _round_up(f, 128), _round_up(n, 8)

    pad2 = lambda a, r, c: jnp.pad(a, ((0, r - a.shape[0]),
                                       (0, c - a.shape[1])))
    xp = jnp.pad(x, ((0, 0), (0, np_ - n), (0, hp - h)))
    sh = jnp.pad(shift, ((0, 0), (0, hp - h)))[:, None]   # (B, 1, Hpad)
    sc = jnp.pad(scale, ((0, 0), (0, hp - h)))[:, None]
    ga = jnp.pad(gate, ((0, 0), (0, hp - h)))[:, None]
    w1p = pad2(w1, hp, fp)
    w2p = pad2(w2, fp, hp)
    b1p = jnp.pad(b1, (0, fp - f)).reshape(1, fp)
    b2p = jnp.pad(b2, (0, hp - h)).reshape(1, hp)

    out = pl.pallas_call(
        functools.partial(_kernel, h_true=h, eps=1e-6),
        out_shape=jax.ShapeDtypeStruct((b, np_, hp), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, hp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_ * (hp * fp + fp * hp),
            bytes_accessed=4 * b * np_ * hp * 2 + 4 * (hp * fp * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, sh, sc, ga, w1p, b1p, w2p, b2p)
    return out[:, :n, :h]


def adaln_mlp_reference(x, shift, scale, gate, w1, b1, w2, b2, eps=1e-6):
    """jnp oracle (matches models/dit.TransformerLayer's MLP half)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    mod = xn * (1.0 + scale[:, None]) + shift[:, None]
    h = jnp.maximum(mod @ w1 + b1, 0.0)
    y = h @ w2 + b2
    return (xf + gate[:, None] * y).astype(x.dtype)
