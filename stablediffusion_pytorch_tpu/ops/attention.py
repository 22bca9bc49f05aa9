"""Scaled-dot-product attention dispatcher.

All attention in the framework (UNet spatial self/cross-attention, DiT
self-attention, text cross-attention) funnels through this one function,
which picks between the Pallas fused-VMEM kernel (TPU) and a plain XLA
einsum path (CPU tests / odd shapes). The reference instead had three
separate O(N^2) implementations (models/attention.py:33-78,
models/multihead_attention.py:58-64, nn.MultiheadAttention in
models/blocks.py).

Layout: q (B, NQ, H, D), k/v (B, NK, H, D) -> (B, NQ, H, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention(q, k, v, static):
    """Pallas forward with an XLA-derived backward. The forward runs the
    fused-VMEM kernel; the backward differentiates the mathematically
    identical XLA formula (cheap at these sequence lengths, and exact)."""
    b, h, scale, nq, nk, d, block_q = static
    from stablediffusion_pytorch_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )

    return flash_attention(q, k, v, scale=scale, kv_len=nk, block_q=block_q)


def _folded_xla_attention(q, k, v, static):
    """XLA attention on the folded/padded (B*H, Npad, Dpad) layout, masking
    padded keys — numerically identical to the Pallas kernel."""
    b, h, scale, nq, nk, d, block_q = static
    out = _xla_attention(
        q[:, :nq, None, :], k[:, :nk, None, :], v[:, :nk, None, :], scale
    )[:, :, 0, :]
    return jnp.pad(out, ((0, 0), (0, q.shape[1] - nq), (0, 0)))


def _pallas_attention_fwd(q, k, v, static):
    return _pallas_attention(q, k, v, static), (q, k, v)


def _pallas_attention_bwd(static, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _folded_xla_attention(q_, k_, v_, static), q, k, v)
    return vjp(g)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _use_pallas(nq: int, nk: int, d: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # The kernel pads head_dim to 128 lanes, so tiny head dims (UNet 16-48,
    # DiT 32) waste most of the MXU — measured on v5e, XLA wins ~2x for the
    # DiT shapes (256 tokens, d=32). Use the Pallas kernel only where the
    # padding waste is bounded and sequences are long enough to amortize.
    return d >= 64 and nq >= 512 and nk >= 1 and d <= 256


def scaled_dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None
) -> jax.Array:
    """Multi-head attention core; no masking (the framework's sequences are
    dense — masks in the reference enter as channels, not attention masks).
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    if not _use_pallas(nq, nk, d):
        return _xla_attention(q, k, v, scale)

    block_q = min(256, _round_up(nq, 128))
    d_pad = _round_up(d, 128)
    nq_pad = _round_up(nq, block_q)
    nk_pad = _round_up(nk, 128)

    def fold(x, n_pad, n):
        # (B, N, H, D) -> (B*H, Npad, Dpad)
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qf = fold(q, nq_pad, nq)
    kf = fold(k, nk_pad, nk)
    vf = fold(v, nk_pad, nk)

    static = (b, h, scale, nq, nk, d, block_q)
    of = _pallas_attention(qf, kf, vf, static)
    out = of[:, :nq, :d].reshape(b, h, nq, d)
    return jnp.swapaxes(out, 1, 2)
