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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _head_packed(q, k, v, scale, nk_true):
    """Head-packed fused-VMEM kernel (small head dims) with an XLA-derived
    backward — scores/probs never touch HBM on the forward, and the
    backward differentiates the mathematically identical einsum formula.
    Takes/returns the model's token-major (B, N, H, D); transposes to the
    kernel's feature-major (B, H, D, N) ride XLA (cheap vs the probs
    round-trip the kernel eliminates — see ops/pallas/head_attention.py)."""
    from stablediffusion_pytorch_tpu.ops.pallas.head_attention import (
        head_packed_attention,
    )

    fm = lambda x: jnp.transpose(x, (0, 2, 3, 1))      # (B,N,H,D)->(B,H,D,N)
    out = head_packed_attention(fm(q), fm(k), fm(v), scale=scale,
                                nk_true=nk_true)
    return jnp.transpose(out, (0, 3, 1, 2))            # back to (B,N,H,D)


def _head_packed_fwd(q, k, v, scale, nk_true):
    return _head_packed(q, k, v, scale, nk_true), (q, k, v)


def _head_packed_bwd(scale, nk_true, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_head_packed.defvjp(_head_packed_fwd, _head_packed_bwd)


def _xla_attention_fm(q, k, v, scale):
    """XLA oracle on the feature-major (B, H, D, N) layout."""
    scores = jnp.einsum("bhdq,bhdk->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhdk->bhdq", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def feature_major_attention(q, k, v, scale):
    """Attention natively on feature-major (B, heads, D, N) — the layout the
    head-packed Pallas kernel wants, so callers that can PRODUCE q/k/v
    transposed (e.g. DiT's fused-QKV projection, where the transpose rides
    the GEMM) pay zero layout copies. Forward keeps scores/probs in VMEM;
    backward differentiates the identical XLA formula (exact)."""
    from stablediffusion_pytorch_tpu.ops.pallas.head_attention import (
        head_packed_attention,
    )

    return head_packed_attention(q, k, v, scale=scale, nk_true=k.shape[3])


def _fm_fwd(q, k, v, scale):
    return feature_major_attention(q, k, v, scale), (q, k, v)


def _fm_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention_fm(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


feature_major_attention.defvjp(_fm_fwd, _fm_bwd)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _use_head_packed(nq: int, nk: int, d: int) -> bool:
    # Small head dims (DiT d=32, UNet d=16-48) at short-to-medium sequence
    # lengths: the head-packed kernel keeps the (N, N) scores in VMEM
    # (VERDICT W1). At THIS call boundary the inputs are token-major, so
    # using it costs 4 explicit (B,N,H,D)<->(B,H,D,N) copies — measured
    # 330 vs 350 fwd/s on DiT-12L, a net LOSS; hence default-off here.
    # The winning integration produces q/k/v feature-major straight off the
    # projection GEMM (models/dit.Attention -> feature_major_attention).
    import os

    if os.environ.get("SDTPU_HEAD_ATTN_TOKEN_MAJOR", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    return d < 64 and nq <= 1024 and nk <= 1024


def _use_pallas(nq: int, nk: int, d: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # The flash kernel pads head_dim to 128 lanes, so it only pays where
    # the head dim fills them and sequences are long enough to amortize;
    # shorter/narrower shapes route to the head-packed kernel above.
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

    if _use_head_packed(nq, nk, d):
        return _head_packed(q, k, v, scale, nk)

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
