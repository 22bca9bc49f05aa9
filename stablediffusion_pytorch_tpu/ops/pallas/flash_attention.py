"""Pallas TPU attention kernel for the diffusion workloads.

The reference materializes O(N^2) attention through torch.matmul + softmax
(reference: models/attention.py:59-67, models/multihead_attention.py:58-64,
models/blocks.py:122-142). Sequence lengths in this framework are short —
UNet self-attention tops out at 32*32 = 1024 latent tokens, DiT at 256 patch
tokens, cross-attention K/V at 77 text tokens (SURVEY.md §5 long-context) —
so the TPU-first design is a *fused in-VMEM* attention kernel: for each
(batch*head, q-block) grid cell we keep the whole K/V in VMEM, compute
scores on the MXU, take a masked row softmax on the VPU, and multiply by V,
never touching HBM for the N^2 score matrix. At these lengths this does the
same FLOPs as streaming flash attention with strictly less bookkeeping; the
kernel is still blockwise over Q so longer latents scale (and the XLA
fallback covers anything the kernel doesn't).

Layout contract: q, k, v are (BH, N, D) with D padded to a multiple of 128
lanes by the caller (ops/attention.py); `kv_len` masks padded keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (bh, q-block) cell: scores -> masked softmax -> weighted values."""
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (NK, D)
    v = v_ref[0].astype(jnp.float32)  # (NK, D)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, NK)

    nk = k.shape[0]
    if kv_len < nk:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < kv_len, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (BQ, D)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_len", "block_q"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    kv_len: int,
    block_q: int = 256,
) -> jax.Array:
    """Fused attention: q (BH, NQ, D), k/v (BH, NK, D) -> (BH, NQ, D).

    NQ must be divisible by block_q (caller pads), D a multiple of 128
    (caller pads), NK padded with `kv_len` real keys.
    """
    bh, nq, d = q.shape
    nk = k.shape[1]
    assert nq % block_q == 0, (nq, block_q)
    grid = (bh, nq // block_q)

    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nq * nk * d * 2,
            bytes_accessed=4 * bh * (nq * d * 2 + 2 * nk * d),
            transcendentals=bh * nq * nk,
        ),
    )(q, k, v)
