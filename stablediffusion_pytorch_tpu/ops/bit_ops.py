"""DAC bit-slice split / recombine for CIM array simulation.

Vectorized re-implementation of the reference's ``bit_split_tensor`` /
``bit_concat_tensor`` (reference: cim_layers/layers_utils_adda.py:144-185),
which the reference also ships as the (uncommitted) ``bitsplit_ext`` C++/CUDA
extension (reference: cim_layers/bitsplit/setup.py:8-23). The committed Python
is the numerics oracle; this module is the jnp implementation. A fused Pallas
TPU kernel for split+MVM+concat lives in ops/pallas/cim_mvm.py and a C++
CPU custom-call fallback in ops/native/.

Semantics (int-quantized input ``x_q`` with ``x_bit`` signed levels, slices of
``slice_bit`` DAC bits; bit_len = ceil((x_bit-1)/slice_bit) slices stacked on
a new leading axis folded into dim 0):

    slice_i  = trunc(x_q / 2^(i*s)) - trunc(x_q / 2^min((i+1)s, x_bit-1)) * 2^s
    grad_i   = d(trunc_STE(x_q / 2^(i*s))) / bit_len          (per slice)
    concat   = sum_i slice_i * 2^(i*s)                         (exact inverse)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from stablediffusion_pytorch_tpu.ops.ste import floor_pass, floor_no_pass, ste


def bit_len_for(x_bit: int, slice_bit: int) -> int:
    """Number of DAC slices: ceil((x_bit-1)/slice_bit).

    Reference: layers_utils_adda.py:165 (sign bit excluded from slicing).
    """
    assert slice_bit >= 1
    return int(math.ceil((x_bit - 1) / slice_bit))


def bit_split(x_q: jax.Array, x_bit: int, slice_bit: int) -> jax.Array:
    """Split int levels into DAC-width slices stacked on dim 0.

    Output shape ``(bit_len * B, ...)`` matching the reference layout
    (reference: layers_utils_adda.py:161-185). The straight-through gradient
    of each slice is ``shift_data / bit_len`` (sums back to ~identity).
    """
    bit_len = bit_len_for(x_bit, slice_bit)
    nd = x_q.ndim
    idx = jnp.arange(bit_len, dtype=x_q.dtype)
    lsb = idx * slice_bit
    msb = jnp.minimum(lsb + slice_bit, x_bit - 1)
    bshape = (bit_len,) + (1,) * nd
    scale_lsb = (2.0 ** lsb).reshape(bshape)
    scale_msb = (2.0 ** msb).reshape(bshape)

    xq_exp = x_q[None]
    shift_data = floor_pass(xq_exp / scale_lsb)
    residue_data = floor_no_pass(xq_exp / scale_msb) * (2 ** slice_bit)
    bit_data = shift_data - residue_data
    bit_data_pass = ste(bit_data, shift_data / bit_len)
    return bit_data_pass.reshape((bit_len * x_q.shape[0],) + x_q.shape[1:])


def bit_concat(bitwise_data: jax.Array, data_bit: int, slice_bit: int) -> jax.Array:
    """Recombine DAC slices: weighted sum by ``2^(i*slice_bit)``.

    Exact inverse of :func:`bit_split` in the integer domain
    (reference: layers_utils_adda.py:144-159).
    """
    bit_len = bit_len_for(data_bit, slice_bit)
    s0 = bitwise_data.shape[0]
    assert s0 % bit_len == 0, "leading dim must be divisible by bit_len"
    y = bitwise_data.reshape((bit_len, s0 // bit_len) + bitwise_data.shape[1:])
    powv = (2.0 ** (slice_bit * jnp.arange(bit_len, dtype=bitwise_data.dtype)))
    powv = powv.reshape((bit_len,) + (1,) * (y.ndim - 1))
    return jnp.sum(y * powv, axis=0)
