"""Quantization primitives: absmax quant, LSQ (Learned Step Size Quantization),
and range-relative Gaussian weight noise.

Pure-function re-implementations of the reference's quantizers
(reference: cim_layers/quant_noise_utils.py:8-179 and
cim_layers/layers_utils_lsq.py:31-83), with explicit PRNG keys instead of
global torch RNG state. All functions are jit-safe; ``data_bit`` must be a
static Python int (it selects compiled constants, matching the reference's
per-cycle recompile model).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stablediffusion_pytorch_tpu.ops.ste import (
    clamp_pass,
    grad_scale,
    grad_scale_factor,
    round_pass,
    floor_pass,
)


def data_quant(
    data_float: jax.Array, data_bit: int, isint: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric absmax quantization (no STE — forward-only numerics).

    Reference: quant_noise_utils.py:8-28. Returns ``(quantized, quant_scale)``
    where ``quant_scale = half_level / absmax`` if ``isint`` else 1.0.
    ``data_bit == 0`` disables quantization.
    """
    if data_bit == 0:
        return data_float, jnp.asarray(1.0, data_float.dtype)
    assert data_bit >= 2

    half_level = 2 ** (data_bit - 1) - 1
    data_range = jnp.max(jnp.abs(data_float))
    safe_range = jnp.where(data_range == 0, 1.0, data_range)

    quantized = jnp.round(data_float / safe_range * half_level)
    scale = half_level / safe_range
    if not isint:
        quantized = quantized / half_level * safe_range
        scale = jnp.asarray(1.0, data_float.dtype)
    # zero-range passthrough (reference returns the input untouched)
    quantized = jnp.where(data_range == 0, data_float, quantized)
    scale = jnp.where(data_range == 0, jnp.asarray(1.0, scale.dtype), scale)
    return quantized, scale


def data_quant_pass(
    data_float: jax.Array, data_bit: int, isint: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Absmax quantization with straight-through rounding.

    Reference: quant_noise_utils.py:31-48.
    """
    if data_bit == 0:
        return data_float, jnp.asarray(1.0, data_float.dtype)
    assert data_bit >= 2

    half_level = 2 ** (data_bit - 1) - 1
    data_range = jax.lax.stop_gradient(jnp.max(jnp.abs(data_float)))
    quant_scale = half_level / data_range
    quantized = round_pass(data_float * quant_scale)
    if not isint:
        quantized = quantized / half_level * data_range
        quant_scale = jnp.asarray(1.0, data_float.dtype)
    return quantized, quant_scale


def _lsq_core(
    data_float: jax.Array,
    data_bit: int,
    step_size: jax.Array,
    isint: bool,
    rounder,
    lsq_grad: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Shared LSQ body: scale -> clamp -> STE-round -> rescale.

    Reference: quant_noise_utils.py:101-179 (data_quant_lsq / weight_quant_lsq
    / weight_quant_round / weight_quant_floor differ only in the rounding op
    and whether the step-size gradient is LSQ-rescaled).
    """
    assert data_bit > 0
    quant_scale = jax.lax.stop_gradient(1.0 / step_size)
    data_range = 2 ** (data_bit - 1) - 1
    if lsq_grad:
        step_size = grad_scale(step_size, grad_scale_factor(data_range, data_float))
    data_scaled = data_float / step_size
    data_clamped = jnp.clip(data_scaled, -data_range, data_range)
    data_quantized = rounder(data_clamped)
    if not isint:
        data_quantized = data_quantized * step_size
        quant_scale = jnp.asarray(1.0, data_float.dtype)
    else:
        # keep the step-size gradient alive while returning integer levels;
        # the (s / stop_grad(s)) grouping is exactly 1.0 in IEEE float, so
        # the forward stays bit-exact integer (a left-associated q*s/s
        # yields 54.9999... which breaks the downstream trunc in bit_split)
        data_quantized = data_quantized * (
            step_size / jax.lax.stop_gradient(step_size))
    return data_quantized, quant_scale


def data_quant_lsq(data_float, data_bit, step_size, isint=False):
    """LSQ activation quantizer. Reference: quant_noise_utils.py:101-120."""
    return _lsq_core(data_float, data_bit, step_size, isint, round_pass, True)


def weight_quant_lsq(data_float, data_bit, step_size, isint=False):
    """LSQ weight quantizer. Reference: quant_noise_utils.py:160-179."""
    return _lsq_core(data_float, data_bit, step_size, isint, round_pass, True)


def weight_quant_round(data_float, data_bit, step_size, isint=False):
    """Fixed-step round quantizer (no LSQ grad). Reference: :140-156."""
    return _lsq_core(data_float, data_bit, step_size, isint, round_pass, False)


def weight_quant_floor(data_float, data_bit, step_size, isint=False):
    """Fixed-step floor quantizer (no LSQ grad). Reference: :122-138."""
    return _lsq_core(data_float, data_bit, step_size, isint, floor_pass, False)


# -- external noise-key threading (sampler-time i.i.d. weight noise) --------
#
# Flax forbids advancing a module's stateful RNG stream inside a jitted scan
# whose module is closure-captured (the samplers), so without help the
# quantized layers fall back to a key derived from the activations — noise
# that is deterministic per (seed, input) and data-correlated, where the
# reference resamples independently per call (quant_noise_utils.py:92-98).
# The samplers wrap each denoiser call in ``external_noise_key(k_step)``
# with a fresh per-step split; layers pick it up and fold in their per-layer
# seed, giving noise that is i.i.d. across denoise steps, independent of the
# data, decorrelated across layers, and reproducible from the sampler key.
#
# The key is read at TRACE time: it must be set around the code that
# traces the model call (the samplers do this inside their scan bodies). A
# model jitted separately and cache-hit from a trace taken outside the
# context will not see the key — keep the context around the outermost
# traced call, as the shipped samplers do. The storage is thread-local so
# two threads tracing concurrently (an eval thread sampling while a
# serving worker ticks, parallel QAT eval jobs in one process) cannot leak
# one trace's key into the other or restore the wrong previous value
# (advisor r4); the trace-time caveat above applies per thread.
_EXTERNAL_NOISE_TLS = threading.local()


@contextlib.contextmanager
def external_noise_key(key: Optional[jax.Array]):
    """Set the trace-time external noise key for quantized-layer weight noise."""
    prev = getattr(_EXTERNAL_NOISE_TLS, "key", None)
    _EXTERNAL_NOISE_TLS.key = key
    try:
        yield
    finally:
        _EXTERNAL_NOISE_TLS.key = prev


def get_external_noise_key() -> Optional[jax.Array]:
    """The key set by :func:`external_noise_key`, or None outside the context."""
    return getattr(_EXTERNAL_NOISE_TLS, "key", None)


def add_noise(weight: jax.Array, key: jax.Array, n_scale=0.074) -> jax.Array:
    """Range-relative Gaussian noise: ``w + (max-min)*n_scale*N(0,1)``.

    Reference: quant_noise_utils.py:92-98. ``n_scale`` may be a static float
    (0 disables noise and the PRNG draw) or a traced scalar — the progressive
    QAT schedule anneals it every cycle as a runtime operand so the train
    step never retraces (the reference pays a per-cycle recompile here).
    """
    if isinstance(n_scale, (int, float)) and n_scale == 0:
        return weight
    w_range = jnp.max(weight) - jnp.min(weight)
    w_noise = w_range * n_scale * jax.random.normal(key, weight.shape, weight.dtype)
    return weight + w_noise


def init_step_size(x: jax.Array, data_bit: int) -> jax.Array:
    """Data-driven LSQ step-size init: ``absmax / half_level`` of the first
    batch. Reference: layers_utils_lsq.py:31-34 (1 / data_quant isint scale).

    Run OUTSIDE jit as an explicit init pass (the reference lazily initializes
    on the first forward; JAX needs it hoisted out of the traced step).
    """
    _, scale = data_quant(x, data_bit=data_bit, isint=True)
    return jnp.asarray(1.0 / scale, jnp.float32)


def update_step_size(step_size: jax.Array, bit_old: int, bit_new: int) -> jax.Array:
    """Rescale a learned step size when the bit width changes mid-schedule:
    ``s /= 2**(bit_new - bit_old)``. Reference: layers_utils_lsq.py:11-28.
    """
    if bit_new == bit_old:
        return step_size
    return step_size / (2.0 ** (bit_new - bit_old))
