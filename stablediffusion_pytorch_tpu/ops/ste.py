"""Straight-through estimators (STE) and gradient-rescale helpers.

Pure-JAX re-implementations of the reference's STE library
(reference: cim_layers/quant_noise_utils.py:51-89). Each function computes a
non-differentiable value in the forward pass while routing a chosen surrogate
gradient through in the backward pass via the identity

    y_ste = x_surrogate + stop_gradient(y_forward - x_surrogate)

which is the JAX spelling of torch's ``(y - y_grad).detach() + y_grad``.

Everything here is shape-polymorphic, jit-safe, and dtype-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ste(y_forward: jax.Array, x_surrogate: jax.Array) -> jax.Array:
    """Forward value ``y_forward``, gradient of ``x_surrogate``."""
    return x_surrogate + jax.lax.stop_gradient(y_forward - x_surrogate)


def round_pass(x: jax.Array) -> jax.Array:
    """Round-to-nearest with identity gradient.

    Reference: quant_noise_utils.py:66-69. Uses round-half-to-even, matching
    torch.round / jnp.round.
    """
    return ste(jnp.round(x), x)


def round_pass_exp(x: jax.Array) -> jax.Array:
    """Shifted round (log2(1.5)-0.5 offset) with identity gradient.

    Reference: quant_noise_utils.py:71-75.
    """
    shift_factor = jnp.log2(jnp.asarray(1.5, x.dtype)) - 0.5
    return ste(jnp.round(x - shift_factor), x)


def floor_pass(x: jax.Array) -> jax.Array:
    """Truncate toward zero (floor of |x| times sign) with identity gradient.

    Reference: quant_noise_utils.py:78-83 (floor(abs)*sign == trunc).
    """
    return ste(jnp.trunc(x), x)


def floor_no_pass(x: jax.Array) -> jax.Array:
    """Truncate toward zero with the natural (zero a.e.) gradient.

    Reference: quant_noise_utils.py:86-88 — floor for x>=0, ceil for x<0,
    i.e. truncation; no straight-through gradient.
    """
    return jnp.trunc(x)


def clamp_pass(x: jax.Array, min: float, max: float) -> jax.Array:  # noqa: A002
    """Clamp with identity gradient everywhere (unlike jnp.clip, which zeroes
    the gradient outside the interval).

    Reference: quant_noise_utils.py:61-64.
    """
    return ste(jnp.clip(x, min, max), x)


def grad_scale(x: jax.Array, scale) -> jax.Array:
    """Identity forward, gradient multiplied by ``scale``.

    Reference: quant_noise_utils.py:51-54. Used by LSQ to scale the step-size
    gradient by 1/sqrt(Q_p * numel).
    """
    y_grad = x * scale
    return y_grad + jax.lax.stop_gradient(x - y_grad)


def grad_scale_factor(data_range: float, x: jax.Array) -> jax.Array:
    """LSQ gradient-scale factor ``1/sqrt(data_range * numel(x))``.

    Reference: quant_noise_utils.py:57-58.
    """
    return 1.0 / jnp.sqrt(jnp.asarray(data_range * x.size, jnp.float32))
