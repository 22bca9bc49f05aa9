"""DDPM linear noise schedule as a frozen coefficient table + pure functions.

Re-implements the reference ``LinearNoiseScheduler``
(reference: scheduler/linear_noise_scheduler.py:8-78) in functional JAX:
the schedule is a NamedTuple of precomputed jnp coefficient arrays (a pytree,
so it jit-traces as constants), and ``add_noise`` / ``sample_prev_timestep``
are pure functions taking explicit PRNG keys.

Two schedule constructions exist in the reference:
  * the "compvis-style" linear-in-sqrt(beta) schedule used by the
    LinearNoiseScheduler (betas = linspace(sqrt(b0), sqrt(b1), T)^2,
    reference: linear_noise_scheduler.py:17-20) — used by trainers/samplers;
  * a plain linear-in-beta schedule used by DDPMSampler/DDIMSampler
    (reference: linear_noise_scheduler.py:101, 181).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LinearNoiseSchedule(NamedTuple):
    """Precomputed DDPM coefficient tables, all shape (T,), float32."""

    num_timesteps: int
    betas: jax.Array
    alphas: jax.Array
    alpha_cum_prod: jax.Array
    sqrt_alpha_cum_prod: jax.Array
    sqrt_one_minus_alpha_cum_prod: jax.Array


def _from_betas(betas: jax.Array) -> LinearNoiseSchedule:
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas, axis=0)
    return LinearNoiseSchedule(
        num_timesteps=int(betas.shape[0]),
        betas=betas,
        alphas=alphas,
        alpha_cum_prod=acp,
        sqrt_alpha_cum_prod=jnp.sqrt(acp),
        sqrt_one_minus_alpha_cum_prod=jnp.sqrt(1.0 - acp),
    )


def make_compvis_linear_schedule(
    num_timesteps: int, beta_start: float, beta_end: float
) -> LinearNoiseSchedule:
    """betas = linspace(sqrt(b0), sqrt(b1), T)^2 ("mimicking compvis").

    Reference: scheduler/linear_noise_scheduler.py:17-20.
    """
    betas = (
        jnp.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=jnp.float32)
        ** 2
    )
    return _from_betas(betas)


def make_linear_schedule(
    num_timesteps: int, beta_start: float, beta_end: float
) -> LinearNoiseSchedule:
    """Plain linear-in-beta schedule (DDPMSampler/DDIMSampler construction).

    Reference: scheduler/linear_noise_scheduler.py:101, 181.
    """
    betas = jnp.linspace(beta_start, beta_end, num_timesteps, dtype=jnp.float32)
    return _from_betas(betas)


def _bcast(coeff_t: jax.Array, like: jax.Array) -> jax.Array:
    """Reshape (B,) gathered coefficients to (B, 1, 1, ...) for broadcasting."""
    return coeff_t.reshape(coeff_t.shape[0], *([1] * (like.ndim - 1)))


def add_noise(
    sched: LinearNoiseSchedule, original: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward q-sample: ``sqrt(acp_t)*x0 + sqrt(1-acp_t)*eps``.

    ``t`` is an int array of shape (B,).
    Reference: scheduler/linear_noise_scheduler.py:26-48.
    """
    sa = _bcast(sched.sqrt_alpha_cum_prod[t], original)
    so = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], original)
    return sa * original.astype(sa.dtype) + so * noise.astype(sa.dtype)


def sample_prev_timestep(
    sched: LinearNoiseSchedule,
    xt: jax.Array,
    noise_pred: jax.Array,
    t: jax.Array,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """One reverse DDPM step: returns ``(x_{t-1}, x0_prediction)``.

    x0 is predicted, clamped to [-1, 1]; the posterior mean uses the epsilon
    parameterization; sigma*z is added except at t == 0 (handled with a mask
    so the step stays jit-traceable with a scalar traced ``t``).
    Reference: scheduler/linear_noise_scheduler.py:50-78.
    """
    t = jnp.asarray(t)
    somacp = sched.sqrt_one_minus_alpha_cum_prod[t]
    acp = sched.alpha_cum_prod[t]
    beta = sched.betas[t]
    alpha = sched.alphas[t]

    x0 = (xt - somacp * noise_pred) / jnp.sqrt(acp)
    x0 = jnp.clip(x0, -1.0, 1.0)

    mean = (xt - beta * noise_pred / somacp) / jnp.sqrt(alpha)

    # posterior variance (1 - acp_{t-1}) / (1 - acp_t) * beta_t; t==0 -> no noise
    acp_prev = sched.alpha_cum_prod[jnp.maximum(t - 1, 0)]
    variance = (1.0 - acp_prev) / (1.0 - acp) * beta
    sigma = jnp.sqrt(variance)
    z = jax.random.normal(key, xt.shape, xt.dtype)
    prev = jnp.where(t == 0, mean, mean + sigma * z)
    return prev, x0
