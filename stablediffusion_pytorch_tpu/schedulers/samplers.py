"""DDPM / DDIM reverse-process samplers compiled as single jitted lax.scan
loops, with classifier-free guidance folded into the scan body.

Re-implements the reference samplers:
  * full-T DDPM reverse loop (reference: tools/sample_ddpm_text_image_cond.py:
    22-109 and scheduler/linear_noise_scheduler.py:94-170)
  * few-step DDIM with linear/quadratic timestep subsequences and eta
    (reference: scheduler/linear_noise_scheduler.py:174-256)
  * CFG blend ``uncond + s * (cond - uncond)`` applied when scale > 1
    (reference: tools/sample_ddpm_text_image_cond.py:84-86; the GUIs wrap the
    model in a _GuidedModelWrapper, gui_..._tc05_andi.py:147-165).

The denoiser is passed as ``model_fn(xt, t, cond) -> eps`` where ``t`` is an
int32 array of shape (B,) and ``cond`` is a dict pytree (may be empty). For
CFG the caller provides ``uncond`` with identical structure; the two branches
are batched into ONE model call (batch 2B) so the MXU sees a single large
matmul instead of two small ones.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from stablediffusion_pytorch_tpu.ops import quant
from stablediffusion_pytorch_tpu.schedulers.linear import (
    LinearNoiseSchedule,
    sample_prev_timestep,
)

ModelFn = Callable[..., jax.Array]


def cfg_blend(cond_pred: jax.Array, uncond_pred: jax.Array, scale) -> jax.Array:
    """Classifier-free guidance: ``uncond + scale * (cond - uncond)``.

    Reference: tools/sample_ddpm_text_image_cond.py:84-86.
    """
    return uncond_pred + scale * (cond_pred - uncond_pred)


def _predict_eps(
    model_fn: ModelFn,
    xt: jax.Array,
    t: jax.Array,
    cond: Optional[dict],
    uncond: Optional[dict],
    guidance_scale: Optional[float],
) -> jax.Array:
    """One (possibly CFG-doubled) denoiser evaluation."""
    use_cfg = uncond is not None and guidance_scale is not None
    if not use_cfg:
        return model_fn(xt, t, cond) if cond is not None else model_fn(xt, t)
    # batch the conditional and unconditional branches into one call
    x2 = jnp.concatenate([xt, xt], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    cond2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0), cond, uncond)
    eps2 = model_fn(x2, t2, cond2)
    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
    return cfg_blend(eps_c, eps_u, guidance_scale)


def ddpm_sample(
    model_fn: ModelFn,
    sched: LinearNoiseSchedule,
    xt: jax.Array,
    key: jax.Array,
    cond: Optional[dict] = None,
    uncond: Optional[dict] = None,
    guidance_scale: Optional[float] = None,
    return_trajectory: bool = False,
):
    """Full-T reverse DDPM loop as one lax.scan: T model calls.

    Returns final ``x0`` latent, or ``(x_final, (xs, x0s))`` trajectories when
    ``return_trajectory`` (used by the samplers that dump per-step x0 grids,
    reference: tools/sample_ddpm_text_image_cond.py:94-107).
    """
    T = sched.num_timesteps
    batch = xt.shape[0]

    def body(carry, t):
        x, k = carry
        k, k_step, k_noise = jax.random.split(k, 3)
        tb = jnp.full((batch,), t, jnp.int32)
        # per-step external noise key: quantized layers resample their
        # weight noise i.i.d. each denoise step (reference per-call
        # semantics) instead of falling back to a data-derived key
        with quant.external_noise_key(k_noise):
            eps = _predict_eps(model_fn, x, tb, cond, uncond, guidance_scale)
        x_prev, x0 = sample_prev_timestep(sched, x, eps, t, k_step)
        # f32 coefficient tables promote low-precision latents; keep the
        # scan carry at the input dtype (bf16 sampling support)
        x_prev = x_prev.astype(xt.dtype)
        out = (x_prev, x0) if return_trajectory else None
        return (x_prev, k), out

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x_final, _), traj = jax.lax.scan(body, (xt, key), ts)
    if return_trajectory:
        return x_final, traj
    return x_final


def ddim_timesteps(T: int, steps: int, method: str = "linear") -> Tuple[np.ndarray, np.ndarray]:
    """Static DDIM timestep subsequence (host-side numpy, traced as constants).

    linear:    range(0, T, T//steps) + 1
    quadratic: (linspace(0, sqrt(T*0.8), steps)^2).astype(int32) + 1
    prev = [0, ts[:-1]]
    Reference: scheduler/linear_noise_scheduler.py:231-242.
    """
    if method == "linear":
        a = T // steps
        ts = np.asarray(list(range(0, T, a)))
    elif method == "quadratic":
        ts = (np.linspace(0, np.sqrt(T * 0.8), steps) ** 2).astype(np.int32)
    else:
        raise NotImplementedError(f"sampling method {method} is not implemented!")
    ts = ts + 1
    ts_prev = np.concatenate([[0], ts[:-1]])
    return ts, ts_prev


def ddim_sample(
    model_fn: ModelFn,
    sched: LinearNoiseSchedule,
    xt: jax.Array,
    key: jax.Array,
    steps: int = 100,
    method: str = "quadratic",
    eta: float = 0.0,
    cond: Optional[dict] = None,
    uncond: Optional[dict] = None,
    guidance_scale: Optional[float] = None,
    return_trajectory: bool = False,
):
    """Few-step DDIM sampler as one lax.scan over the timestep subsequence.

    eta = 0 is deterministic DDIM, eta = 1 recovers DDPM.
    Reference: scheduler/linear_noise_scheduler.py:186-256 (step math 199-206).
    """
    ts_np, ts_prev_np = ddim_timesteps(sched.num_timesteps, steps, method)
    ts = jnp.asarray(ts_np[::-1].copy(), jnp.int32)
    ts_prev = jnp.asarray(ts_prev_np[::-1].copy(), jnp.int32)
    batch = xt.shape[0]

    def body(carry, t_pair):
        x, k = carry
        t, t_prev = t_pair
        k, k_step, k_noise = jax.random.split(k, 3)
        tb = jnp.full((batch,), t, jnp.int32)
        with quant.external_noise_key(k_noise):
            eps_theta = _predict_eps(model_fn, x, tb, cond, uncond,
                                     guidance_scale)

        alpha_t = sched.alpha_cum_prod[t]
        alpha_prev = sched.alpha_cum_prod[t_prev]
        sigma_t = eta * jnp.sqrt(
            (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / alpha_prev)
        )
        noise = jax.random.normal(k_step, x.shape, x.dtype)
        x_prev = (
            jnp.sqrt(alpha_prev / alpha_t) * x
            + (
                jnp.sqrt(1.0 - alpha_prev - sigma_t**2)
                - jnp.sqrt(alpha_prev * (1.0 - alpha_t) / alpha_t)
            )
            * eps_theta
            + sigma_t * noise
        )
        x_prev = x_prev.astype(xt.dtype)  # keep carry dtype (bf16 support)
        return (x_prev, k), (x_prev if return_trajectory else None)

    (x_final, _), traj = jax.lax.scan(body, (xt, key), (ts, ts_prev))
    if return_trajectory:
        return x_final, traj
    return x_final


def dpm_solver_sample(
    model_fn: ModelFn,
    sched: LinearNoiseSchedule,
    xt: jax.Array,
    steps: int = 20,
    method: str = "linear",
    cond: Optional[dict] = None,
    uncond: Optional[dict] = None,
    guidance_scale: Optional[float] = None,
    noise_key: Optional[jax.Array] = None,
):
    """DPM-Solver++(2M) — deterministic multistep ODE sampler, one lax.scan.

    BEYOND the reference (which ships DDPM/DDIM only): the second-order
    multistep solver of Lu et al. 2022 reaches DDIM-100 sample quality in
    ~15-25 model calls, i.e. ~4-5x fewer denoiser forwards per image on
    TPU. Data-prediction formulation: with lam = log(a/s), h_i = lam_i -
    lam_{i-1}, r = h_{i-1}/h_i,

        D   = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}     (first step: D = x0_i)
        x_i = (s_i/s_{i-1}) x_{i-1} - a_i (exp(-h_i) - 1) D

    where a = sqrt(alpha_cum_prod), s = sqrt(1 - alpha_cum_prod), and
    x0 = (x - s*eps_theta)/a from the eps-prediction network. Shares the
    reference's DDIM timestep subsequences and the batched-CFG model call.
    """
    ts_np, _ = ddim_timesteps(sched.num_timesteps, steps, method)
    # quadratic spacing repeats small timesteps (e.g. steps=100 yields many
    # t==t_prev pairs); a repeated t gives h=0 and r=h_prev/h would NaN the
    # whole trajectory. Deduplicate host-side: the effective step count is
    # the number of *distinct* timesteps, which is also what the repeated
    # steps would have computed had they been numerically stable.
    ts_np = np.unique(ts_np)
    ts_prev_np = np.concatenate([[0], ts_np[:-1]])
    # reversed walk t_hi -> t_lo; each scan step evaluates the model at t
    # and lands on t_prev
    ts = np.asarray(ts_np[::-1])
    ts_prev = np.asarray(ts_prev_np[::-1])
    acp = np.asarray(sched.alpha_cum_prod)
    a_t, s_t = np.sqrt(acp[ts]), np.sqrt(1.0 - acp[ts])
    a_p, s_p = np.sqrt(acp[ts_prev]), np.sqrt(1.0 - acp[ts_prev])
    lam_t = np.log(a_t / np.maximum(s_t, 1e-12))
    lam_p = np.log(a_p / np.maximum(s_p, 1e-12))
    h = lam_p - lam_t                                   # > 0 going down
    h_prev = np.concatenate([[h[0]], h[:-1]])
    xs = tuple(
        jnp.asarray(v, jnp.float32)
        for v in (a_t, s_t, a_p, s_p, h, h_prev, np.arange(len(ts)))
    )
    ts_dev = jnp.asarray(ts.copy(), jnp.int32)
    batch = xt.shape[0]

    def body(carry, step):
        x, x0_prev = carry
        (a_i, s_i, a_pi, s_pi, h_i, h_pi, idx), t = step
        tb = jnp.full((batch,), t, jnp.int32)
        # the ODE solver is deterministic; quantized-model weight noise
        # still resamples per step when a noise_key is supplied
        k_noise = (None if noise_key is None
                   else jax.random.fold_in(noise_key, idx.astype(jnp.int32)))
        with quant.external_noise_key(k_noise):
            eps = _predict_eps(model_fn, x, tb, cond, uncond, guidance_scale)
        x0 = (x.astype(jnp.float32) - s_i * eps.astype(jnp.float32)) / a_i
        r = h_pi / h_i
        d_multi = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(idx == 0, x0, d_multi)
        x_new = (s_pi / s_i) * x.astype(jnp.float32) \
            - a_pi * (jnp.exp(-h_i) - 1.0) * d
        return (x_new.astype(xt.dtype), x0), None

    (x_final, _), _ = jax.lax.scan(
        body, (xt, jnp.zeros_like(xt, jnp.float32)), (xs, ts_dev))
    return x_final
