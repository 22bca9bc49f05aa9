"""Exponential-moving-average shadow parameters.

The reference keeps a full EMA copy of the denoiser updated per step with
decay 0.9999 (reference: train_ddpm_cond_celebhq_multi_gpu.py:40, 240-247,
376-378); sampling and checkpointing use the ``ema_`` variant. Here the EMA
is a params pytree updated inside the jitted train step.
"""

from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

EmaParams = Any  # params pytree


def ema_update(ema_params: EmaParams, new_params: EmaParams,
               decay: Union[float, jax.Array] = 0.9999) -> EmaParams:
    """ema <- decay * ema + (1 - decay) * params (element-wise).

    ``decay`` may be a traced scalar (see :func:`warmup_decay`).
    """
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, new_params,
    )


def warmup_decay(decay: float, step: jax.Array) -> jax.Array:
    """Effective decay ``min(decay, (1+step)/(10+step))`` (EMA warmup).

    The reference's flat decay 0.9999 needs ~10k steps before the shadow
    forgets its random init — round 3's 256^2 evidence run measured the
    EMA checkpoint still 98.4% at init after 3.3k optimizer steps (gray
    samples), while the live weights had fully trained. The ramp makes
    short-horizon EMA checkpoints usable and is asymptotically identical
    to the reference schedule (matches the warmup used by common EMA
    implementations, e.g. tensorflow/optax ExponentialMovingAverage).
    """
    s = step.astype(jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32),
                       (1.0 + s) / (10.0 + s))
