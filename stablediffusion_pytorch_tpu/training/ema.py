"""Exponential-moving-average shadow parameters.

The reference keeps a full EMA copy of the denoiser updated per step with
decay 0.9999 (reference: train_ddpm_cond_celebhq_multi_gpu.py:40, 240-247,
376-378); sampling and checkpointing use the ``ema_`` variant. Here the EMA
is a params pytree updated inside the jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax

EmaParams = Any  # params pytree


def ema_update(ema_params: EmaParams, new_params: EmaParams,
               decay: float = 0.9999) -> EmaParams:
    """ema <- decay * ema + (1 - decay) * params (element-wise)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, new_params,
    )
