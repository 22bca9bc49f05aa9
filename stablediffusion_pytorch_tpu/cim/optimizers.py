"""Custom QAT optimizers as optax gradient transformations.

Re-implements the reference's optimizer zoo (cim_layers/DDFP_optimizer.py,
IBA_optimizer.py) functionally:

  * percent_adam — "PercentOptimizerFP": Adam whose per-parameter update is
    rescaled to ``lr * max|w| / max|update|`` — a weight-relative step size
    (reference: DDFP_optimizer.py:78-141; used as the QAT optimizer in
    Model_DiT_9L_train.py:266)
  * adam_int — "AdamOptimizerINT": integer-arithmetic Adam — truncated
    momentum, power-of-two adaptive lr from a bit budget
    (reference: DDFP_optimizer.py:7-76)
  * sgd_momentum — plain SGD+momentum (reference: DDFP_optimizer.py:217+)
  * DdfpScheduler — integer ReduceLROnPlateau that SUBTRACTS ``factor`` bits
    from the lr-bit budget (reference: DDFP_optimizer.py:144-215)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _AdamState(NamedTuple):
    step: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def percent_adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with per-parameter update rescaled so the LARGEST update equals
    ``lr * max|param|`` (reference: DDFP_optimizer.py:120-134). Requires
    params (optax update(..., params=...))."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _AdamState(jnp.zeros((), jnp.int32), z,
                          jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        assert params is not None, "percent_adam requires params"
        step = state.step + 1
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, grads)
        bc1 = 1 - b1 ** step.astype(jnp.float32)
        bc2 = 1 - b2 ** step.astype(jnp.float32)
        adj = jnp.sqrt(bc2) / bc1

        def scale(m, v, p):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            upd = adj * m / denom
            max_update = jnp.max(jnp.abs(upd))
            max_weight = jnp.max(jnp.abs(p))
            factor = lr * max_weight / (max_update + eps)
            return -(upd * factor)  # optax convention: additive update

        updates = jax.tree.map(scale, exp_avg, exp_avg_sq, params)
        return updates, _AdamState(step, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init, update)


class _IntAdamState(NamedTuple):
    step: jax.Array
    exp_avg: optax.Updates
    lr_bit: jax.Array


def adam_int(lr_bit: int = 5, b1: float = 0.5, b2: float = 0.5
             ) -> optax.GradientTransformation:
    """Integer-arithmetic first-moment optimizer: truncated momentum and a
    power-of-two learning rate chosen so max|update| spans ~2^lr_bit levels
    (reference: DDFP_optimizer.py:17-76). The lr-bit budget is state so the
    DdfpScheduler can shrink it."""

    def init(params):
        return _IntAdamState(jnp.zeros((), jnp.int32),
                             jax.tree.map(jnp.zeros_like, params),
                             jnp.asarray(float(lr_bit)))

    def update(grads, state, params=None):
        step = state.step + 1
        exp_avg = jax.tree.map(
            lambda m, g: jnp.trunc(b1 * m) + jnp.trunc((1 - b1) * g),
            state.exp_avg, grads)

        def adaptive(m):
            # lr = 2^-ceil(log2(max|m| / 2^lr_bit)) (reference: :69-76)
            lb = jnp.maximum(state.lr_bit, 1.0)
            scale_factor = jnp.max(jnp.abs(m)) / (2.0 ** lb)
            shift = jnp.clip(jnp.ceil(jnp.log2(scale_factor + 1e-30)),
                             -32, 32)
            lr = 1.0 / 2.0 ** shift
            return -jnp.trunc(m * lr)

        updates = jax.tree.map(adaptive, exp_avg)
        return updates, _IntAdamState(step, exp_avg, state.lr_bit)

    return optax.GradientTransformation(init, update)


def sgd_momentum(lr: float = 2 ** -7, momentum: float = 0.9,
                 weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Reference: DDFP_optimizer.py:217+."""
    chain = [optax.trace(decay=momentum)]
    if weight_decay:
        chain.insert(0, optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


class DdfpScheduler:
    """Integer plateau scheduler: on plateau, SUBTRACT ``factor`` from the
    lr-bit budget (min floor), with cooldown (reference:
    DDFP_optimizer.py:144-215). Drives the host-side lr_bit that feeds
    adam_int state between cycles."""

    def __init__(self, lr_bit: int, mode: str = "min", factor: int = 2,
                 patience: int = 10, threshold: float = 1e-4,
                 cooldown: int = 0, min_lr: int = 1):
        if factor < 1 or not isinstance(factor, int):
            raise ValueError("Factor must be an integer greater than 1.")
        if mode not in ("min", "max"):
            raise ValueError("Mode must be 'min' or 'max'.")
        self.lr_bit = lr_bit
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.min_lr = round(min_lr)
        self.cooldown_counter = 0
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, a):
        if self.mode == "min":
            return a < self.best - self.threshold
        return a > self.best + self.threshold

    def step(self, metric: float) -> int:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr_bit = max(self.lr_bit - self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr_bit
