"""Conditional latent-DDPM trainer: one jitted, mesh-sharded train step.

TPU-native re-implementation of the flagship reference trainer
(train_ddpm_cond_celebhq_multi_gpu.py, SURVEY.md §3.2):

  reference (per step)                      | here
  ------------------------------------------+--------------------------------
  DDP + NCCL grad all-reduce (:257-263)     | batch sharded on the 'data'
                                            | mesh axis; jit inserts the
                                            | gradient all-reduce
  AMP bfloat16 autocast + GradScaler        | model computes in bf16, loss &
  (:269-283, 344-347)                       | params fp32 (no scaler needed —
                                            | bf16 has fp32 range)
  grad-clip 1.0 (:365)                      | optax.clip_by_global_norm(1.0)
  non-finite loss/grad skip (:348-371)      | optax.apply_if_finite
  EMA 0.9999 (:40, 376-378)                 | ema_update inside the step
  loss.item() + all_reduce per step (:380)  | metrics stay on device; host
                                            | reads them asynchronously
  ReduceLROnPlateau on mean loss (:274-279) | host-side plateau controller
                                            | driving an injected lr
  CFG cond dropout (utils/diffusion_utils)  | same, with explicit PRNG keys
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from stablediffusion_pytorch_tpu.schedulers import LinearNoiseSchedule, add_noise
from stablediffusion_pytorch_tpu.training.ema import ema_update, warmup_decay
from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
    drop_class_condition,
    drop_image_condition,
    drop_text_condition,
)


def build_drop_probs(condition_config: Optional[dict]) -> Dict[str, float]:
    """Per-modality CFG dropout probabilities from a condition_config
    (reference: tools/train_ddpm_cond.py:150-190). Shared by the
    single-device and pipeline-parallel trainers."""
    cc = condition_config or {}
    probs = {}
    types = cc.get("condition_types", [])
    for name, key in (("text", "text_condition_config"),
                      ("image", "image_condition_config"),
                      ("class", "class_condition_config")):
        if name in types:
            probs[name] = cc[key].get("cond_drop_prob", 0.0)
    return probs


def apply_cond_dropout(cond: Dict[str, jax.Array], key,
                       drop_probs: Dict[str, float],
                       empty_text_embed) -> Dict[str, jax.Array]:
    """CFG condition dropout on a prepared cond dict (pure function of the
    PRNG key — usable inside jit/scan)."""
    if not cond:
        return cond
    out = dict(cond)
    k_text, k_img, k_cls = jax.random.split(key, 3)
    if "text" in out and drop_probs.get("text", 0) > 0:
        out["text"] = drop_text_condition(
            out["text"], k_text, empty_text_embed, drop_probs["text"])
    if "image" in out and drop_probs.get("image", 0) > 0:
        out["image"] = drop_image_condition(
            out["image"], k_img, drop_probs["image"])
    if "class" in out and drop_probs.get("class", 0) > 0:
        out["class"] = drop_class_condition(
            out["class"], k_cls, drop_probs["class"])
    return out


@dataclasses.dataclass
class PlateauController:
    """Host-side ReduceLROnPlateau matching the reference's epoch-level use
    (train_ddpm_cond_celebhq_multi_gpu.py:274-279, 390): factor 0.5,
    patience in epochs, min_lr floor; call ``step(mean_epoch_loss)`` between
    epochs and feed ``lr`` into the trainer."""

    lr: float
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-8
    best: float = float("inf")
    bad_epochs: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


class LdmTrainer:
    """Owns the denoiser (UNet or DiT nnx module), optimizer, and EMA."""

    def __init__(self, model: nnx.Module, sched: LinearNoiseSchedule,
                 lr: float = 1e-5, grad_clip: float = 1.0,
                 ema_decay: float = 0.9999, ema_warmup: bool = True,
                 condition_config: Optional[dict] = None,
                 empty_text_embed: Optional[jax.Array] = None):
        self.model = model
        self.sched = sched
        self.ema_decay = ema_decay
        # warmup ramps the effective decay min(decay, (1+t)/(10+t)) so the
        # EMA tracks training from step 0; ema_warmup=False gives the
        # reference's flat schedule (multi_gpu.py:40) exactly
        self.ema_warmup = ema_warmup
        self.ema_step = jnp.zeros((), jnp.int32)
        self.condition_config = condition_config or {}
        self.empty_text_embed = empty_text_embed

        self._lr0, self._grad_clip = lr, grad_clip
        self.optimizer = nnx.Optimizer(model, self._default_tx(), wrt=nnx.Param)
        # deep copy — ema buffers must not alias the live params (the jitted
        # step donates the ema tree)
        self.ema_params = jax.tree.map(jnp.copy, nnx.state(model, nnx.Param))
        self.plateau = PlateauController(lr=lr)
        self._drop_probs = build_drop_probs(condition_config)

    # -----------------------------------------------------------------
    def _default_tx(self):
        return optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(self._grad_clip),
                optax.inject_hyperparams(optax.adam)(learning_rate=self._lr0),
            ),
            max_consecutive_errors=10_000,
        )

    def reset_optimizer(self, tx=None) -> None:
        """Fresh optimizer state (per-cycle fresh-Adam semantics in the
        progressive QAT schedule, reference Model_DiT_9L_train.py per-cycle
        optimizer) WITHOUT constructing a new trainer: ``self`` is the
        nnx.jit static arg of ``_step``/``_multi_step``, so reusing the
        trainer object keeps the traced train step cached across cycles."""
        self.optimizer = nnx.Optimizer(self.model, tx if tx is not None
                                       else self._default_tx(), wrt=nnx.Param)

    # -----------------------------------------------------------------
    def _apply_cond_dropout(self, cond: Dict[str, jax.Array], key) -> Dict[str, jax.Array]:
        """CFG dropout (reference: tools/train_ddpm_cond.py:150-190)."""
        return apply_cond_dropout(cond, key, self._drop_probs,
                                  self.empty_text_embed)

    # -----------------------------------------------------------------
    def _ema_decay_at(self, step):
        if self.ema_warmup:
            return warmup_decay(self.ema_decay, step)
        return self.ema_decay

    @partial(nnx.jit, static_argnums=0, donate_argnums=3)
    def _step(self, model, optimizer, ema_params, ema_step, latents, cond,
              key):
        k_drop, k_noise, k_t = jax.random.split(key, 3)
        cond = self._apply_cond_dropout(cond, k_drop) if cond else None

        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        t = jax.random.randint(k_t, (latents.shape[0],), 0,
                               self.sched.num_timesteps)
        noisy = add_noise(self.sched, latents, noise, t)

        def loss_fn(m):
            pred = m(noisy, t, cond) if cond is not None else m(noisy, t)
            return jnp.mean((pred.astype(jnp.float32) -
                             noise.astype(jnp.float32)) ** 2)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        new_ema = ema_update(ema_params, nnx.state(model, nnx.Param),
                             self._ema_decay_at(ema_step))
        gnorm = optax.global_norm(grads)
        return new_ema, ema_step + 1, {"loss": loss, "grad_norm": gnorm}

    def train_step(self, latents: jax.Array,
                   cond: Optional[Dict[str, jax.Array]], key) -> Dict[str, Any]:
        """One optimization step; returns on-device metrics."""
        self.ema_params, self.ema_step, metrics = self._step(
            self.model, self.optimizer, self.ema_params, self.ema_step,
            latents, cond or {}, key)
        return metrics

    # -----------------------------------------------------------------
    @partial(nnx.jit, static_argnums=0, donate_argnums=3)
    def _multi_step(self, model, optimizer, ema_params, ema_step,
                    latents_stack, cond_stack, key):
        # model/optimizer MUST ride the scan carry — a broadcast (None axis)
        # module is re-read fresh each iteration and its updates are lost
        @nnx.scan(in_axes=(nnx.Carry, 0, 0, 0), out_axes=(nnx.Carry, 0))
        def body(carry, latents, cond, k):
            ema, step, model, optimizer = carry
            k_drop, k_noise, k_t = jax.random.split(k, 3)
            c = self._apply_cond_dropout(cond, k_drop) if cond else None
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            t = jax.random.randint(k_t, (latents.shape[0],), 0,
                                   self.sched.num_timesteps)
            noisy = add_noise(self.sched, latents, noise, t)

            def loss_fn(m):
                pred = m(noisy, t, c) if c is not None else m(noisy, t)
                return jnp.mean((pred.astype(jnp.float32)
                                 - noise.astype(jnp.float32)) ** 2)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            new_ema = ema_update(ema, nnx.state(model, nnx.Param),
                                 self._ema_decay_at(step))
            return (new_ema, step + 1, model, optimizer), loss

        keys = jax.random.split(key, latents_stack.shape[0])
        (ema, step, _, _), losses = body(
            (ema_params, ema_step, model, optimizer),
            latents_stack, cond_stack, keys)
        return ema, step, losses

    def train_multi_step(self, latents_stack: jax.Array,
                         cond_stack: Optional[Dict[str, jax.Array]],
                         key) -> jax.Array:
        """Run S optimization steps in ONE jitted program via nnx.scan over
        stacked batches (S, B, ...). Amortizes per-dispatch latency and host
        round-trips — on relay-attached chips dispatch alone is ~25ms/step
        (PERF.md). Returns the (S,) per-step losses (on device)."""
        self.ema_params, self.ema_step, losses = self._multi_step(
            self.model, self.optimizer, self.ema_params, self.ema_step,
            latents_stack, cond_stack or {}, key)
        return losses

    # -----------------------------------------------------------------
    def set_lr(self, lr: float) -> None:
        """Host-side LR override (plateau controller between epochs)."""
        inner = self.optimizer.opt_state.inner_state  # apply_if_finite wrapper
        inner[1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def end_epoch(self, mean_loss: float) -> float:
        lr = self.plateau.step(mean_loss)
        self.set_lr(lr)
        return lr
