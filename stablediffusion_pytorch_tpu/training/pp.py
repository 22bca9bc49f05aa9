"""Pipeline-parallel LDM trainer: the full production train loop (optimizer
+ EMA + CFG dropout + plateau LR) over the GPipe-sharded DiT stack.

``parallel/pp.py`` supplies the differentiable pipelined forward; this
module closes the loop the reference never had (it scales by DDP only,
SURVEY.md §2.7): the optimizer step applies DIRECTLY to the stacked layer
state whose leading layer axis is sharded over the ``'pipe'`` mesh axis —
Adam moments, EMA buffers, and gradients all inherit that sharding from the
parameters, so per-stage optimizer math runs on the stage that owns the
layers, with zero parameter collectives (gradients of the replicated
prologue/epilogue params are the only all-reduce, inserted by jit).

API mirrors :class:`~stablediffusion_pytorch_tpu.training.ldm.LdmTrainer`
(train_step / train_multi_step / end_epoch / ema_params), so
``tools/train_ddpm_cond.py`` drives either through one code path, and
checkpoints written here restore into the plain single-device model
(``sync_into_model`` + the model-shaped ``ema_params`` property).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx
from jax import lax
from jax.sharding import Mesh

from stablediffusion_pytorch_tpu.parallel.pp import (
    build_pp_forward, unstack_into_model,
)
from stablediffusion_pytorch_tpu.schedulers import (
    LinearNoiseSchedule, add_noise,
)
from stablediffusion_pytorch_tpu.training.ema import ema_update, warmup_decay
from stablediffusion_pytorch_tpu.training.ldm import (
    PlateauController, apply_cond_dropout, build_drop_probs,
)


class PPLdmTrainer:
    """Owns the pipelined DiT params ({'stack', 'rest'} pytree), optimizer,
    and EMA. ``stack`` is the transformer-layer state with a leading layer
    axis sharded over ``pipe_axis``; ``rest`` is the full model state whose
    transformer entries are dead weight (never read by prepare/finalize, so
    XLA DCEs them from the compiled step and their Adam moments stay exactly
    zero — gradients for them are identically zero from step 0)."""

    def __init__(self, model: nnx.Module, sched: LinearNoiseSchedule,
                 mesh: Mesh, *, n_microbatches: int, lr: float = 1e-5,
                 grad_clip: float = 1.0, ema_decay: float = 0.9999,
                 ema_warmup: bool = True,
                 condition_config: Optional[dict] = None,
                 empty_text_embed: Optional[jax.Array] = None,
                 pipe_axis: str = "pipe",
                 data_axis: Optional[str] = None):
        self.model = model
        self.sched = sched
        self.mesh = mesh
        self.ema_decay = ema_decay
        self.ema_warmup = ema_warmup
        self.empty_text_embed = empty_text_embed
        self._drop_probs = build_drop_probs(condition_config)

        forward, stacked, rest = build_pp_forward(
            model, mesh, n_microbatches=n_microbatches,
            pipe_axis=pipe_axis, data_axis=data_axis)
        self._forward = forward
        self.params = {"stack": stacked, "rest": rest}

        # same recipe as LdmTrainer: clip -> adam, skip non-finite steps
        self.tx = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(grad_clip),
                optax.inject_hyperparams(optax.adam)(learning_rate=lr),
            ),
            max_consecutive_errors=10_000,
        )
        self.opt_state = self.tx.init(self.params)
        self.ema = jax.tree.map(jnp.copy, self.params)
        self.ema_step = jnp.zeros((), jnp.int32)
        self.plateau = PlateauController(lr=lr)

        def step_body(params, opt_state, ema, ema_step, latents, cond, key):
            k_drop, k_noise, k_t = jax.random.split(key, 3)
            c = (apply_cond_dropout(cond, k_drop, self._drop_probs,
                                    self.empty_text_embed)
                 if cond else None)
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            t = jax.random.randint(k_t, (latents.shape[0],), 0,
                                   sched.num_timesteps)
            noisy = add_noise(sched, latents, noise, t)

            def loss_fn(p):
                pred = forward(p["stack"], p["rest"], noisy, t, c)
                return jnp.mean((pred.astype(jnp.float32)
                                 - noise.astype(jnp.float32)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            decay = (warmup_decay(ema_decay, ema_step) if ema_warmup
                     else ema_decay)
            ema = ema_update(ema, params, decay)
            gnorm = optax.global_norm(grads)
            return (params, opt_state, ema, ema_step + 1,
                    {"loss": loss, "grad_norm": gnorm})

        self._jit_step = jax.jit(step_body, donate_argnums=(0, 1, 2, 3))

        def multi_body(params, opt_state, ema, ema_step, latents_stack,
                       cond_stack, keys):
            def body(carry, xs):
                params, opt_state, ema, step = carry
                latents, cond, k = xs
                params, opt_state, ema, step, m = step_body(
                    params, opt_state, ema, step, latents, cond, k)
                return (params, opt_state, ema, step), m["loss"]

            (params, opt_state, ema, step), losses = lax.scan(
                body, (params, opt_state, ema, ema_step),
                (latents_stack, cond_stack, keys))
            return params, opt_state, ema, step, losses

        self._jit_multi = jax.jit(multi_body, donate_argnums=(0, 1, 2, 3))

    # -----------------------------------------------------------------
    def train_step(self, latents: jax.Array,
                   cond: Optional[Dict[str, jax.Array]],
                   key) -> Dict[str, Any]:
        """One pipelined optimization step; returns on-device metrics."""
        (self.params, self.opt_state, self.ema, self.ema_step,
         metrics) = self._jit_step(self.params, self.opt_state, self.ema,
                                   self.ema_step, latents, cond or {}, key)
        return metrics

    def train_multi_step(self, latents_stack: jax.Array,
                         cond_stack: Optional[Dict[str, jax.Array]],
                         key) -> jax.Array:
        """S pipelined steps in ONE jitted lax.scan over stacked (S, B, ...)
        batches (same dispatch-amortization as LdmTrainer.train_multi_step).
        Returns the (S,) per-step losses."""
        keys = jax.random.split(key, latents_stack.shape[0])
        (self.params, self.opt_state, self.ema, self.ema_step,
         losses) = self._jit_multi(self.params, self.opt_state, self.ema,
                                   self.ema_step, latents_stack,
                                   cond_stack or {}, keys)
        return losses

    # -----------------------------------------------------------------
    def sync_into_model(self) -> None:
        """Write the trained pipeline params back into ``self.model`` (rest
        first, then the stack so the live per-layer weights win over the
        dead copies inside rest) — after this the plain model checkpoints /
        samples exactly like a single-device run."""
        nnx.update(self.model, self.params["rest"])
        unstack_into_model(self.model, self.params["stack"])

    def _as_model_state(self, tree) -> Any:
        """Render a {'stack','rest'} tree as a model-shaped Param state by
        temporarily writing it into the model (jax arrays are immutable, so
        holding the live references and re-updating restores losslessly).

        nnx.state() returns a VIEW over the module's variables — tree.map
        materializes a detached snapshot of the array references before the
        swap, otherwise the 'restore' would write back the EMA values."""
        live = jax.tree.map(lambda x: x, nnx.state(self.model))
        nnx.update(self.model, tree["rest"])
        unstack_into_model(self.model, tree["stack"])
        out = jax.tree.map(lambda x: x, nnx.state(self.model, nnx.Param))
        nnx.update(self.model, live)
        return out

    @property
    def ema_params(self):
        """EMA params in model-state shape (what save_train_checkpoint and
        the samplers expect)."""
        return self._as_model_state(self.ema)

    # -----------------------------------------------------------------
    def set_lr(self, lr: float) -> None:
        inner = self.opt_state.inner_state  # apply_if_finite wrapper
        inner[1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def end_epoch(self, mean_loss: float) -> float:
        lr = self.plateau.step(mean_loss)
        self.set_lr(lr)
        return lr
