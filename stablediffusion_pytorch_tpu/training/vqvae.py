"""Stage-1 VQVAE GAN trainer: generator + discriminator in one jitted step.

Re-implements the reference's interleaved-backward GAN loop
(tools/train_vqvae.py:124-170) as a single functional step with two
optimizers and stop_gradient boundaries (the "hard part" flagged in
SURVEY.md §7):

  generator loss = MSE recon
                 + codebook_weight * codebook + commitment_beta * commitment
                 + perceptual_weight * mean(LPIPS(out, im))
                 + [step > disc_start] disc_weight * MSE(D(out), 1)
  discriminator  = [step > disc_start] disc_weight *
                   (MSE(D(stop_grad(out)), 0) + MSE(D(im), 1)) / 2

Both Adams use betas (0.5, 0.999) (train_vqvae.py:75-77); gradient
accumulation uses optax.MultiSteps (= the reference's acc_steps deferred
optimizer.step(), train_vqvae.py:84, 163-170). The disc_start gate is a
traced step comparison, so one compiled step serves both phases
(train_vqvae.py:132-146).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from stablediffusion_pytorch_tpu.models.discriminator import Discriminator
from stablediffusion_pytorch_tpu.models.lpips import LPIPS
from stablediffusion_pytorch_tpu.models.vqvae import VQVAE


class VqvaeTrainer:
    def __init__(self, model: VQVAE, discriminator: Discriminator,
                 lpips: Optional[LPIPS], train_config: dict,
                 noise_scale: float = 0.0):
        self.model = model
        self.discriminator = discriminator
        self.lpips = lpips
        self.noise_scale = noise_scale  # vqvae_noise stage (n_scale sweep)

        tc = train_config
        self.disc_start = int(tc["disc_start"])
        self.disc_weight = float(tc["disc_weight"])
        self.codebook_weight = float(tc["codebook_weight"])
        self.commitment_beta = float(tc["commitment_beta"])
        self.perceptual_weight = float(tc["perceptual_weight"])
        acc_steps = int(tc.get("autoencoder_acc_steps", 1))
        lr = float(tc["autoencoder_lr"])

        def make_tx():
            return optax.MultiSteps(
                optax.apply_if_finite(
                    optax.inject_hyperparams(optax.adam)(
                        learning_rate=lr, b1=0.5, b2=0.999),
                    max_consecutive_errors=10_000),
                every_k_schedule=acc_steps)

        self.opt_g = nnx.Optimizer(model, make_tx(), wrt=nnx.Param)
        self.opt_d = nnx.Optimizer(discriminator, make_tx(), wrt=nnx.Param)
        self.step_count = jnp.zeros((), jnp.int32)

    # order of the scalar metrics packed into metrics["packed"] (one
    # device->host fetch instead of seven: each fetch is a full relay
    # round-trip, ~30 ms measured — see PERF.md round-3 input-path notes)
    METRIC_KEYS = ("g_loss", "d_loss", "recon_loss", "perceptual_loss",
                   "codebook_loss", "commitment_loss", "gen_adv_loss",
                   "out_std")

    @partial(nnx.jit, static_argnums=0)
    def _step(self, model, disc, lpips, opt_g, opt_d, im, step_count, key):
        if im.dtype == jnp.uint8:
            # raw pixels shipped as uint8 (4x less relay upload than f32);
            # exact inverse of the dataset's [-1,1] normalization
            im = im.astype(jnp.float32) / 127.5 - 1.0
        disc_active = (step_count > self.disc_start).astype(jnp.float32)

        def g_loss_fn(m):
            if self.noise_scale:
                out, z, qlosses = m(im, n_scale=self.noise_scale, key=key)
            else:
                out, z, qlosses = m(im)
            recon = jnp.mean((out.astype(jnp.float32) -
                              im.astype(jnp.float32)) ** 2)
            g = (recon
                 + self.codebook_weight * qlosses["codebook_loss"]
                 + self.commitment_beta * qlosses["commitment_loss"])
            if lpips is not None:
                # LPIPS params are frozen: grads flow only into `out`
                p_loss = jnp.mean(lpips(out, im))
                g = g + self.perceptual_weight * p_loss
            else:
                p_loss = jnp.zeros(())
            # adversarial generator loss, gated by disc_start
            fake_pred = disc(out)
            adv = jnp.mean((fake_pred - 1.0) ** 2)
            g = g + disc_active * self.disc_weight * adv
            aux = {"recon_loss": recon, "perceptual_loss": p_loss,
                   "codebook_loss": qlosses["codebook_loss"],
                   "commitment_loss": qlosses["commitment_loss"],
                   "gen_adv_loss": adv, "out": out,
                   # mean-collapse guard: a healthy decoder tracks the data
                   # std (~0.5 for [-1,1] images); the round-3 v1 GAN
                   # collapse showed out_std ~0.08 while recon loss still
                   # looked plausible (RESULTS.md:166-175)
                   "out_std": jnp.std(out.astype(jnp.float32))}
            return g, aux

        (g_loss, aux), g_grads = nnx.value_and_grad(
            g_loss_fn, has_aux=True)(model)
        out = aux.pop("out")
        opt_g.update(model, g_grads)

        def d_loss_fn(d):
            fake_pred = d(jax.lax.stop_gradient(out))
            real_pred = d(im)
            fake_loss = jnp.mean(fake_pred**2)          # MSE vs 0
            real_loss = jnp.mean((real_pred - 1.0) ** 2)  # MSE vs 1
            return disc_active * self.disc_weight * (fake_loss + real_loss) / 2

        d_loss, d_grads = nnx.value_and_grad(d_loss_fn)(disc)
        opt_d.update(disc, d_grads)

        metrics = {"g_loss": g_loss, "d_loss": d_loss, **aux}
        metrics["packed"] = jnp.stack([metrics[k] for k in self.METRIC_KEYS])
        return step_count + 1, metrics

    def train_step(self, im: jax.Array, key) -> dict:
        """im: NHWC batch in [-1, 1]. Returns on-device metrics."""
        self.step_count, metrics = self._step(
            self.model, self.discriminator, self.lpips, self.opt_g,
            self.opt_d, im, self.step_count, key)
        return metrics

    def _scale_lr(self, opt, factor: float) -> None:
        # MultiSteps -> apply_if_finite -> (inject_hyperparams adam)
        inner = opt.opt_state.inner_opt_state.inner_state
        inner.hyperparams["learning_rate"] = (
            inner.hyperparams["learning_rate"] * factor)

    def scale_disc_lr(self, factor: float) -> None:
        """Milestone decay of the discriminator LR (the reference's
        MultiStepLR at 50%/75%, train_vqvae_celebhq.py)."""
        self._scale_lr(self.opt_d, factor)

    def scale_gen_lr(self, factor: float) -> None:
        """Plateau-style decay hook for the generator LR."""
        self._scale_lr(self.opt_g, factor)
