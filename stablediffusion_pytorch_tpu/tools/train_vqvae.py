"""Stage-1 VQVAE training CLI.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.train_vqvae
--config celebhq [--epochs N] [--noise-scale S]``

Re-implements reference tools/train_vqvae.py:21-196: VQVAE + LPIPS +
PatchGAN with the composite generator loss, two Adam(0.5, 0.999) optimizers,
disc_start gating, gradient accumulation, periodic recon grids, per-epoch
checkpoint saves. ``--noise-scale`` activates the vqvae_noise regime
(train_vqvae_celebhq_noise.py:255-483 trains a sweep of noise scales; here
one scale per invocation).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.data import DataLoader
from stablediffusion_pytorch_tpu.models import Discriminator
from stablediffusion_pytorch_tpu.models.lpips import load_lpips
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_vqvae, load_config, seed_everything,
)
from stablediffusion_pytorch_tpu.training import VqvaeTrainer
from stablediffusion_pytorch_tpu.training.checkpoint import (
    infer_epoch_from_filename, load_model, save_model,
)
from stablediffusion_pytorch_tpu.utils.image_utils import save_image_grid
from stablediffusion_pytorch_tpu.utils.train_utils import (
    create_run_artifacts, persist_loss_history, plot_epoch_loss_curve,
    save_config_snapshot_json,
)

log = logging.getLogger("sdtpu")


def train(args):
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    key = seed_everything(tc.get("seed", 1111))

    arts = create_run_artifacts(args.output_root, tc["task_name"])

    model = build_vqvae(cfg)
    if getattr(args, "remat", False):
        # gradient checkpointing: per-block activation recompute in the
        # backward pass (models/vqvae.py) — frees the dominant share of
        # the GAN step's HBM at 256² for one extra encoder/decoder forward
        model.remat = True
        log.info("gradient checkpointing (remat) enabled")
    disc = Discriminator(cfg.dataset_params["im_channels"], rngs=nnx.Rngs(1))
    lpips = None
    if float(tc.get("perceptual_weight", 0)) > 0:
        lpips = load_lpips(args.lpips_weights)
    save_config_snapshot_json(arts["run_dir"], cfg, lpips_model=lpips)

    trainer = VqvaeTrainer(model, disc, lpips, tc,
                           noise_scale=args.noise_scale)

    # resume from paired G+D checkpoints, inferring the start epoch from the
    # filename (reference: train_vqvae_celebhq.py:360-383)
    start_epoch = 0
    resume_gen = getattr(args, "resume_gen", None)
    if resume_gen:
        load_model(resume_gen, model)
        start_epoch = infer_epoch_from_filename(resume_gen) or 0
        if getattr(args, "resume_disc", None):
            load_model(args.resume_disc, disc)
        log.info("resumed from %s (epoch %d)", resume_gen, start_epoch)

    ds = build_dataset(cfg)
    dl = DataLoader(ds, batch_size=tc["autoencoder_batch_size"],
                    seed=tc.get("seed", 1111))

    num_epochs = args.epochs or tc["autoencoder_epochs"]
    planned_steps = num_epochs * max(1, len(ds) // dl.batch_size)
    if (trainer.perceptual_weight == 0 and trainer.disc_weight > 0
            and trainer.disc_start < planned_steps):
        log.warning(
            "GAN engages at step %d of %d with perceptual_weight=0: "
            "MSE+GAN without a perceptual loss mean-collapsed the 256^2 "
            "decoder (round-3 measurement, decoder-output std 0.08). The "
            "reference stabilizes its GAN with LPIPS — provide LPIPS "
            "weights or raise disc_start past the run length.",
            trainer.disc_start, planned_steps)
    image_save_steps = tc.get("autoencoder_img_save_steps", 64)
    all_losses = []
    step = 0
    img_save_count = 0

    # jitted recon forward for the periodic image grids (an eager VQVAE
    # forward is hundreds of per-op relay dispatches — seconds per grid)
    @nnx.jit
    def _recon(m, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        return m(x)[0]

    for epoch in range(start_epoch, num_epochs):
        epoch_metrics = []
        epoch_losses = []
        for im in dl.epoch(epoch):
            # ship raw pixels as uint8: 4x less relay upload than f32,
            # exact round-trip of the source bytes (normalized in-jit)
            im = np.round((np.asarray(im) + 1.0) * 127.5).astype(np.uint8)
            key, k_step = jax.random.split(key)
            metrics = trainer.train_step(im, k_step)
            step += 1
            if step % args.log_every == 0 or step == 1:
                # ONE packed device->host fetch for all scalar metrics
                packed = np.asarray(metrics["packed"])
                m = dict(zip(trainer.METRIC_KEYS, packed.tolist()))
                epoch_metrics.append(m)
                all_losses.append(m["g_loss"])
                epoch_losses.append(m["g_loss"])
                log.info("epoch %d step %d | g %.4f recon %.4f lpips %.4f "
                         "codebook %.4f d %.4f std %.3f", epoch, step,
                         m["g_loss"], m["recon_loss"], m["perceptual_loss"],
                         m["codebook_loss"], m["d_loss"], m["out_std"])
                # decode-std mean-collapse guard (VERDICT r3 #5): the v1
                # 256^2 GAN run collapsed to out_std~0.08 while recon loss
                # still looked plausible; healthy [-1,1] faces decode at
                # std ~0.4-0.6
                if step > trainer.disc_start and m["out_std"] < 0.15:
                    log.warning(
                        "decoder output std %.3f < 0.15 with the GAN "
                        "active (step %d) — mean-collapse signature; "
                        "lower disc_weight / raise disc_start or add a "
                        "perceptual anchor", m["out_std"], step)
            if step % image_save_steps == 0 or step == 1:
                out = _recon(trainer.model, jnp.asarray(im[:8]))
                im_f = im[:8].astype(np.float32) / 127.5 - 1.0
                grid = list(im_f) + list(np.asarray(out))
                save_image_grid(
                    os.path.join(arts["run_dir"], "vqvae_autoencoder_samples",
                                 f"current_autoencoder_sample_{img_save_count}.png"),
                    grid, nrow=min(8, im.shape[0]))
                img_save_count += 1
        save_model(os.path.join(arts["ckpt_dir"],
                                tc["vqvae_autoencoder_ckpt_name"]), model)
        save_model(os.path.join(
            arts["ckpt_dir"],
            f"epoch_{epoch:03d}_" + tc["vqvae_autoencoder_ckpt_name"]), model)
        save_model(os.path.join(arts["ckpt_dir"],
                                tc["vqvae_discriminator_ckpt_name"]), disc)
        persist_loss_history(arts["run_dir"], all_losses)
        plot_epoch_loss_curve(arts["run_dir"], epoch, epoch_losses)
        # disc LR: MultiStepLR at 50%/75% of the run
        # (reference: train_vqvae_celebhq.py disc scheduler)
        if epoch + 1 in (num_epochs // 2, (3 * num_epochs) // 4):
            trainer.scale_disc_lr(0.1)
    log.info("Done Training...")
    return arts


def train_noise_sweep(args):
    """Noise-robust decoder training: sweep latent-noise scales
    n_list = linspace(start, end, stages), one training stage per scale
    (reference: train_vqvae_celebhq_noise.py:255-483 and its DDP variant
    train_vqvae_celebhq_noise_multi_GPU.py — the mesh-sharded step covers
    the DDP-GAN parity)."""
    import numpy as np

    n_list = np.linspace(args.noise_sweep[0], args.noise_sweep[1],
                         int(args.noise_sweep[2]))
    results = []
    for stage, n_scale in enumerate(n_list):
        log.info("=== noise stage %d/%d: n_scale=%.4f ===",
                 stage + 1, len(n_list), n_scale)
        stage_args = argparse.Namespace(**vars(args))
        stage_args.noise_scale = float(n_scale)
        stage_args.noise_sweep = None
        results.append(train(stage_args))
    return results


def main():
    parser = argparse.ArgumentParser(description="Arguments for vq vae training")
    parser.add_argument("--config", dest="config", default="celebhq")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--noise-scale", type=float, default=0.0)
    parser.add_argument("--noise-sweep", type=float, nargs=3, default=None,
                        metavar=("START", "END", "STAGES"),
                        help="latent-noise sweep (vqvae_noise regime)")
    parser.add_argument("--resume-gen", default=None,
                        help="VQVAE ckpt to resume (epoch inferred from name)")
    parser.add_argument("--resume-disc", default=None)
    parser.add_argument("--lpips-weights", default=None)
    parser.add_argument("--output-root", default="runs")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--remat", action="store_true",
                        help="gradient checkpointing: recompute encoder/"
                             "decoder block activations in the backward "
                             "pass (larger batches per chip)")
    args = parser.parse_args()
    if args.noise_sweep:
        train_noise_sweep(args)
    else:
        train(args)


if __name__ == "__main__":
    main()
