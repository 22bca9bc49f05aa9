"""VQVAE inference CLI: reconstruction grids + optional latent pickling.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.infer_vqvae
--config celebhq --ckpt <path> [--save-latents]``

Re-implements reference tools/infer_vqvae.py:20-111: sample a few images,
save input/recon sheets, and (with save_latents) encode the whole dataset
into 1000-image pickle shards under
``<task>/<vqvae_latent_dir_name>/<part>.pkl``.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.data import DataLoader, save_latent_shards
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_vqvae, load_config, seed_everything,
)
from stablediffusion_pytorch_tpu.training.checkpoint import load_model
from stablediffusion_pytorch_tpu.utils.image_utils import save_image_grid

log = logging.getLogger("sdtpu")


def infer(args):
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    seed_everything(tc.get("seed", 1111))

    model = build_vqvae(cfg)
    if args.ckpt:
        load_model(args.ckpt, model)

    graphdef, state = nnx.split(model)

    @jax.jit
    def encode_fn(state, im):
        m = nnx.merge(graphdef, state)
        z, _ = m.encode(im)
        return z

    @jax.jit
    def recon_fn(state, im):
        m = nnx.merge(graphdef, state)
        out, z, _ = m(im)
        return out

    ds = build_dataset(cfg)
    out_dir = os.path.join(args.output_root, tc["task_name"])

    # reconstruction sheet (reference: infer_vqvae.py:40-70)
    n = min(args.num_samples, len(ds))
    ims = np.stack([np.asarray(ds[i]) for i in range(n)])
    recon = np.asarray(recon_fn(state, ims))
    save_image_grid(os.path.join(out_dir, "vqvae_recon.png"),
                    list(ims) + list(recon), nrow=n)
    log.info("wrote %s", os.path.join(out_dir, "vqvae_recon.png"))

    if args.save_latents or tc.get("save_latents"):
        latent_dir = os.path.join(out_dir, tc["vqvae_latent_dir_name"])

        def latent_iter():
            dl = DataLoader(ds, batch_size=args.batch_size, shuffle=False,
                            drop_last=False, num_shards=1, shard_index=0)
            i = 0
            for batch in dl.epoch(0):
                z = np.asarray(encode_fn(state, batch))
                for j in range(z.shape[0]):
                    yield ds.images[i], z[j]
                    i += 1

        count = save_latent_shards(latent_dir, latent_iter())
        log.info("saved %d latents to %s", count, latent_dir)
    return out_dir


def main():
    parser = argparse.ArgumentParser(description="Arguments for vq vae inference")
    parser.add_argument("--config", dest="config", default="celebhq")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--save-latents", action="store_true")
    parser.add_argument("--num-samples", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--output-root", default="runs")
    infer(parser.parse_args())


if __name__ == "__main__":
    main()
