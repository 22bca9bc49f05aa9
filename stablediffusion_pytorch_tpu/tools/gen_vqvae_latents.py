"""Offline latent precompute CLI.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents
--config celebhq --ckpt <vqvae> [--batch-size N]``

Re-implements reference gen_vqvae_latents.py:19-107 (and the
nn.DataParallel multi-GPU variant gen_vqvae_latents_multi_GPU.py:94): encode
every dataset image through the trained VQVAE and pickle
``{image_path: latent}`` in 1000-image shards. Multi-chip fan-out comes from
sharding the encode batch over the data mesh instead of DataParallel.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.data import DataLoader, save_latent_shards
from stablediffusion_pytorch_tpu.parallel import make_mesh_for_batch, shard_batch
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_vqvae, load_config, seed_everything,
)
from stablediffusion_pytorch_tpu.training.checkpoint import load_model

log = logging.getLogger("sdtpu")


def generate(args) -> str:
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    seed_everything(tc.get("seed", 1111))

    model = build_vqvae(cfg)
    if args.ckpt:
        load_model(args.ckpt, model)
    graphdef, state = nnx.split(model)
    mesh = make_mesh_for_batch(args.batch_size)

    @jax.jit
    def encode_fn(state, im):
        m = nnx.merge(graphdef, state)
        z, _ = m.encode(im)
        return z

    ds = build_dataset(cfg)
    latent_dir = os.path.join(args.output_root, tc["task_name"],
                              tc["vqvae_latent_dir_name"])

    # pad the final batch so every compile sees one batch shape
    bs = args.batch_size

    def latent_iter():
        dl = DataLoader(ds, batch_size=bs, shuffle=False, drop_last=False,
                        num_shards=1, shard_index=0)
        i = 0
        for batch in dl.epoch(0):
            real = batch.shape[0]
            if real < bs:
                batch = np.concatenate(
                    [batch, np.zeros((bs - real, *batch.shape[1:]),
                                     batch.dtype)])
            z = np.asarray(encode_fn(state, shard_batch(mesh, batch)))[:real]
            for j in range(real):
                yield ds.images[i], z[j]
                i += 1

    count = save_latent_shards(latent_dir, latent_iter())
    log.info("saved %d latents to %s", count, latent_dir)
    return latent_dir


def main():
    parser = argparse.ArgumentParser(description="Generate VQVAE latents")
    parser.add_argument("--config", dest="config", default="celebhq")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--output-root", default="runs")
    generate(parser.parse_args())


if __name__ == "__main__":
    main()
