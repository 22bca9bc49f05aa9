"""Offline FID-set generation: sample one image per dataset condition pair.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.
batch_condition_image_generator --config celebhq_text_image_cond
--ckpt <denoiser> --vqvae-ckpt <vqvae> --out-dir fid_samples [--limit N]``

Re-implements reference batch_condition_image_generator{,_single,_all}.py
(480/478/670 LoC): iterate the dataset's (text, mask) condition pairs, DDIM
sampling (quadratic schedule) with the CFG wrapper, resume by computing
pending indices from existing output files
(reference: _compute_pending_indices batch_condition_image_generator.py:
40-220), multi-device fan-out via the data mesh instead of nn.DataParallel
(_all.py:148-149, 427-447).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from PIL import Image

from stablediffusion_pytorch_tpu.data.text import (
    get_text_representation, get_tokenizer_and_model,
)
from stablediffusion_pytorch_tpu.schedulers import (
    ddim_sample, make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_denoiser, build_vqvae, latent_hw, load_config,
    seed_everything,
)
from stablediffusion_pytorch_tpu.training.checkpoint import load_model
from stablediffusion_pytorch_tpu.utils.image_utils import to_uint8

log = logging.getLogger("sdtpu")


def _compute_pending_indices(out_dir: str, total: int) -> List[int]:
    """Resume support: indices without an output file yet
    (reference: batch_condition_image_generator.py resume logic)."""
    done = set()
    if os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(".png"):
                try:
                    done.add(int(os.path.splitext(f)[0]))
                except ValueError:
                    pass
    return [i for i in range(total) if i not in done]


def generate(args):
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    dp = dict(cfg.diffusion_params)
    key = seed_everything(args.seed if args.seed is not None
                          else tc.get("seed", 1111))

    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])
    condition_config = dict(cfg.ldm_params).get("condition_config") or {}
    condition_types = condition_config.get("condition_types", [])

    model = build_denoiser(cfg)
    if args.ckpt:
        load_model(args.ckpt, model)
    vqvae = build_vqvae(cfg)
    if args.vqvae_ckpt:
        load_model(args.vqvae_ckpt, vqvae)

    tokenizer = text_model = None
    if "text" in condition_types:
        tokenizer, text_model = get_tokenizer_and_model(
            "clip", weights_path=args.text_weights)
        empty_embed = get_text_representation([""], tokenizer, text_model)

    ds = build_dataset(cfg, condition_config=condition_config or None)
    total = min(len(ds), args.limit) if args.limit else len(ds)
    pending = _compute_pending_indices(args.out_dir, total)
    os.makedirs(args.out_dir, exist_ok=True)
    log.info("%d/%d images pending", len(pending), total)

    graphdef, state = nnx.split(model)
    vq_graphdef, vq_state = nnx.split(vqvae)

    hw = latent_hw(cfg)
    z = cfg.autoencoder_params["z_channels"]
    guidance = args.cf_guidance_scale

    # model/vqvae state are jit ARGUMENTS: closed-over weights become HLO
    # constants, which blows the axon relay's compile-request size limit
    # at the 256^2 flagship model size (HTTP 413)
    @jax.jit
    def sample_batch(st, vq_st, xt, k, cond, uncond):
        def model_fn(x_, t_, c_):
            return nnx.merge(graphdef, st)(x_, t_, c_)
        x0 = ddim_sample(model_fn, sched, xt, k, steps=args.steps,
                         method="quadratic", cond=cond,
                         uncond=uncond if guidance > 1 else None,
                         guidance_scale=guidance if guidance > 1 else None)
        return nnx.merge(vq_graphdef, vq_st).decode(x0)

    bs = args.batch_size
    for s in range(0, len(pending), bs):
        idxs = pending[s:s + bs]
        real = len(idxs)
        conds, unconds = [], []
        for i in idxs:
            item = ds[i]
            _, c = item if isinstance(item, tuple) else (item, {})
            conds.append(c)
        batch_cond, batch_uncond = {}, {}
        if "text" in condition_types:
            texts = [c["text"] for c in conds]
            emb = get_text_representation(texts, tokenizer, text_model)
            batch_cond["text"] = emb
            batch_uncond["text"] = jnp.repeat(empty_embed, real, axis=0)
        if "image" in condition_types:
            from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
                resize_mask_to_latent,
            )

            masks = jnp.asarray(np.stack([c["image"] for c in conds]))
            masks = resize_mask_to_latent(masks, hw)
            batch_cond["image"] = masks
            batch_uncond["image"] = jnp.zeros_like(masks)
        if "class" in condition_types:
            ncls = condition_config["class_condition_config"]["num_classes"]
            ids = np.asarray([int(c["class"]) for c in conds])
            oh = jax.nn.one_hot(jnp.asarray(ids), ncls)
            batch_cond["class"] = oh
            # CFG null class = zero one-hot, matching the training dropout
            # (utils.diffusion_utils.drop_class_condition multiplies by 0)
            batch_uncond["class"] = jnp.zeros_like(oh)
        # pad to full batch for stable compile shapes
        if real < bs:
            pad = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], bs - real, axis=0)])
            batch_cond = {k: pad(v) for k, v in batch_cond.items()}
            batch_uncond = {k: pad(v) for k, v in batch_uncond.items()}
        key, k1, k2 = jax.random.split(key, 3)
        xt = jax.random.normal(k1, (bs, hw, hw, z))
        imgs = np.asarray(jnp.clip(sample_batch(state, vq_state, xt, k2,
                                                batch_cond,
                                                batch_uncond), -1, 1))[:real]
        for i, img in zip(idxs, imgs):
            Image.fromarray(to_uint8(img)).save(
                os.path.join(args.out_dir, f"{i}.png"))
        log.info("generated %d/%d", min(s + bs, len(pending)), len(pending))

    # stamp the generated FID set with which encoders were real vs fallback
    # (VERDICT W6 — a set produced with the hash text encoder must never
    # read as reference-comparable)
    from stablediffusion_pytorch_tpu.utils.provenance import (
        build_stamp, write_sidecar,
    )

    write_sidecar(os.path.join(args.out_dir, "generation"),
                  build_stamp(tokenizer=tokenizer, text_model=text_model),
                  config=args.config, steps=args.steps,
                  guidance=float(guidance), count=len(pending))
    return args.out_dir


def main():
    parser = argparse.ArgumentParser(description="Batch FID-set generation")
    parser.add_argument("--config", default="celebhq_text_image_cond")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--vqvae-ckpt", default=None)
    parser.add_argument("--text-weights", default=None)
    parser.add_argument("--out-dir", default="fid_samples")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--cf-guidance-scale", type=float, default=0.8)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None,
                        help="sampling seed (default: config seed) — "
                             "distinct seeds give independent FID sets for "
                             "seed-variance error bars")
    generate(parser.parse_args())


if __name__ == "__main__":
    main()
