"""Sampling CLI covering all four reference samplers:

  * unconditional        (reference: tools/sample_ddpm_vqvae.py)
  * class-conditional    (tools/sample_ddpm_class_cond.py:57-67 CFG)
  * text-conditional     (tools/sample_ddpm_text_cond.py)
  * text+mask            (tools/sample_ddpm_text_image_cond.py:22-109)

Usage: ``python -m stablediffusion_pytorch_tpu.tools.sample_ddpm
--config celebhq_text_image_cond --ckpt <denoiser> --vqvae-ckpt <vqvae>
[--prompt "..."] [--class-id K] [--sampler ddpm|ddim|dpm] [--steps N]
[--cf-guidance-scale S]``

The reverse loop runs as one jitted lax.scan (DDPM full-T or DDIM few-step,
CFG folded in); only the final latent is decoded through the VQVAE
(reference decodes at t=0 only, sample_ddpm_text_image_cond.py:94-98).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.data.text import (
    get_text_representation, get_tokenizer_and_model,
)
from stablediffusion_pytorch_tpu.schedulers import (
    ddim_sample, ddpm_sample, make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.tools.common import (
    build_dataset, build_denoiser, build_vqvae, latent_hw, load_config,
    seed_everything,
)
from stablediffusion_pytorch_tpu.training.checkpoint import load_model
from stablediffusion_pytorch_tpu.utils.image_utils import save_image_grid

log = logging.getLogger("sdtpu")


def sample(args) -> np.ndarray:
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    dp = dict(cfg.diffusion_params)
    key = seed_everything(args.seed if args.seed is not None
                          else tc.get("seed", 1111))

    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])
    condition_config = dict(cfg.ldm_params).get("condition_config")
    condition_types = (condition_config or {}).get("condition_types", [])

    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else None
    model = build_denoiser(cfg, dtype=dtype)
    if args.ckpt:
        load_model(args.ckpt, model)
    vqvae = build_vqvae(cfg, dtype=dtype)
    if args.vqvae_ckpt:
        load_model(args.vqvae_ckpt, vqvae)

    n = args.num_samples or tc.get("num_samples", 1)
    hw = latent_hw(cfg)
    z = cfg.autoencoder_params["z_channels"]

    # ---- build cond / uncond inputs ----
    cond: Optional[dict] = None
    uncond: Optional[dict] = None
    guidance = args.cf_guidance_scale
    if guidance is None:
        guidance = tc.get("cf_guidance_scale", 1.0)
    use_cfg = condition_types and guidance is not None and guidance > 1.0

    tokenizer = text_model = None
    if condition_types:
        cond, uncond = {}, {}
        if "text" in condition_types:
            tokenizer, text_model = get_tokenizer_and_model(
                condition_config["text_condition_config"].get(
                    "text_embed_model", "clip"),
                weights_path=args.text_weights)
            prompt = args.prompt or "a photograph of a face"
            cond["text"] = jnp.repeat(get_text_representation(
                [prompt], tokenizer, text_model), n, axis=0)
            uncond["text"] = jnp.repeat(get_text_representation(
                [""], tokenizer, text_model), n, axis=0)
        if "image" in condition_types:
            icc = condition_config["image_condition_config"]
            mask_hw = (icc["image_condition_h"], icc["image_condition_w"])
            if args.mask_from_dataset:
                ds = build_dataset(cfg, condition_config=condition_config)
                idx = np.random.randint(len(ds))
                _, c = ds[idx]
                mask = jnp.asarray(c["image"])[None]
            else:
                mask = jnp.zeros((1, *mask_hw,
                                  icc["image_condition_input_channels"]))
            from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
                resize_mask_to_latent,
            )

            mask = resize_mask_to_latent(jnp.repeat(mask, n, axis=0), hw)
            cond["image"] = mask
            uncond["image"] = jnp.zeros_like(mask)
        if "class" in condition_types:
            num_classes = condition_config["class_condition_config"]["num_classes"]
            if args.class_id is not None and args.class_id < 0:
                # mixed grid: cycle through all classes (row-per-class when
                # num_grid_rows == num_classes), reference
                # sample_ddpm_class_cond.py:57-60 samples random classes
                cls = jnp.arange(n) % num_classes
            else:
                cls = jnp.full((n,), args.class_id
                               if args.class_id is not None else 0)
            cond["class"] = jax.nn.one_hot(cls, num_classes)
            uncond["class"] = jnp.zeros_like(cond["class"])

    graphdef, state = nnx.split(model)

    # the denoiser state is threaded through jit as an ARGUMENT (not a
    # closure): closed-over weights become HLO constants, and at the 256^2
    # flagship size that compile payload exceeds the axon relay's request
    # limit (observed HTTP 413 on remote_compile)
    def make_model_fn(st):
        def model_fn(xt, t, c=None):
            m = nnx.merge(graphdef, st)
            return m(xt, t, c) if c is not None else m(xt, t)
        return model_fn

    key, k_init, k_loop = jax.random.split(key, 3)
    xt = jax.random.normal(k_init, (n, hw, hw, z),
                           dtype or jnp.float32)

    kwargs = dict(cond=cond, uncond=uncond if use_cfg else None,
                  guidance_scale=guidance if use_cfg else None)
    save_traj = getattr(args, "save_trajectory", False)
    if args.sampler == "dpm":
        # DPM-Solver++(2M): deterministic, ~4-5x fewer model calls than
        # DDIM for the same quality (beyond-reference sampler)
        from stablediffusion_pytorch_tpu.schedulers import dpm_solver_sample

        x0 = jax.jit(lambda st, x: dpm_solver_sample(
            make_model_fn(st), sched, x, steps=args.steps,
            method=args.method, **kwargs))(state, xt)
        traj = None
    elif args.sampler == "ddim":
        res = jax.jit(lambda st, x, k: ddim_sample(
            make_model_fn(st), sched, x, k, steps=args.steps,
            method=args.method, eta=args.eta,
            return_trajectory=save_traj, **kwargs))(state, xt, k_loop)
        x0, traj = (res if save_traj else (res, None))
    else:
        res = jax.jit(lambda st, x, k: ddpm_sample(
            make_model_fn(st), sched, x, k, return_trajectory=save_traj,
            **kwargs))(state, xt, k_loop)
        x0, traj = ((res[0], res[1][1]) if save_traj else (res, None))

    vq_graphdef, vq_state = nnx.split(vqvae)
    imgs = jax.jit(lambda s, z_: nnx.merge(vq_graphdef, s).decode(z_))(
        vq_state, x0)
    imgs = np.asarray(jnp.clip(imgs, -1, 1))

    out_path = os.path.join(args.output_root, tc["task_name"], "samples",
                            f"sample_{args.sampler}.png")
    save_image_grid(out_path, list(imgs),
                    nrow=tc.get("num_grid_rows", min(8, n)))
    log.info("wrote %s", out_path)

    from stablediffusion_pytorch_tpu.utils.provenance import (
        build_stamp, write_sidecar,
    )

    write_sidecar(out_path,
                  build_stamp(tokenizer=tokenizer, text_model=text_model),
                  sampler=args.sampler, steps=args.steps,
                  guidance=float(guidance), config=args.config,
                  ckpt=args.ckpt or None, vqvae_ckpt=args.vqvae_ckpt or None)

    if traj is not None:
        # per-step x0/latent grids in the latent's first 3 channels, the
        # reference's per-step grid dumps
        # (tools/sample_ddpm_text_image_cond.py:94-107)
        traj_dir = os.path.join(args.output_root, tc["task_name"], "samples",
                                f"trajectory_{args.sampler}")
        stride = max(1, traj.shape[0] // 20)
        for i in range(0, traj.shape[0], stride):
            frame = np.asarray(jnp.clip(traj[i][..., :3], -1, 1),
                               np.float32)
            save_image_grid(os.path.join(traj_dir, f"step_{i:04d}.png"),
                            list(frame), nrow=min(8, n))
        log.info("wrote %d trajectory grids to %s",
                 len(range(0, traj.shape[0], stride)), traj_dir)
    return imgs


def main():
    parser = argparse.ArgumentParser(description="Arguments for ddpm sampling")
    parser.add_argument("--config", dest="config",
                        default="celebhq_text_image_cond")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--vqvae-ckpt", default=None)
    parser.add_argument("--text-weights", default=None)
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"],
                        default="ddpm")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--method", choices=["linear", "quadratic"],
                        default="quadratic")
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument("--prompt", default=None)
    parser.add_argument("--class-id", type=int, default=None)
    parser.add_argument("--mask-from-dataset", action="store_true")
    parser.add_argument("--cf-guidance-scale", type=float, default=None)
    parser.add_argument("--num-samples", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--save-trajectory", action="store_true",
                        help="dump per-step grids (reference behavior)")
    parser.add_argument("--bf16", action="store_true",
                        help="sample in bfloat16 (~2x on TPU; see PERF.md)")
    parser.add_argument("--output-root", default="runs")
    sample(parser.parse_args())


if __name__ == "__main__":
    main()
