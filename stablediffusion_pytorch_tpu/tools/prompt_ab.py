"""Prompt-steering A/B evidence: does text conditioning actually steer?

Holds everything fixed — one dataset mask, one set of initial noise
latents, one checkpoint — and samples the SAME latents under two (or more)
contrasting prompts. If the text path carries signal end-to-end, the
groups must separate; if the mask alone explains the samples, they won't
(VERDICT r2 W6: "text conditioning is never shown to condition anything").

Reference analogue: sample_ddpm_text_image_cond_celebhq.py:41-290 samples
prompt+mask pairs but never isolates the prompt's causal effect; this tool
is the controlled experiment the reference lacks.

Two quantitative separations, both written to ``ab_report.json``:

* **region color** — the conditioning mask says which pixels are hair /
  cloth (CELEB_MASK_LABELS), and the procedural captions name their
  colors, so mean RGB over the region directly measures the steered
  attribute. Separation score is a d'-style ratio: distance between group
  mean colors / pooled within-group RMS deviation.
* **feature space** — mean between-group vs within-group pairwise L2
  distance under the framework FID extractor (provenance-stamped; the
  extractor substitution status rides the report).

Usage::

    python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
      --config synthface_text_image_cond --ckpt <ema> --vqvae-ckpt <vq> \
      --prompts "This person has long black hair.|This person has long blond hair." \
      --region hair --num-per-prompt 8 --cf-guidance-scale 4.0
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.data.datasets import CELEB_MASK_LABELS
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
from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
    nearest_resize, resize_mask_to_latent,
)
from stablediffusion_pytorch_tpu.utils.image_utils import save_image_grid

log = logging.getLogger("sdtpu")


def _pick_mask(ds, region_idx: int, index: int | None,
               min_frac: float = 0.02):
    """A fixed conditioning mask; if no index given, the first one whose
    target region covers >= min_frac of the frame (a 'bald' mask has no
    hair pixels to measure)."""
    if index is not None:
        _, c = ds[index]
        return np.asarray(c["image"]), index
    for i in range(len(ds)):
        _, c = ds[i]
        m = np.asarray(c["image"])
        if m[..., region_idx].mean() >= min_frac:
            return m, i
    raise SystemExit(
        f"no dataset mask has region '{CELEB_MASK_LABELS[region_idx]}' "
        f">= {min_frac:.0%} of the frame; pass --mask-index")


def _region_means(images01: np.ndarray, region_mask_hw: np.ndarray):
    """Per-sample mean RGB in [0,1] over the region's pixels."""
    w = region_mask_hw[None, :, :, None]  # (1, H, W, 1)
    denom = max(w.sum(), 1.0)
    return (images01 * w).sum(axis=(1, 2)) / denom


def _pairwise_mean_dist(a: np.ndarray, b: np.ndarray | None = None) -> float:
    """Mean pairwise L2 distance, within one set or between two sets."""
    if b is None:
        n = len(a)
        if n < 2:
            return 0.0
        d = [float(np.linalg.norm(a[i] - a[j]))
             for i in range(n) for j in range(i + 1, n)]
    else:
        d = [float(np.linalg.norm(x - y)) for x in a for y in b]
    return float(np.mean(d)) if d else 0.0


def run(args) -> dict:
    cfg = load_config(args.config)
    tc = dict(cfg.train_params)
    dp = dict(cfg.diffusion_params)
    key = seed_everything(args.seed)

    condition_config = dict(cfg.ldm_params)["condition_config"]
    ctypes = condition_config["condition_types"]
    assert "text" in ctypes and "image" in ctypes, (
        "prompt A/B needs a text+image conditioned config")

    prompts = [p.strip() for p in args.prompts.split("|") if p.strip()]
    assert len(prompts) >= 2, "--prompts needs >= 2 '|'-separated prompts"

    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])
    model = build_denoiser(cfg)
    load_model(args.ckpt, model)
    vqvae = build_vqvae(cfg)
    load_model(args.vqvae_ckpt, vqvae)

    region_idx = CELEB_MASK_LABELS.index(args.region)
    ds = build_dataset(cfg, condition_config=condition_config)
    mask_np, mask_idx = _pick_mask(ds, region_idx, args.mask_index)
    log.info("fixed mask: dataset index %d (%s coverage %.1f%%)", mask_idx,
             args.region, 100 * mask_np[..., region_idx].mean())

    n = args.num_per_prompt
    hw = latent_hw(cfg)
    z = cfg.autoencoder_params["z_channels"]
    im_size = cfg.dataset_params["im_size"]

    mask_lat = resize_mask_to_latent(
        jnp.repeat(jnp.asarray(mask_np)[None], n, axis=0), hw)
    # region indicator at image resolution for the color metric
    region_hw = np.asarray(nearest_resize(
        jnp.asarray(mask_np)[None], im_size, im_size))[0, :, :, region_idx]

    tcc = condition_config["text_condition_config"]
    tokenizer, text_model = get_tokenizer_and_model(
        tcc.get("text_embed_model", "clip"), weights_path=args.text_weights)
    empty = get_text_representation([""], tokenizer, text_model)
    uncond = {"text": jnp.repeat(empty, n, axis=0),
              "image": jnp.zeros_like(mask_lat)}

    graphdef, state = nnx.split(model)

    # identical initial noise for every group: the prompt is the ONLY
    # difference between groups
    key, k_init, k_loop = jax.random.split(key, 3)
    xt = jax.random.normal(k_init, (n, hw, hw, z))

    # denoiser state is a jit ARGUMENT: closed-over weights become HLO
    # constants, exceeding the axon relay's compile-request limit at the
    # 256^2 flagship model size (HTTP 413)
    @jax.jit
    def sample_group(st, x, k, text_emb):
        def model_fn(x_, t_, c_=None):
            return nnx.merge(graphdef, st)(x_, t_, c_)
        cond = {"text": text_emb, "image": mask_lat}
        return ddim_sample(model_fn, sched, x, k, steps=args.steps,
                           method=args.method, eta=0.0, cond=cond,
                           uncond=uncond,
                           guidance_scale=args.cf_guidance_scale)

    vq_graphdef, vq_state = nnx.split(vqvae)
    decode = jax.jit(lambda s, z_: nnx.merge(vq_graphdef, s).decode(z_))

    out_dir = os.path.join(args.output_root, tc["task_name"], "prompt_ab")
    groups01 = []
    for gi, prompt in enumerate(prompts):
        emb = jnp.repeat(get_text_representation([prompt], tokenizer,
                                                 text_model), n, axis=0)
        x0 = sample_group(state, xt, k_loop, emb)
        imgs = np.asarray(jnp.clip(decode(vq_state, x0), -1, 1))
        imgs01 = (imgs + 1.0) / 2.0
        groups01.append(imgs01)
        save_image_grid(os.path.join(out_dir, f"group_{gi}.png"),
                        list(imgs01 * 2.0 - 1.0), nrow=min(8, n))
        log.info("group %d (%r): grid written", gi, prompt)

    # side-by-side sheet: row per group, same column = same initial noise
    rows = [im * 2.0 - 1.0 for g in groups01 for im in g]
    sheet = os.path.join(out_dir, "ab_sheet.png")
    save_image_grid(sheet, rows, nrow=n)

    # ---- metric 1: region mean color ----
    means = [_region_means(g, region_hw) for g in groups01]  # (n,3) each
    centers = [m.mean(axis=0) for m in means]
    within_rms = float(np.sqrt(np.mean(
        [np.sum((m - c) ** 2, axis=-1).mean()
         for m, c in zip(means, centers)])))
    color = {
        "region": args.region,
        "group_mean_rgb": [c.tolist() for c in centers],
        "between_group_dist": float(np.linalg.norm(centers[0] - centers[1])),
        "within_group_rms": within_rms,
        "separation": float(np.linalg.norm(centers[0] - centers[1])
                            / max(within_rms, 1e-8)),
    }

    # ---- metric 2: feature-space separation ----
    from stablediffusion_pytorch_tpu.analysis.fid import default_extractor

    extractor = default_extractor(args.fid_weights)
    feats = [extractor(g.astype(np.float32)) for g in groups01]
    within = np.mean([_pairwise_mean_dist(f) for f in feats])
    between = _pairwise_mean_dist(feats[0], feats[1])
    feature = {
        "between_group_mean_dist": float(between),
        "within_group_mean_dist": float(within),
        "ratio": float(between / max(within, 1e-8)),
    }

    from stablediffusion_pytorch_tpu.utils.provenance import (
        build_stamp, write_sidecar,
    )

    report = {
        "prompts": prompts,
        "mask_index": int(mask_idx),
        "num_per_prompt": n,
        "guidance_scale": args.cf_guidance_scale,
        "steps": args.steps,
        "seed": args.seed,
        "ckpt": args.ckpt,
        "region_color": color,
        "feature_space": feature,
        "steered": bool(color["separation"] > 2.0 and feature["ratio"] > 1.1),
    }
    path = os.path.join(out_dir, "ab_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    write_sidecar(path, build_stamp(tokenizer=tokenizer,
                                    text_model=text_model,
                                    fid_extractor=extractor),
                  config=args.config)
    log.info("A/B report: %s", json.dumps(report["region_color"]))
    log.info("wrote %s", path)
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="synthface_text_image_cond")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--vqvae-ckpt", required=True)
    p.add_argument("--text-weights", default=None)
    p.add_argument("--fid-weights", default=None)
    p.add_argument("--prompts", default=(
        "This person has long black hair and brown eyes.|"
        "This person has long blond hair and blue eyes."))
    p.add_argument("--region", default="hair", choices=CELEB_MASK_LABELS)
    p.add_argument("--mask-index", type=int, default=None)
    p.add_argument("--num-per-prompt", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--method", choices=["linear", "quadratic"],
                   default="quadratic")
    p.add_argument("--cf-guidance-scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--output-root", default="runs")
    args = p.parse_args()
    run(args)


if __name__ == "__main__":
    main()
