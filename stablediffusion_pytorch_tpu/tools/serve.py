"""Serve a trained text/mask/class-conditional LDM over HTTP.

Usage::

  python -m stablediffusion_pytorch_tpu.tools.serve \
      --config celebhq_text_image_cond --ckpt <denoiser-ckpt> \
      --vqvae-ckpt <vqvae-ckpt> --port 8000 --max-batch 8 --steps 50

Then::

  curl -s localhost:8000/generate -d '{"prompt": "a face with blond hair",
      "seed": 7}' -o out.png
  curl -s localhost:8000/healthz

Production replacement for the reference's per-image GUI samplers
(/root/reference/GUI_image_generator.py and siblings): concurrent HTTP
requests coalesce into fixed-shape TPU batches through one compiled
program — see serving/engine.py for the design contract.
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp

from stablediffusion_pytorch_tpu.serving import InferenceEngine, make_server
from stablediffusion_pytorch_tpu.tools.common import (
    build_denoiser, build_vqvae, load_config,
)
from stablediffusion_pytorch_tpu.training.checkpoint import load_model

log = logging.getLogger("sdtpu")


def build_engine(args) -> InferenceEngine:
    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if args.bf16 else None
    model = build_denoiser(cfg, dtype=dtype)
    if args.ckpt:
        load_model(args.ckpt, model)
    vqvae = build_vqvae(cfg, dtype=dtype)
    if args.vqvae_ckpt:
        load_model(args.vqvae_ckpt, vqvae)

    tokenizer = text_model = None
    cc = dict(cfg.ldm_params).get("condition_config") or {}
    if "text" in cc.get("condition_types", []):
        from stablediffusion_pytorch_tpu.data.text import (
            get_tokenizer_and_model,
        )

        tokenizer, text_model = get_tokenizer_and_model(
            cc["text_condition_config"].get("text_embed_model", "clip"),
            weights_path=args.text_weights)
    if getattr(args, "continuous", False):
        # chunked continuous batching (serving/continuous.py): admit at
        # chunk boundaries instead of coalescing into fixed passes
        if args.mesh_devices:
            raise ValueError("--continuous is single-device for now; drop "
                             "--mesh-devices or use the fixed engine")
        from stablediffusion_pytorch_tpu.serving import SlotEngine

        return SlotEngine(
            cfg, model, vqvae, tokenizer, text_model,
            slots=args.max_batch, steps=args.steps, chunk=args.chunk,
            method=args.method, guidance=args.cf_guidance_scale, dtype=dtype)
    mesh = None
    if args.mesh_devices:
        from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)
    return InferenceEngine(
        cfg, model, vqvae, tokenizer, text_model,
        max_batch=args.max_batch, steps=args.steps, method=args.method,
        guidance=args.cf_guidance_scale, dtype=dtype, mesh=mesh)


def main():
    parser = argparse.ArgumentParser(description="LDM inference server")
    parser.add_argument("--config", default="celebhq_text_image_cond")
    parser.add_argument("--ckpt", default="")
    parser.add_argument("--vqvae-ckpt", default="")
    parser.add_argument("--text-weights", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--mesh-devices", type=int, default=0,
                        help="serve data-parallel over the first N devices "
                             "(0 = single device); max-batch must divide")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--method", default="linear")
    parser.add_argument("--cf-guidance-scale", type=float, default=2.0)
    parser.add_argument("--window-ms", type=float, default=50.0,
                        help="batching window after the first request")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--continuous", action="store_true",
                        help="chunked continuous batching (SlotEngine): "
                             "admit requests at chunk boundaries instead "
                             "of coalescing fixed passes")
    parser.add_argument("--chunk", type=int, default=10,
                        help="DDIM steps per tick with --continuous "
                             "(must divide --steps)")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip the compile-at-boot warmup call")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    engine = build_engine(args)
    if not args.no_warmup:
        log.info("warmup (compiles the serving program)...")
        log.info("warmup done in %.1fs", engine.warmup())
    srv = make_server(engine, args.host, args.port,
                      window_s=args.window_ms / 1000.0)
    log.info("serving on http://%s:%d (batch<=%d, steps=%d)",
             *srv.server_address, args.max_batch, args.steps)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.batcher.close()


if __name__ == "__main__":
    main()
