"""Model size analyzer CLI: per-layer parameter tables.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.size_analyzer
--model dit_12l|dit_9l|unet [--json out.json]``

Re-implements the reference's ldm_size_analyzer.py / dit_size_analyzer.py /
Model_*_size_analyzer.py family: walk the model, tabulate per-layer
parameter counts and shapes, print totals.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim.progressive import _walk
from stablediffusion_pytorch_tpu.models import DIT, Unet, VQVAE
from stablediffusion_pytorch_tpu.tools.train_qat import MODEL_PRESETS


def analyze(model: nnx.Module) -> dict:
    rows = []
    for path, _, _, m in _walk(model):
        params = {k: v for k, v in vars(m).items()
                  if isinstance(v, nnx.Param)}
        if not params:
            continue
        count = sum(int(np.prod(p[...].shape)) for p in params.values())
        rows.append({
            "layer": path,
            "type": type(m).__name__,
            "params": count,
            "shapes": {k: list(p[...].shape) for k, p in params.items()},
        })
    return {"total_params": sum(r["params"] for r in rows), "layers": rows}


def main():
    parser = argparse.ArgumentParser(description="Model size analyzer")
    parser.add_argument("--model", choices=sorted(MODEL_PRESETS) + ["vqvae"],
                        default="dit_12l")
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    if args.model == "vqvae":
        from stablediffusion_pytorch_tpu.config import load_config

        cfg = load_config("celebhq")
        model = VQVAE(3, dict(cfg.autoencoder_params), rngs=nnx.Rngs(0))
    else:
        cfg = MODEL_PRESETS[args.model]()
        z = cfg.autoencoder_params["z_channels"]
        if "dit_model_config" in cfg:
            model = DIT(z, dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
        else:
            model = Unet(z, dict(cfg.diffusion_model_config),
                         rngs=nnx.Rngs(0))

    report = analyze(model)
    print(f"{'layer':60s} {'type':28s} {'params':>12s}")
    for r in report["layers"]:
        print(f"{r['layer']:60s} {r['type']:28s} {r['params']:>12,d}")
    print(f"{'TOTAL':60s} {'':28s} {report['total_params']:>12,d}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
