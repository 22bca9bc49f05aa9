"""Per-layer op-count analyzer CLI with attention matmul accounting.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.ops_analyzer
--model dit_12l [--batch 1] [--json report.json]``

Re-implements reference Model_DiT_9L_ops_analyzer.py (284 LoC): hook-based
per-layer mul/add/bias op counting including the attention QK^T and AV
matmuls (reference: :40-110), JSON report, plus the ACIM-vs-DMAC energy
summary from the harness (progressive_qn_train.py:240-389).
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.cim.progressive import ProgressiveTrain
from stablediffusion_pytorch_tpu.models import DIT, Unet
from stablediffusion_pytorch_tpu.tools.train_qat import MODEL_PRESETS


def attention_ops(model, seq_len: int) -> dict:
    """Analytic QK^T + AV matmul ops per attention module
    (reference: Model_DiT_9L_ops_analyzer.py:60-100).

    ``seq_len`` is the token count at the model's finest attention level;
    for UNets with attention at several resolutions this upper-bounds the
    coarser levels (32^2 vs 16^2/8^2) — exact for DiT, conservative for
    UNet."""
    out = {}
    from stablediffusion_pytorch_tpu.cim.progressive import _walk
    from stablediffusion_pytorch_tpu.models.common import MultiheadAttention
    from stablediffusion_pytorch_tpu.models.dit import Attention

    for path, _, _, m in _walk(model):
        if isinstance(m, Attention):
            h, d = m.n_heads, m.head_dim
            qk = h * seq_len * seq_len * d
            av = h * seq_len * seq_len * d
            out[path] = {"qk_muls": qk, "av_muls": av,
                         "attention_muls": qk + av}
        elif isinstance(m, MultiheadAttention):
            h, d = m.num_heads, m.head_dim
            qk = h * seq_len * seq_len * d
            out[path] = {"qk_muls": qk, "av_muls": qk,
                         "attention_muls": 2 * qk}
    return out


def analyze(model, example_input, *args, seq_len: int = 256, **kwargs) -> dict:
    pt = ProgressiveTrain(model)
    ops = pt.gen_ops_dict(example_input, *args, **kwargs)
    attn = attention_ops(model, seq_len)
    energy = pt.get_energy_dict(ops)
    total_ops = sum(o["ops"] for o in ops.values())
    total_attn = sum(a["attention_muls"] for a in attn.values())
    return {
        "total_layer_ops": total_ops,
        "total_attention_muls": total_attn,
        "total_acim_energy_j": sum(e["acim_energy_j"]
                                   for e in energy.values()),
        "total_dmac_energy_j": sum(e["dmac_energy_j"]
                                   for e in energy.values()),
        "layers": ops,
        "attention": attn,
        "energy": energy,
    }


def main():
    parser = argparse.ArgumentParser(description="Per-layer ops analyzer")
    parser.add_argument("--model", choices=sorted(MODEL_PRESETS),
                        default="dit_9l")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    cfg = MODEL_PRESETS[args.model]()
    z = cfg.autoencoder_params["z_channels"]
    if "dit_model_config" in cfg:
        model = DIT(z, dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
        patch = cfg.dit_model_config["patch_size"]
        seq_len = (32 // patch) ** 2
    else:
        model = Unet(z, dict(cfg.diffusion_model_config), rngs=nnx.Rngs(0))
        seq_len = 32 * 32

    x = jnp.zeros((args.batch, 32, 32, z))
    cond = {"image": jnp.zeros((args.batch, 512, 512, 18))}
    report = analyze(model, x, jnp.zeros((args.batch,), jnp.int32), cond,
                     seq_len=seq_len)
    print(f"total layer ops:        {report['total_layer_ops']:.3e}")
    print(f"total attention muls:   {report['total_attention_muls']:.3e}")
    print(f"ACIM energy / forward:  {report['total_acim_energy_j']:.3e} J")
    print(f"DMAC energy / forward:  {report['total_dmac_energy_j']:.3e} J")
    top = sorted(report["layers"].items(), key=lambda kv: -kv[1]["ops"])[:10]
    print("top-10 layers by ops:")
    for name, o in top:
        print(f"  {name:55s} {o['ops']:.3e}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2, default=float)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
