"""Measure the PyTorch reference baseline for the flagship DiT-12L forward.

VERDICT.md round-1 item 6: the driver's ``vs_baseline`` field was null
because nothing had ever measured the torch reference pipeline. This tool
measures it, in this environment (CPU — no CUDA device exists here), with an
**independent eager-PyTorch implementation** of the reference DiT-12L
denoiser (same compute graph as /root/reference/models/transformer.py:43-213,
transformer_layer.py:6-106, attention.py:6-78, patch_embed.py:37-96 —
written from SURVEY.md §2.2, not copied):

  * channels-first eager torch, float32 (reference trains bf16-autocast on
    CUDA; on CPU autocast-bf16 is slower, so fp32 is the favourable-to-torch
    choice, documented in PERF.md)
  * per-forward 512^2 18-channel mask -> F.interpolate to latent res ->
    1x1 conv -> channel concat (transformer.py:85-95) — the as-reference
    workload of VERDICT W9
  * naive O(N^2) attention (attention.py:59-67), fused-QKV Linear

It also measures OUR JAX DiT-12L on the same CPU (same batch, fp32,
mask-at-512 config) so the iso-hardware software ratio is falsifiable.

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it to fill
``vs_baseline``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

BATCH = 32
LATENT = 32
Z = 4
HIDDEN = 288
LAYERS = 12
HEADS = 9
HEAD_DIM = 32
PATCH = 2
T_EMB = 288  # tc05 scaling time_emb_dim (presets._tc05_base)


def build_torch_model():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            att = HEADS * HEAD_DIM
            self.qkv = nn.Linear(HIDDEN, 3 * att)
            self.out = nn.Linear(att, HIDDEN)

        def forward(self, x):
            b, n, _ = x.shape
            q, k, v = self.qkv(x).chunk(3, dim=-1)
            q = q.view(b, n, HEADS, HEAD_DIM).transpose(1, 2)
            k = k.view(b, n, HEADS, HEAD_DIM).transpose(1, 2)
            v = v.view(b, n, HEADS, HEAD_DIM).transpose(1, 2)
            att = (q @ k.transpose(-2, -1)) / math.sqrt(HEAD_DIM)
            out = att.softmax(dim=-1) @ v
            return self.out(out.transpose(1, 2).reshape(b, n, -1))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(HIDDEN, elementwise_affine=False)
            self.norm2 = nn.LayerNorm(HIDDEN, elementwise_affine=False)
            self.attn = Attention()
            self.mlp = nn.Sequential(nn.Linear(HIDDEN, 4 * HIDDEN), nn.ReLU(),
                                     nn.Linear(4 * HIDDEN, HIDDEN))
            self.ada = nn.Linear(HIDDEN, 6 * HIDDEN)

        def forward(self, x, temb):
            m = self.ada(temb.relu())
            s1, sc1, g1, s2, sc2, g2 = m.chunk(6, dim=-1)
            x = x + g1[:, None] * self.attn(
                self.norm1(x) * (1 + sc1[:, None]) + s1[:, None])
            x = x + g2[:, None] * self.mlp(
                self.norm2(x) * (1 + sc2[:, None]) + s2[:, None])
            return x

    class TorchDiT(nn.Module):
        def __init__(self):
            super().__init__()
            self.cond_conv = nn.Conv2d(18, 3, 1, bias=False)
            patch_dim = PATCH * PATCH * (Z + 3)
            self.patch_proj = nn.Linear(patch_dim, HIDDEN)
            n_tok = (LATENT // PATCH) ** 2
            self.register_buffer("pos", torch.randn(1, n_tok, HIDDEN))
            self.t1 = nn.Linear(T_EMB, HIDDEN)
            self.t2 = nn.Linear(HIDDEN, HIDDEN)
            self.blocks = nn.ModuleList(Block() for _ in range(LAYERS))
            self.norm = nn.LayerNorm(HIDDEN, elementwise_affine=False)
            self.ada_out = nn.Linear(HIDDEN, 2 * HIDDEN)
            self.proj_out = nn.Linear(HIDDEN, PATCH * PATCH * Z)

        def forward(self, x, temb, mask):
            # per-step mask interp + 1x1 conv + concat (transformer.py:85-95)
            m = F.interpolate(mask, size=x.shape[-2:], mode="nearest")
            x = torch.cat([x, self.cond_conv(m)], dim=1)
            b, c, h, w = x.shape
            nh, nw = h // PATCH, w // PATCH
            # b c (nh ph)(nw pw) -> b (nh nw)(ph pw c)  (patch_embed.py:37-96)
            x = x.view(b, c, nh, PATCH, nw, PATCH).permute(0, 2, 4, 3, 5, 1)
            x = x.reshape(b, nh * nw, PATCH * PATCH * c)
            x = self.patch_proj(x) + self.pos
            temb = self.t2(self.t1(temb).relu())
            for blk in self.blocks:
                x = blk(x, temb)
            s, sc = self.ada_out(temb.relu()).chunk(2, dim=-1)
            x = self.norm(x) * (1 + sc[:, None]) + s[:, None]
            x = self.proj_out(x)
            x = x.view(b, nh, nw, PATCH, PATCH, Z).permute(0, 5, 1, 3, 2, 4)
            return x.reshape(b, Z, h, w)

    return TorchDiT().eval()


def measure_torch(iters: int, threads: int | None) -> float:
    import torch
    if threads:
        torch.set_num_threads(threads)
    model = build_torch_model()
    x = torch.randn(BATCH, Z, LATENT, LATENT)
    temb = torch.randn(BATCH, T_EMB)
    mask = torch.randn(BATCH, 18, 512, 512)
    with torch.no_grad():
        model(x, temb, mask)  # warmup
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y = model(x, temb, mask)
            times.append(time.perf_counter() - t0)
        float(y.sum())
    return float(np.median(times))


def measure_jax_cpu(iters: int) -> float:
    """Our DiT-12L on the same CPU, fp32, as-reference 512^2 mask config."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from stablediffusion_pytorch_tpu.config import presets
    from stablediffusion_pytorch_tpu.models import DIT

    cfg = presets.model_dit_12l()
    model = DIT(Z, dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, x, t, mask):
        return nnx.merge(graphdef, state)(x, t, {"image": mask})

    x = jnp.zeros((BATCH, LATENT, LATENT, Z))
    t = jnp.zeros((BATCH,), jnp.int32)
    mask = jnp.zeros((BATCH, 512, 512, 18))
    np.asarray(fwd(state, x, t, mask))[:1]  # warmup + compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fwd(state, x, t, mask)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--threads", type=int, default=None,
                    help="torch CPU threads (default: torch's default)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "BASELINE_MEASURED.json"))
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    torch_s = measure_torch(args.iters, args.threads)
    result = {
        "workload": ("DiT-12L forward, batch 32, 32x32x4 latents, "
                     "512^2 18-ch mask interpolated per step (as-reference)"),
        "hardware": "CPU (no CUDA device in this environment)",
        "torch_cpu_s_per_fwd": torch_s,
        "torch_cpu_fwd_per_s": BATCH and 1.0 / torch_s,
        "torch_cpu_img_per_s": BATCH / torch_s,
        "iters": args.iters,
    }
    if not args.skip_jax:
        jax_s = measure_jax_cpu(args.iters)
        result["jax_cpu_s_per_fwd"] = jax_s
        result["jax_cpu_img_per_s"] = BATCH / jax_s
        result["iso_hardware_speedup_jax_over_torch"] = torch_s / jax_s
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
