"""GEMM-geometry floor probe for the DiT-12L flagship step (PERF.md).

Round-2's ablation measured the model's non-attention GEMMs at 1.65 ms/step
(~60% of bf16 peak) and derived a ~1.7 ms/step compute floor by assuming
those GEMMs could reach 100% MXU. This tool replaces that assumption with a
measurement: it times pure chained-GEMM programs at the exact DiT-12L
shapes (batch 32 x 256 tokens, hidden 288) against K/N-aligned control
shapes and a large aligned peak probe, so the flagship's GEMM time can be
compared against the *shape-imposed* ceiling rather than the datasheet
peak.

Geometry note (why the DiT shapes cannot hit 100%): the MXU contracts over
128-wide tiles, so a K=288 contraction is padded to 384 (75% useful work on
the K axis) and N=864 pads to 896 (96%); the hidden size is fixed by config
parity with the reference (`Model_DiT_12L_config.py:125-133`, hidden 288).

Methodology matches bench.py: K GEMM-pairs chained inside one jitted
`lax.scan` (x -> x @ W1 -> @ W2 back to the carry shape, so successive
iterations are data-dependent and cannot be elided), timed around a host
fetch of the final carry. Each measured "pair" is (M,K)x(K,N) + (M,N)x(N,K)
= 4*M*K*N FLOPs. bf16 operands, f32 accumulation (XLA default on TPU).

Prints one JSON line per shape: {name, M, K, N, tflops, ms_per_pair}.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, M, K, N). M = batch 32 x 256 tokens = 8192 rows for the DiT shapes.
SHAPES = [
    # the two dominant flagship GEMM families (models/dit.py)
    ("dit_mlp_288_1152", 8192, 288, 1152),   # MLP up/down pair, 4x hidden
    ("dit_qkv_288_864", 8192, 288, 864),     # fused QKV projection pair
    # K-aligned controls: same M, tile-aligned K/N
    ("ctrl_256_1024", 8192, 256, 1024),
    ("ctrl_384_1152", 8192, 384, 1152),
    ("ctrl_256_896", 8192, 256, 896),
    # aligned peak probe: what this chip+relay actually sustains
    ("peak_1024_1024", 8192, 1024, 1024),
]


@functools.partial(jax.jit, static_argnames=("steps",))
def _chain(x, w1, w2, steps: int):
    def body(carry, _):
        y = jnp.dot(carry, w1)        # (M,K)@(K,N)
        # cast back: keeps the carry bf16 so every pair feeds the MXU the
        # same operand dtypes (accumulation stays f32 inside each dot)
        return jnp.dot(y, w2).astype(carry.dtype), ()
    out, _ = jax.lax.scan(body, x, None, length=steps)
    return out


def measure(m: int, k: int, n: int, steps: int, reps: int) -> dict:
    key = jax.random.PRNGKey(0)
    kx, k1, k2 = jax.random.split(key, 3)
    x = jax.random.normal(kx, (m, k), jnp.bfloat16)
    w1 = jax.random.normal(k1, (k, n), jnp.bfloat16) * (1.0 / np.sqrt(k))
    w2 = jax.random.normal(k2, (n, k), jnp.bfloat16) * (1.0 / np.sqrt(n))
    _chain(x, w1, w2, steps).block_until_ready()  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(_chain(x, w1, w2, steps))      # host fetch = hard sync
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    flops = 4.0 * m * k * n * steps
    return {
        "tflops": round(flops / sec / 1e12, 1),
        "ms_per_pair": round(sec / steps * 1e3, 4),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--steps", type=int, default=200,
                   help="chained GEMM pairs per timed call")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    for name, m, k, n in SHAPES:
        r = measure(m, k, n, args.steps, args.reps)
        print(json.dumps({"name": name, "M": m, "K": k, "N": n, **r}),
              flush=True)


if __name__ == "__main__":
    main()
