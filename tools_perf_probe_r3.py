"""Round-3 on-chip probe: is the flagship's ~60% MXU GEMM efficiency a
schedule deficiency (claimable win) or a shape-imposed ceiling (the floor)?

Hypothesis (PERF.md round-2 ablation left this open): the reference DiT
hidden size H=288 (/root/reference/Model_DiT_12L_config.py:125-133) pads to
ceil(288/128)=3 MXU tiles on every contraction/output dim it appears in —
a 288/384 = 75% ceiling per padded dim, ~56% when both K and N pad, which
brackets the measured ~60%. If true, the 1.7ms "100%-MXU floor" in PERF.md
is unattainable at the reference shape and the honest floor is the measured
GEMM time + attention geometric floor.

Protocol (PERF.md measurement rules): weights as jit args, G GEMMs chained
per scan iteration (amortizes the ~60us/iter scan overhead to ~7.5us/GEMM),
S iterations per dispatch, host fetch, median of R reps. Prints one JSON
line per shape: achieved TFLOP/s and fraction of the 197 TFLOP/s v5e bf16
peak, plus the padding-ceiling prediction for comparison.

Run on a QUIET chip (shared-chip variance ~2x): results feed PERF.md and
the task-3 verdict in VERDICT r2.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from stablediffusion_pytorch_tpu.utils.xla_cache import (
    configure_persistent_cache,
)

configure_persistent_cache(jax, "tpu")

M = 8192            # batch 32 x 256 patch tokens, the flagship GEMM M
G = 8               # GEMMs chained per scan iteration
S = 30              # scan iterations per dispatch
R = 5               # reps (median)
PEAK_TFLOPS = 197.0  # v5e bf16


def measure_square(h: int) -> dict:
    """Chained (M,h)x(h,h) GEMMs, bf16."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, h), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (h, h), jnp.float32)
         / np.sqrt(h)).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(c, _):
            for _ in range(G):
                c = c @ w
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=S)
        return c

    np.asarray(chain(x, w)[:1, :1])  # compile + warmup
    rates = []
    for _ in range(R):
        t0 = time.perf_counter()
        out = chain(x, w)
        np.asarray(out[:1, :1])
        dt = time.perf_counter() - t0
        flops = 2.0 * M * h * h * G * S
        rates.append(flops / dt / 1e12)
    tflops = sorted(rates)[len(rates) // 2]
    pad = -(-h // 128) * 128
    ceiling = (h / pad) ** 2  # K and N both pad; M=8192 is aligned
    return {
        "shape": f"({M},{h})x({h},{h}) bf16",
        "tflops": round(tflops, 1),
        "mxu_frac": round(tflops / PEAK_TFLOPS, 3),
        "padding_ceiling": round(ceiling, 3),
        "us_per_gemm": round(2.0 * M * h * h / (tflops * 1e12) * 1e6, 1),
    }


def measure_mlp_pair() -> dict:
    """The flagship MLP pair (288 -> 1152 -> 288): only K or N pads per
    GEMM (1152 = 9*128 is aligned), predicted ceiling 75% each."""
    h, f = 288, 1152
    x = jax.random.normal(jax.random.PRNGKey(0), (M, h), jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.PRNGKey(1), (h, f), jnp.float32)
          / np.sqrt(h)).astype(jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.PRNGKey(2), (f, h), jnp.float32)
          / np.sqrt(f)).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        def body(c, _):
            for _ in range(G // 2):
                c = (c @ w1) @ w2
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=S)
        return c

    np.asarray(chain(x, w1, w2)[:1, :1])
    rates = []
    for _ in range(R):
        t0 = time.perf_counter()
        out = chain(x, w1, w2)
        np.asarray(out[:1, :1])
        dt = time.perf_counter() - t0
        flops = 2.0 * M * h * f * 2 * (G // 2) * S
        rates.append(flops / dt / 1e12)
    tflops = sorted(rates)[len(rates) // 2]
    return {
        "shape": f"MLP pair ({M},{h})->({M},{f})->({M},{h}) bf16",
        "tflops": round(tflops, 1),
        "mxu_frac": round(tflops / PEAK_TFLOPS, 3),
        "padding_ceiling": 0.75,
    }


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "protocol": f"M={M}, {G} GEMMs/iter, {S} iters, "
                                  f"median of {R}"}), flush=True)
    for h in (256, 288, 320, 384, 512):
        print(json.dumps(measure_square(h)), flush=True)
    print(json.dumps(measure_mlp_pair()), flush=True)


if __name__ == "__main__":
    main()
