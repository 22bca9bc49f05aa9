"""Round-3 on-chip probe: is the flagship's GEMM efficiency a schedule
deficiency (claimable win) or a shape-imposed ceiling (the floor)?

v2 — SLOPE-BASED protocol. The v1 run (runs_perf_r3/gemm_probe.jsonl,
2026-08-18) was invalidated by its own numbers: every dispatch took
29-36 ms wall regardless of shape (h=256..512, 257 GFLOP..1.3 TFLOP per
call), i.e. the ~25-30 ms relay round-trip (PERF.md: dispatch alone is
~25 ms/step on relay-attached chips) dominated and the probe measured
the RELAY, not the MXU. v2 times each program at two scan lengths
(S_LO, S_HI) and takes the slope

    t(S) = overhead + per_iter * S  =>  per_iter = (t_hi - t_lo)/(S_HI - S_LO)

which cancels the fixed dispatch/relay cost exactly. The intercept is
reported too — it IS the relay overhead measurement, per program.

Hypothesis under test (PERF.md round-2 ablation left it open): the
reference DiT hidden size H=288 (/root/reference/Model_DiT_12L_config.py:125-133)
pads to ceil(288/128)=3 MXU tiles on every contraction/output dim it
appears in — a 288/384=75% ceiling per padded dim, ~56% when K and N
both pad. If the slope-measured MXU fraction at h=288 brackets that,
the PERF.md "1.7 ms 100%-MXU floor" is unattainable at the reference
shape and the honest floor is the measured GEMM time + attention
geometric floor.

Also slope-measures the FULL flagship DiT-12L forward step (the bench.py
program) so the true on-chip ms/step is separated from the per-dispatch
relay cost baked into bench.py's headline (50 steps/dispatch).

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
S_LO, S_HI = 40, 400
R = 5               # reps per scan length (median)
PEAK_TFLOPS = 197.0  # v5e bf16


def _timed(fn, *args) -> float:
    """Median wall seconds of R calls, HOST FETCH each.

    On the tunneled axon TPU, ``jax.block_until_ready`` returns before
    execution completes (bench.py docstring; re-confirmed 2026-08-18 —
    a v2 probe run using it measured slope ~0 for 3200 chained GEMMs).
    Only an actual device->host fetch is an honest sync here.
    """
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1, :1])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _slope(make_chain, flops_per_iter: float, *args) -> dict:
    """Compile the chain at S_LO and S_HI, time both, return slope stats."""
    lo, hi = make_chain(S_LO), make_chain(S_HI)
    np.asarray(lo(*args)[:1, :1])   # compile + warm (host fetch)
    np.asarray(hi(*args)[:1, :1])
    t_lo, t_hi = _timed(lo, *args), _timed(hi, *args)
    per_iter = (t_hi - t_lo) / (S_HI - S_LO)
    overhead_ms = (t_lo - per_iter * S_LO) * 1e3
    tflops = flops_per_iter / per_iter / 1e12
    return {"tflops": round(tflops, 1),
            "mxu_frac": round(tflops / PEAK_TFLOPS, 3),
            "per_iter_us": round(per_iter * 1e6, 1),
            "dispatch_overhead_ms": round(overhead_ms, 1)}


def measure_square(h: int) -> dict:
    """Chained (M,h)x(h,h) GEMMs, bf16 — serialized data dependency, as in
    a transformer residual stream."""
    x = jax.random.normal(jax.random.PRNGKey(0), (M, h), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (h, h), jnp.float32)
         / np.sqrt(h)).astype(jnp.bfloat16)

    def make_chain(s):
        @jax.jit
        def chain(x, w):
            def body(c, _):
                for _ in range(G):
                    c = c @ w
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=s)
            return c
        return chain

    pad = -(-h // 128) * 128
    out = _slope(make_chain, 2.0 * M * h * h * G, x, w)
    out["shape"] = f"({M},{h})x({h},{h}) bf16 x{G}/iter"
    out["padding_ceiling"] = round((h / pad) ** 2, 3)
    return out


def measure_mlp_pair() -> dict:
    """The flagship MLP pair (288 -> 1152 -> 288): only K or N pads per
    GEMM (1152 = 9*128 is aligned), predicted ceiling 75% each."""
    h, f = 288, 1152
    x = jax.random.normal(jax.random.PRNGKey(0), (M, h), jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.PRNGKey(1), (h, f), jnp.float32)
          / np.sqrt(h)).astype(jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.PRNGKey(2), (f, h), jnp.float32)
          / np.sqrt(f)).astype(jnp.bfloat16)

    def make_chain(s):
        @jax.jit
        def chain(x, w1, w2):
            def body(c, _):
                for _ in range(G // 2):
                    c = (c @ w1) @ w2
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=s)
            return c
        return chain

    out = _slope(make_chain, 2.0 * M * h * f * G, x, w1, w2)
    out["shape"] = f"MLP pair ({M},{h})<->({M},{f}) bf16 x{G // 2}/iter"
    out["padding_ceiling"] = 0.75
    return out


def measure_flagship_step() -> dict:
    """Slope-measure the bench.py program itself (DiT-12L fwd, b32,
    32x32x4 latents, latent-res mask) so the true on-chip ms/step is
    separated from the relay dispatch cost inside bench's headline."""
    from flax import nnx

    from stablediffusion_pytorch_tpu.config import presets
    from stablediffusion_pytorch_tpu.models import DIT

    # EXACTLY the bench.py worker program (construction, dtype, chaining)
    cfg = presets.model_dit_12l()
    model = DIT(4, dict(cfg.dit_model_config), rngs=nnx.Rngs(0),
                dtype=jnp.bfloat16)
    graphdef, state = nnx.split(model)
    b = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 32, 32, 4),
                          jnp.bfloat16)
    t = jnp.full((b,), 500, jnp.int32)
    mask = jnp.zeros((b, 32, 32, 18), jnp.bfloat16)

    def make_chain(s):
        @jax.jit
        def chain(state, x):
            m = nnx.merge(graphdef, state)

            def body(carry, _):
                out = m(carry, t, {"image": mask})
                return carry + 0.01 * out, None

            out, _ = jax.lax.scan(body, x, None, length=s)
            return out
        return chain

    lo, hi = make_chain(S_LO), make_chain(S_HI)
    np.asarray(lo(state, x)[:1, :1])
    np.asarray(hi(state, x)[:1, :1])
    t_lo, t_hi = _timed(lo, state, x), _timed(hi, state, x)
    per_step = (t_hi - t_lo) / (S_HI - S_LO)
    return {
        "shape": "DiT-12L fwd step b32 (bench.py program)",
        "onchip_ms_per_step": round(per_step * 1e3, 3),
        "onchip_fwd_per_s": round(1.0 / per_step, 1),
        "dispatch_overhead_ms": round((t_lo - per_step * S_LO) * 1e3, 1),
        "bench_headline_note": "bench.py divides by 50-step dispatches, "
                               "so its fwd/s = 1/(per_step + overhead/50)",
    }


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "protocol": f"slope t(S_HI={S_HI})-t(S_LO={S_LO}), "
                                  f"{G} GEMMs/iter, median of {R}"}),
          flush=True)
    for h in (256, 288, 320, 384, 512):
        print(json.dumps(measure_square(h)), flush=True)
    print(json.dumps(measure_mlp_pair()), flush=True)
    print(json.dumps(measure_flagship_step()), flush=True)


if __name__ == "__main__":
    main()
