"""Slope-protocol step-time A/B: reference DiT-9L geometry (h=288, 9x32
heads) vs the TPU-MXU-aligned DiT-9La (h=256, 8x32 heads).

PERF.md round 3 proved the h=288 GEMMs sit at a 66% MXU padding ceiling
(288 = 2.25x128 pads to 3 tiles) while h=256 runs at 98.9% — this probe
measures what that means for the WHOLE model step at the production shape
(batch 32, 32^2x4 latents, mask cond), not just isolated GEMMs. Honest
axon-relay measurement per PERF.md: iterations chained in ONE jitted
lax.scan, params passed as jit args, host fetch to sync, rate from the
SLOPE between a short and a long scan (cancels the ~30ms dispatch), median
of reps. Reference geometry: /root/reference/Model_DiT_9L_config.py:145-153.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dit_aligned_probe.py [out.json]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.config.loader import load_config
from stablediffusion_pytorch_tpu.models import DIT
from stablediffusion_pytorch_tpu.utils.xla_cache import (
    configure_persistent_cache,
)

configure_persistent_cache(jax, "tpu")

BATCH = 32
SHORT, LONG = 50, 250
REPS = 5


def build(cfg_name):
    cfg = load_config(cfg_name)
    model = DIT(4, dict(cfg.dit_model_config), rngs=nnx.Rngs(0),
                dtype=jnp.bfloat16)
    graphdef, state = nnx.split(model)

    def chain(steps):
        @jax.jit
        def run(state, x, t, mask, text):
            m = nnx.merge(graphdef, state)

            def body(carry, _):
                out = m(carry, t, {"image": mask, "text": text})
                return carry + 0.01 * out, None

            x, _ = jax.lax.scan(body, x, None, length=steps)
            return x

        return run

    nparams = sum(int(np.prod(v.shape))
                  for v in jax.tree.leaves(nnx.state(model, nnx.Param)))
    return state, chain(SHORT), chain(LONG), nparams


def measure(name):
    state, run_s, run_l, nparams = build(name)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, 32, 32, 4), jnp.bfloat16)
    t = jnp.full((BATCH,), 500, jnp.int32)
    mask = jnp.zeros((BATCH, 32, 32, 18), jnp.bfloat16)
    # text context at the production shape (77-token CLIP sequence)
    text = jnp.zeros((BATCH, 77, 512), jnp.bfloat16)
    # warm both programs (first relay compile is slow, cached after)
    np.asarray(run_s(state, x, t, mask, text)[:1])
    np.asarray(run_l(state, x, t, mask, text)[:1])
    slopes = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(run_s(state, x, t, mask, text)[:1])
        t1 = time.perf_counter()
        np.asarray(run_l(state, x, t, mask, text)[:1])
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (LONG - SHORT))
    ms = float(np.median(slopes) * 1e3)
    return {"model": name, "params": nparams, "step_ms": round(ms, 4),
            "fwd_per_s": round(1e3 / ms, 1), "batch": BATCH,
            "protocol": f"slope {SHORT}->{LONG} scan steps, median of {REPS}"}


def main():
    out = {}
    for name in ("synthface256_dit9", "synthface256_dit9a"):
        out[name] = measure(name)
        print(json.dumps(out[name]), flush=True)
    a, b = out["synthface256_dit9"], out["synthface256_dit9a"]
    out["aligned_speedup"] = round(a["step_ms"] / b["step_ms"], 3)
    out["param_ratio"] = round(b["params"] / a["params"], 3)
    print(json.dumps({"aligned_speedup": out["aligned_speedup"],
                      "param_ratio": out["param_ratio"]}), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
