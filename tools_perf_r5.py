"""Round-5 measured perf row (VERDICT r4 #4): remat step time ON-CHIP.

PERF.md round-4 measured remat's memory effect via compiled.memory_analysis
(7.1x less temp HBM) but only *inferred* the step-time cost (~+40% upper
bound from the fwd slope). This measures it: the real LdmTrainer grad step
(DiT-12L flagship, batch 32, 32x32x4 bf16 latents, image-mask conditioning,
Adam + EMA + grad clip + non-finite skip — training/ldm.py) timed with and
without gradient checkpointing, S steps chained in ONE dispatch
(train_multi_step) so the relay's ~30 ms round trip is amortized exactly as
production training amortizes it (tools/train_ddpm_cond.py --steps-per-call).

Writes one JSON report with both rows and the measured remat cost ratio.
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def measure(remat: bool, scan_steps: int, reps: int) -> dict:
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from stablediffusion_pytorch_tpu.config import presets
    from stablediffusion_pytorch_tpu.models import DIT
    from stablediffusion_pytorch_tpu.schedulers import (
        make_compvis_linear_schedule,
    )
    from stablediffusion_pytorch_tpu.training import LdmTrainer

    cfg = presets.model_dit_12l()
    dp = dict(cfg.diffusion_params)
    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])
    model = DIT(4, dict(cfg.dit_model_config), rngs=nnx.Rngs(0),
                dtype=jnp.bfloat16)
    if remat:
        model.remat = True
    cc = dict(cfg.condition_config)
    trainer = LdmTrainer(model, sched, lr=1e-4, condition_config=cc)

    B, S = 32, scan_steps
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((S, B, 32, 32, 4), np.float32)
    cond = {"image": np.zeros((S, B, 32, 32, 18), np.float32)}
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    np.asarray(trainer.train_multi_step(lat, cond, key))  # compile + warmup
    compile_s = time.perf_counter() - t0

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        losses = trainer.train_multi_step(lat, cond, key)
        np.asarray(losses)  # host sync
        rates.append(S / (time.perf_counter() - t0))
    med = sorted(rates)[len(rates) // 2]
    return {
        "remat": remat,
        "train_steps_per_sec": round(med, 3),
        "ms_per_step": round(1000.0 / med, 3),
        "steps_per_dispatch": S,
        "batch": B,
        "compile_warmup_s": round(compile_s, 1),
        "rates": [round(r, 3) for r in rates],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs_evidence_r5/perf_remat_r5.json")
    p.add_argument("--scan-steps", type=int, default=16)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from stablediffusion_pytorch_tpu.utils.xla_cache import (
        configure_persistent_cache,
    )
    configure_persistent_cache(jax, jax.default_backend())

    base = measure(False, args.scan_steps, args.reps)
    print(json.dumps(base), flush=True)
    re = measure(True, args.scan_steps, args.reps)
    print(json.dumps(re), flush=True)

    report = {
        "metric": "flagship_grad_step_remat_cost",
        "unit": "train steps/sec (DiT-12L, batch 32, 32x32x4 bf16, "
                "image-cond, Adam+EMA grad step)",
        "backend": jax.default_backend(),
        "baseline": base,
        "remat": re,
        "remat_step_time_ratio": round(
            base["train_steps_per_sec"] / re["train_steps_per_sec"], 3),
        "note": "ratio is the measured remat cost; PERF.md round-4 bounded "
                "it at <=1.4x from the fwd slope + memory_analysis "
                "(7.1x less temp HBM)",
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"remat_step_time_ratio":
                      report["remat_step_time_ratio"]}), flush=True)


if __name__ == "__main__":
    main()
