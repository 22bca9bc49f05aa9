"""Round-5 measured memory rows (VERDICT r4 #4): SP and ZeRO-1 per-device.

PERF.md round-4 *modeled* the SP and ZeRO-1 memory effects ("drop to 1/N",
"shards the residual stream") without a measured row. This measures both on
the 8-device mesh (virtual CPU devices — the same mesh the multichip dryrun
and the whole tests/ suite validate numerics on; XLA's buffer assignment is
per-device and backend-independent for these shapes):

* **SP** — `compiled.memory_analysis()` of the flagship DiT-12L grad step
  (jax.grad of the MSE, the exact protocol of the round-4 remat row) on a
  (data=2, model=4) mesh at the 512²-image scale (64×64×4 latents → 1024
  tokens/image), with tensor-parallel weight shardings, sp_constraint OFF
  vs ON. The delta is the per-device activation scratch the residual-stream
  token sharding saves.
* **ZeRO-1** — no compile needed: the concrete per-device bytes of the
  Adam moments + EMA tree (sum of `addressable_shards[0]` nbytes) on the
  8-way data mesh, `apply_zero1` OFF vs ON. This is direct measurement of
  real arrays, not a model.

Writes one JSON report with both tables for PERF.md.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mib(n: int) -> float:
    return round(n / (1024 * 1024), 1)


def measure_sp(batch: int = 8) -> dict:
    from stablediffusion_pytorch_tpu.config import presets
    from stablediffusion_pytorch_tpu.models import DIT
    from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
    from stablediffusion_pytorch_tpu.parallel.sp import apply_sp
    from stablediffusion_pytorch_tpu.parallel.tp import apply_tp_sharding

    mesh = make_mesh(8, ("data", "model"), axis_sizes=(2, 4))
    cfg = presets.model_dit_12l()

    rows = {}
    for sp in (False, True):
        model = DIT(4, dict(cfg.dit_model_config), rngs=nnx.Rngs(0),
                    dtype=jnp.bfloat16)
        n_tp = apply_tp_sharding(model, mesh)
        if sp:
            apply_sp(model, mesh)
        graphdef, state = nnx.split(model)

        def loss_fn(st, x, t, cond, noise):
            pred = nnx.merge(graphdef, st)(x, t, cond)
            return jnp.mean((pred - noise) ** 2)

        grad_fn = jax.jit(jax.grad(loss_fn))
        data_sh = NamedSharding(mesh, P("data"))
        x = jax.ShapeDtypeStruct((batch, 64, 64, 4), jnp.bfloat16,
                                 sharding=data_sh)
        t = jax.ShapeDtypeStruct((batch,), jnp.int32, sharding=data_sh)
        cond = {"image": jax.ShapeDtypeStruct((batch, 64, 64, 18),
                                              jnp.bfloat16,
                                              sharding=data_sh)}
        noise = x
        compiled = grad_fn.lower(state, x, t, cond, noise).compile()
        ma = compiled.memory_analysis()
        rows["sp" if sp else "tp_only"] = {
            "sp_constraint": sp,
            "n_tp_params": n_tp,
            "temp_MiB_per_device": _mib(ma.temp_size_in_bytes),
            "peak_MiB_per_device": _mib(ma.peak_memory_in_bytes),
            "argument_MiB_per_device": _mib(ma.argument_size_in_bytes),
            "output_MiB_per_device": _mib(ma.output_size_in_bytes),
        }
        print(json.dumps({("sp" if sp else "tp_only"):
                          rows["sp" if sp else "tp_only"]}), flush=True)
    rows["temp_ratio_sp_vs_tp"] = round(
        rows["tp_only"]["temp_MiB_per_device"]
        / max(rows["sp"]["temp_MiB_per_device"], 1e-9), 2)
    rows["shape"] = (f"DiT-12L bf16, batch {batch} (data=2 x model=4 mesh), "
                     f"64x64x4 latents (512^2-image scale, 1024 tokens), "
                     f"64x64x18 mask, jax.grad of MSE")
    return rows


def measure_zero1() -> dict:
    from stablediffusion_pytorch_tpu.config import presets
    from stablediffusion_pytorch_tpu.models import DIT
    from stablediffusion_pytorch_tpu.parallel.zero import apply_zero1
    from stablediffusion_pytorch_tpu.schedulers import (
        make_compvis_linear_schedule,
    )
    from stablediffusion_pytorch_tpu.training import LdmTrainer

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = presets.model_dit_12l()
    dp = dict(cfg.diffusion_params)
    sched = make_compvis_linear_schedule(dp["num_timesteps"],
                                         dp["beta_start"], dp["beta_end"])

    def per_device_bytes(tree) -> int:
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array):
                total += leaf.addressable_shards[0].data.nbytes
        return total

    rows = {}
    for z in (False, True):
        model = DIT(4, dict(cfg.dit_model_config), rngs=nnx.Rngs(0),
                    dtype=jnp.bfloat16)
        if not z:
            # replicate over the mesh so both cases are mesh-placed
            repl = NamedSharding(mesh, P())
            nnx.update(model, jax.tree.map(
                lambda x: jax.device_put(x, repl), nnx.state(model)))
        trainer = LdmTrainer(model, sched, lr=1e-4,
                             condition_config=dict(cfg.condition_config))
        n_sharded = 0
        if z:
            n_sharded = apply_zero1(trainer, mesh)
        else:
            repl = NamedSharding(mesh, P())
            for tree in (nnx.state(trainer.optimizer), trainer.ema_params):
                pass  # already replicated via the model placement
        opt_b = per_device_bytes(nnx.state(trainer.optimizer))
        ema_b = per_device_bytes(trainer.ema_params)
        rows["zero1" if z else "replicated"] = {
            "zero1": z, "n_sharded_leaves": n_sharded,
            "optimizer_state_MiB_per_device": _mib(opt_b),
            "ema_MiB_per_device": _mib(ema_b),
            "total_MiB_per_device": _mib(opt_b + ema_b),
        }
        print(json.dumps({("zero1" if z else "replicated"):
                          rows["zero1" if z else "replicated"]}), flush=True)
    rows["ratio"] = round(
        rows["replicated"]["total_MiB_per_device"]
        / max(rows["zero1"]["total_MiB_per_device"], 1e-9), 2)
    rows["shape"] = ("DiT-12L bf16 params; Adam moments + EMA on an 8-way "
                     "data mesh; bytes are addressable_shards[0] (real "
                     "arrays, not a model)")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs_evidence_r5/perf_mem_sp_zero_r5.json")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from stablediffusion_pytorch_tpu.utils.xla_cache import (
        configure_persistent_cache,
    )
    configure_persistent_cache(jax, jax.default_backend())

    zero = measure_zero1()
    sp = measure_sp(args.batch)
    report = {
        "metric": "sp_zero1_per_device_memory",
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "sp": sp,
        "zero1": zero,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"temp_ratio_sp_vs_tp": sp["temp_ratio_sp_vs_tp"],
                      "zero1_ratio": zero["ratio"]}), flush=True)


if __name__ == "__main__":
    main()
