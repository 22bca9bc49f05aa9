"""Multi-process distributed launch — the executable leg of L6.

The reference really spawns one process per device and rendezvouses over
MASTER_ADDR/PORT (train_ddpm_cond_celebhq_multi_gpu.py:439-466, mp.spawn +
dist.init_process_group). The TPU-native equivalent is
``jax.distributed.initialize`` against a coordinator, after which
``jax.devices()`` is the *global* device list and a batch assembled with
``jax.make_array_from_process_local_data`` is one logical array sharded
across processes; ``jit`` inserts the gradient all-reduce exactly as in the
single-process mesh path.

This module is both the library entry (``run_worker``) and a ``python -m``
worker so tests can actually exercise the multi-process rendezvous on CPU
(2 processes × 1 local device) without TPU hardware — the leg the reference
never had a test for (SURVEY.md §4 "Distributed: none").

Launch (per process)::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=1 \
    python -m stablediffusion_pytorch_tpu.parallel.multiprocess \
        --coordinator localhost:12345 --num-processes 2 --process-id 0 \
        --out /tmp/rank0.json
"""

from __future__ import annotations

import argparse
import json
from typing import Optional


def run_worker(coordinator: Optional[str], num_processes: int,
               process_id: int, batch: int = 8, seed: int = 0) -> dict:
    """One deterministic all-reduced LDM train step on this process's shard.

    Returns {loss, grad_norm, param_fingerprint, num_processes, process_id}.
    The full (global) batch is seeded identically everywhere; each process
    feeds only its contiguous shard, so a single-process run with the same
    seed must produce bit-comparable results (up to reduction order).
    """
    import jax

    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from stablediffusion_pytorch_tpu.models import DIT
    from stablediffusion_pytorch_tpu.parallel.mesh import (
        data_sharding, make_mesh, )
    from stablediffusion_pytorch_tpu.schedulers import (
        make_compvis_linear_schedule, )
    from stablediffusion_pytorch_tpu.training import LdmTrainer

    assert jax.device_count() % num_processes == 0
    mesh = make_mesh()

    tiny = {"hidden_size": 32, "patch_size": 2, "timestep_emb_dim": 16,
            "num_layers": 2, "num_heads": 4, "head_dim": 8}
    model = DIT(4, tiny, rngs=nnx.Rngs(seed))
    sched = make_compvis_linear_schedule(20, 0.0015, 0.0195)
    trainer = LdmTrainer(model, sched, lr=1e-3, ema_decay=0.999)

    # Deterministic global batch; this process materializes only its shard
    # (the reference's DistributedSampler partition, celeb_dataset via
    # DistributedSampler in multi_gpu.py:172-180).
    rng = np.random.default_rng(seed + 1)
    full = rng.standard_normal((batch, 8, 8, 4), dtype=np.float32)
    sharding = data_sharding(mesh, full.ndim)
    if num_processes > 1:
        per = batch // num_processes
        local = full[process_id * per:(process_id + 1) * per]
        latents = jax.make_array_from_process_local_data(sharding, local)
    else:
        latents = jax.device_put(full, sharding)

    key = jax.random.key(seed + 2)
    metrics = trainer.train_step(latents, None, key)

    # Param fingerprint: reduction over replicated params — identical on
    # every process iff the all-reduced update matched.
    params = nnx.state(trainer.model, nnx.Param)
    fp = sum(float(jnp.sum(jnp.abs(x.astype(jnp.float32))))
             for x in jax.tree.leaves(params))
    return {
        "loss": float(metrics["loss"]),
        "grad_norm": float(metrics["grad_norm"]),
        "param_fingerprint": fp,
        "num_processes": num_processes,
        "process_id": process_id,
        "global_devices": jax.device_count(),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (jax coordinator)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write result JSON here")
    args = p.parse_args()
    res = run_worker(args.coordinator, args.num_processes, args.process_id,
                     args.batch, args.seed)
    line = json.dumps(res)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
