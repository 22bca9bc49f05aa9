"""Mesh + sharding utilities: the TPU-native replacement for the reference's
torch.distributed DDP layer.

The reference does data parallelism only (SURVEY.md §2.7): DDP with
per-process NCCL ranks, DistributedSampler, explicit loss all_reduce
(train_ddpm_cond_celebhq_multi_gpu.py:257-263, 380-388, 439-466). Here the
whole of that machinery is: a 1-D ``Mesh(('data',))`` over all chips, batch
arrays sharded on the 'data' axis, parameters replicated, and ``jit``
inserting the gradient all-reduce automatically. Multi-host runs call
``jax.distributed.initialize`` before ``make_mesh``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: call once per host before make_mesh.

    The TPU-native replacement for the reference's mp.spawn +
    MASTER_ADDR/PORT rendezvous (train_ddpm_cond_celebhq_multi_gpu.py:
    439-466): on TPU pods jax.distributed.initialize() discovers everything
    from the environment; explicit args cover DCN clusters. Returns the
    process count. Safe to call on a single host (no-op)."""
    if jax.process_count() > 1:
        return jax.process_count()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        pass  # single-process / already initialized
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Device mesh over the first ``n_devices`` devices (all by default).

    1-D ('data',) covers the reference's DDP workloads. Multi-axis meshes
    (e.g. ('data', 'model') for tensor parallelism — see parallel/tp.py)
    take ``axis_sizes``; with it omitted, all devices go to the LAST axis
    and leading axes get size 1."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available — a silently smaller "
                f"mesh would change the parallelism the caller asked for")
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        dev_array = np.asarray(devices)
    else:
        if axis_sizes is None:
            axis_sizes = [1] * (len(axis_names) - 1) + [len(devices)]
        assert int(np.prod(axis_sizes)) == len(devices), (
            f"axis_sizes {axis_sizes} must multiply to {len(devices)}")
        dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def make_mesh_for_batch(batch_size: int,
                        axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the largest device count that divides
    ``batch_size`` (XLA sharding requires divisibility); tiny debug batches
    then simply use fewer chips."""
    n = len(jax.devices())
    use = next(d for d in range(min(n, batch_size), 0, -1)
               if batch_size % d == 0)
    return make_mesh(use, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis on 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated (params, opt state, schedules)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_stacked_batch(mesh: Mesh, tree):
    """Device-put a pytree of stacked (S, B, ...) arrays — S fused train
    steps of B samples (LdmTrainer.train_multi_step layout) — with the
    BATCH (second) axis sharded on 'data' and the step axis replicated.
    One transfer per flush instead of per-batch device_puts + on-device
    stacks: each host->device round trip costs ~30 ms on the relay-attached
    chip (PERF.md), so the S-batch feed path collapses to a single put."""
    def put(x):
        nd = np.ndim(x)
        spec = P(None, "data", *([None] * (nd - 2))) if nd >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
