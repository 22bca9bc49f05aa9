"""ZeRO-1 optimizer-state sharding over the data axis.

Plain data parallelism replicates the Adam moments (2× params) and the EMA
tree (1× params) on every chip, so optimizer memory dominates HBM for large
models. ZeRO-1 keeps the *parameters* replicated (forward/backward are
unchanged DP) but shards the optimizer state and EMA across the 'data' mesh
axis: each chip stores 1/N of every moment tensor and updates its slice;
XLA's SPMD partitioner inserts the dynamic-slice on the (all-reduced)
gradients and the all-gather back to replicated parameters automatically.

This is the jax.sharding expression of the idea — no parameter-server code,
no manual reduce-scatter: placing the moment/EMA arrays with a sharded
``NamedSharding`` *is* the implementation, and ``jit`` compiles the
collectives around it (the same mechanism the DP/TP/PP paths use; the
collectives ride ICI on a real pod).

The reference has no equivalent (its DDP replicates optimizer state on
every rank — train_ddpm_cond_celebhq_multi_gpu.py keeps a full Adam per
process); this is a beyond-parity scaling feature.

Composability: moments that already carry a tensor-parallel sharding from
``apply_tp_sharding`` (they inherit it when the optimizer is built AFTER
the TP placement) are left alone — re-placing them on 'data' would undo
the TP layout. Only replicated leaves are sharded.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def zero1_spec(shape: Tuple[int, ...], n_shards: int,
               axis_name: str = "data") -> P:
    """PartitionSpec sharding the LARGEST divisible dim over ``axis_name``.

    Returns a fully-replicated spec when no dim divides ``n_shards`` (tiny
    biases, scalars) — those leaves stay replicated; the memory win comes
    from the big kernels, which always have an MXU-friendly divisible dim.
    """
    if not shape or n_shards <= 1:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % n_shards == 0
                 and shape[d] >= n_shards]
    if not divisible:
        return P()
    best = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def _is_replicated(x) -> bool:
    s = getattr(x, "sharding", None)
    if s is None:
        return True
    try:
        return s.is_fully_replicated
    except AttributeError:  # committed single-device arrays
        return True


def shard_tree_zero1(tree, mesh: Mesh, axis: str = "data"):
    """device_put every replicated float leaf with its zero1_spec sharding.

    Returns ``(new_tree, n_sharded)``. Leaves already sharded (e.g. TP
    moments), integer counters, and indivisible shapes pass through.
    """
    n = int(mesh.shape[axis])
    count = 0

    def place(x):
        nonlocal count
        if not isinstance(x, jax.Array) or not np.issubdtype(x.dtype,
                                                             np.floating):
            return x
        if not _is_replicated(x):
            return x  # TP/PP placement wins — don't undo it
        spec = zero1_spec(x.shape, n, axis)
        if spec == P():
            return x
        count += 1
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree), count


def apply_zero1(trainer, mesh: Mesh, axis: str = "data",
                include_ema: bool = True) -> int:
    """Shard a trainer's optimizer state (and EMA tree) over ``axis``.

    Works on any trainer exposing ``optimizer`` (nnx.Optimizer) and
    optionally ``ema_params`` (an nnx State), i.e. LdmTrainer and
    VqvaeTrainer. Call it AFTER construction and BEFORE the first step so
    the jitted step compiles against the sharded layouts. Returns the
    number of sharded leaves.
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    state = nnx.state(trainer.optimizer)
    state, n = shard_tree_zero1(state, mesh, axis)
    nnx.update(trainer.optimizer, state)
    if include_ema and getattr(trainer, "ema_params", None) is not None:
        trainer.ema_params, n_ema = shard_tree_zero1(trainer.ema_params,
                                                     mesh, axis)
        n += n_ema
    return n
