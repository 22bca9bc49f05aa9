"""Sequence parallelism: shard the DiT residual stream's token axis.

With tensor parallelism (parallel/tp.py) the attention/MLP *weights* are
sharded over 'model', but the activations between layers — the residual
stream, the LayerNorms, the adaLN modulations — are replicated across the
TP group: every chip stores the full (B, N, H) tensor. Megatron-style
sequence parallelism shards that token axis N over the same 'model' axis
for the segments between the matmul blocks, cutting peak activation HBM by
the TP degree and turning the TP all-reduce into reduce-scatter +
all-gather pairs.

The GSPMD expression of it: a single ``jax.lax.with_sharding_constraint``
on the residual stream at every layer boundary (DIT.__call__). The
partitioner propagates the layout through the elementwise/norm segments
and inserts the gather/scatter collectives around the attention and MLP
contractions itself — no manual ppermute schedule, and the computation is
numerically identical (constraints are layout hints, not ops; parity is
tested).

The reference has no equivalent (single-GPU activations); this is a
beyond-parity scaling feature that composes with --tp.
"""

from __future__ import annotations

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_sharding(mesh: Mesh, data_axis: str = "data",
                model_axis: str = "model") -> NamedSharding:
    """(B, N, H) residual-stream sharding: batch over data, tokens over
    the TP axis, hidden replicated."""
    for ax in (data_axis, model_axis):
        if ax not in mesh.axis_names:
            raise ValueError(f"mesh has no '{ax}' axis: {mesh.axis_names}")
    return NamedSharding(mesh, P(data_axis, model_axis, None))


def apply_sp(model: nnx.Module, mesh: Mesh, data_axis: str = "data",
             model_axis: str = "model") -> NamedSharding:
    """Enable sequence-parallel residual sharding on a DIT.

    Sets ``model.sp_constraint``; DIT.__call__ applies it between
    transformer layers. The token count must divide mesh.shape[model_axis]
    (DiT grids do: N = (im/patch)^2 is a power of two). Returns the
    sharding for callers that want to pre-place inputs.
    """
    sh = sp_sharding(mesh, data_axis, model_axis)
    model.sp_constraint = sh
    return sh
