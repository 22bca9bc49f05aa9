"""Tensor parallelism for the denoisers (DiT and the UNet attention): Megatron-style param shardings
over a ('data', 'model') mesh.

The reference scales by data parallelism only (DDP; SURVEY.md §2.7) — on
TPU the natural next axis is sharding the transformer weights over ICI and
letting XLA's SPMD partitioner insert the collectives. This module only
ASSIGNS NamedShardings to parameters; no model code changes:

  * column-parallel: ``qkv_proj.kernel`` (H, 3A) and ``mlp_in.kernel``
    (H, F) split their output axis over 'model' (biases follow),
  * row-parallel: ``output_proj.kernel`` (A, H) and ``mlp_out.kernel``
    (F, H) split their input axis — XLA emits the Megatron all-reduce
    after each (the f/g pattern) on the 'model' axis,
  * everything else (LayerNorm-free adaLN, embeddings, patch/proj) is
    replicated.

With the batch sharded on 'data' and params sharded this way, one
``jit`` of the unchanged train step runs hybrid DP x TP; gradients of
replicated params are all-reduced over both axes automatically.
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, spec) — first match wins; paths are tuples of str keys from
# nnx.state. Column-parallel kernels shard axis 1, row-parallel shard axis 0.
_DIT_TP_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    # DiT fused-projection attention + MLP (models/dit.py)
    (("qkv_proj", "kernel"), P(None, "model")),
    (("qkv_proj", "bias"), P("model")),
    (("mlp_in", "kernel"), P(None, "model")),
    (("mlp_in", "bias"), P("model")),
    (("output_proj", "kernel"), P("model", None)),
    (("mlp_out", "kernel"), P("model", None)),
    # UNet separate-projection attention (models/common.py
    # MultiheadAttention): q/k/v column-parallel = heads split over
    # 'model' (requires num_heads % tp == 0), out row-parallel; the
    # UNet's convs/resnets stay replicated (the DP axis covers them)
    (("q_proj", "kernel"), P(None, "model")),
    (("q_proj", "bias"), P("model")),
    (("k_proj", "kernel"), P(None, "model")),
    (("k_proj", "bias"), P("model")),
    (("v_proj", "kernel"), P(None, "model")),
    (("v_proj", "bias"), P("model")),
    (("out_proj", "kernel"), P("model", None)),
)


def _path_strs(path) -> Tuple[str, ...]:
    out = []
    for part in path:
        key = getattr(part, "key", getattr(part, "idx", part))
        out.append(str(key))
    # nnx variables materialize as <param>/.value leaves — match on the
    # param name, not the accessor
    while out and out[-1] in (".value", "value", "raw_value"):
        out.pop()
    return tuple(out)


def tp_spec_for(path) -> P:
    """PartitionSpec for one param path under the DiT TP rules."""
    parts = _path_strs(path)
    for suffix, spec in _DIT_TP_RULES:
        if parts[-len(suffix):] == tuple(str(s) for s in suffix):
            return spec
    return P()


def apply_tp_sharding(model: nnx.Module, mesh: Mesh) -> int:
    """Device-put every param of ``model`` with its TP sharding over
    ``mesh`` (axes 'data' + 'model'; non-matching params replicate).
    Returns the number of tensor-parallel (non-replicated) params."""
    assert "model" in mesh.axis_names, "mesh needs a 'model' axis for TP"
    state = nnx.state(model)
    n_tp = 0

    def place(path, x):
        nonlocal n_tp
        if not hasattr(x, "shape"):
            return x
        spec = tp_spec_for(path)
        if spec != P():
            n_tp += 1
        return jax.device_put(x, NamedSharding(mesh, spec))

    nnx.update(model, jax.tree_util.tree_map_with_path(place, state))
    return n_tp
