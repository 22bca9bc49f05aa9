"""Pipeline parallelism for the DiT denoiser: GPipe-style microbatch
schedule over a ``'pipe'`` mesh axis via ``shard_map`` + ``ppermute``.

The reference scales by data parallelism only (DDP; SURVEY.md §2.7).
``parallel/tp.py`` already adds Megatron tensor parallelism; this module
adds the third classic axis the TPU way: the DiT's transformer stack is a
list of STRUCTURALLY IDENTICAL adaLN blocks (models/dit.py, reference
models/transformer.py:118-130), so their parameters stack into one pytree
with a leading layer axis that shards cleanly over ICI neighbours —
stage *s* of an *S*-stage pipeline holds layers ``[s·L/S, (s+1)·L/S)``
and activations hop stage→stage with one ``lax.ppermute`` per tick.

Design notes (TPU-first):
  * The whole schedule is ONE compiled program: a ``lax.scan`` over
    ``M + S - 1`` ticks inside ``shard_map``. No host round-trips between
    microbatches, no data-dependent control flow — pipeline bubbles are
    the only cost, as in any GPipe.
  * Per-tick work on every stage is an inner ``lax.scan`` over that
    stage's local layers (``nnx.merge`` of one stacked-state slice), so
    XLA compiles ONE layer body per stage regardless of depth.
  * Each layer computes its own adaLN modulation from the (per-microbatch)
    ``t_emb`` — numerically identical to the batched-GEMM fast path in
    ``DIT.__call__`` (same columns of the same matmul).
  * ``ppermute`` has a transpose rule, so the pipelined forward is
    differentiable end-to-end and drops into the existing train step;
    prologue/epilogue (patchify, t-emb, final adaLN/unpatchify — tiny
    next to the stack) run replicated via the ``DIT.prepare`` /
    ``DIT.finalize`` split points.
  * Composes with data parallelism: build a ``('data', 'pipe')`` mesh and
    pass ``data_axis='data'`` — the schedule below only talks over
    ``'pipe'`` while the batch stays sharded on ``'data'``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_transformer_layers(model) -> tuple:
    """Stack the per-layer states of ``model.transformer_layers`` into one
    pytree with a leading layer axis. Returns ``(graphdef, stacked_state)``
    where ``graphdef`` describes ONE layer. Requires all layers to be
    structurally identical (always true for the DiT: one config, one
    cross_attn setting)."""
    layers = list(model.transformer_layers)
    if not layers:
        raise ValueError("model has no transformer_layers to pipeline")
    graphdef, state0 = nnx.split(layers[0])
    states = [state0] + [nnx.split(l)[1] for l in layers[1:]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return graphdef, stacked


def unstack_into_model(model, stacked_state) -> None:
    """Write a (possibly optimizer-updated) stacked layer state back into
    ``model.transformer_layers`` in place — the inverse of
    :func:`stack_transformer_layers`."""
    layers = list(model.transformer_layers)
    for i, layer in enumerate(layers):
        sl = jax.tree.map(lambda a: a[i], stacked_state)
        nnx.update(layer, sl)


def pipeline_apply(graphdef, local_state, tokens, t_emb, context,
                   *, n_microbatches: int, axis_name: str = "pipe"):
    """GPipe schedule body — call INSIDE ``shard_map`` with ``local_state``
    holding this stage's slice of the stacked layer state (leading axis
    sharded over ``axis_name``) and the activations replicated over it.

    tokens: (B, N, H); t_emb: (B, H); context: (B, T, D) or None.
    Returns (B, N, H), replicated across the pipe axis.
    """
    S = _axis_size(axis_name)
    stage = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % S) for i in range(S)]
    M = n_microbatches
    b, n, h = tokens.shape
    if b % M:
        raise ValueError(f"batch {b} not divisible by {M} microbatches")
    mb = b // M

    x_mbs = tokens.reshape(M, mb, n, h)
    te_mbs = t_emb.reshape(M, mb, -1)
    ctx_mbs = (None if context is None
               else context.reshape(M, mb, *context.shape[1:]))

    def apply_local_stack(x, te, ctx):
        def body(carry, state_slice):
            layer = nnx.merge(graphdef, state_slice)
            return layer(carry, te, ctx), None

        out, _ = lax.scan(body, x, local_state)
        return out

    def tick(carry, t):
        act, outputs = carry
        # the microbatch index this stage works on at tick t
        idx = t - stage
        safe = jnp.clip(idx, 0, M - 1)
        # stage 0 ingests a fresh microbatch each tick (repeats the last
        # one after t >= M — masked out of the output collection below)
        inject = lax.dynamic_index_in_dim(x_mbs, safe, 0, keepdims=False)
        act = jnp.where(stage == 0, inject, act)
        te = lax.dynamic_index_in_dim(te_mbs, safe, 0, keepdims=False)
        ctx = (None if ctx_mbs is None else
               lax.dynamic_index_in_dim(ctx_mbs, safe, 0, keepdims=False))
        act = apply_local_stack(act, te, ctx)
        # last stage banks finished microbatches
        upd = lax.dynamic_update_index_in_dim(outputs, act, safe, 0)
        bank = (stage == S - 1) & (idx >= 0) & (idx < M)
        outputs = jnp.where(bank, upd, outputs)
        act = lax.ppermute(act, axis_name, perm)
        return (act, outputs), None

    # the carry differs per stage → mark it varying over the pipe axis for
    # jax's manual-axes type system (shard_map scan-vma rule). Deriving the
    # zeros from x_mbs keeps any OTHER varying axes (e.g. 'data' in hybrid
    # DP×PP, where the batch operands are per-shard) in the carry type too.
    act0 = lax.pcast(x_mbs[0] * 0, (axis_name,), to="varying")
    out0 = lax.pcast(x_mbs * 0, (axis_name,), to="varying")
    (_, outputs), _ = lax.scan(tick, (act0, out0), jnp.arange(M + S - 1))

    # replicate the result: only the last stage holds real outputs
    outputs = lax.psum(jnp.where(stage == S - 1, outputs, 0), axis_name)
    return outputs.reshape(b, n, h)


def _axis_size(axis_name: str) -> int:
    """Static size of a shard_map mesh axis (psum(1) is traced; the perm
    list and tick count need python ints)."""
    return lax.axis_size(axis_name)


def build_pp_forward(model, mesh: Mesh, *, n_microbatches: int,
                     pipe_axis: str = "pipe",
                     data_axis: Optional[str] = None):
    """Build a pipeline-parallel DiT forward over ``mesh``.

    Returns ``(forward, stacked_state, rest_state)`` where
    ``forward(stacked_state, rest_state, x, t, cond_input)`` computes the
    same result as ``model(x, t, cond_input)`` with the transformer-layer
    params taken from ``stacked_state`` (leading layer axis sharded over
    ``pipe_axis``) and the prologue/epilogue params (patch embed, t-emb
    MLP, final adaLN, proj_out, conditioning projections) from
    ``rest_state``. Both are function ARGUMENTS — not captured constants —
    so a train step can differentiate and optimize the full model, not
    just the pipelined stack. When ``data_axis`` is given the batch
    additionally shards over it (hybrid DP×PP); ``n_microbatches`` must
    then divide the PER-DATA-SHARD batch.

    ``stacked_state`` is a plain pytree of arrays already placed with the
    layer axis sharded — optimizer updates apply to it directly, and
    :func:`unstack_into_model` writes it back for checkpointing;
    ``rest_state`` updates go back via ``nnx.update(model, rest_state)``.
    The returned function is not jitted; wrap it (or the train step around
    it) in ``jax.jit`` at the call site.
    """
    S = mesh.shape[pipe_axis]
    layer_graphdef, stacked = stack_transformer_layers(model)
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    if n_layers % S:
        raise ValueError(
            f"{n_layers} layers not divisible by {S} pipeline stages")

    layer_sharding = NamedSharding(mesh, P(pipe_axis))
    stacked = jax.tree.map(
        lambda a: jax.device_put(a, layer_sharding), stacked)

    # the non-stack params travel as an explicit argument so they get
    # gradients too; the stack params inside this state are dead weight
    # (prepare/finalize never touch transformer_layers) and XLA DCEs them
    model_graphdef, rest_state = nnx.split(model)

    batch_spec = P(data_axis) if data_axis else P()

    def forward(st, rest, x, t, cond_input=None):
        m = nnx.merge(model_graphdef, rest)
        tokens, t_emb, context = m.prepare(x, t, cond_input)
        has_ctx = context is not None
        # shard_map wants array operands: no-text DiTs get a zero-width
        # dummy that is dropped inside the body
        ctx = (context if has_ctx
               else jnp.zeros((tokens.shape[0], 0, tokens.shape[-1]),
                              tokens.dtype))

        def body(s, tk, te, cx):
            return pipeline_apply(layer_graphdef, s, tk, te,
                                  cx if has_ctx else None,
                                  n_microbatches=n_microbatches,
                                  axis_name=pipe_axis)

        out = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(pipe_axis), batch_spec, batch_spec, batch_spec),
            out_specs=batch_spec)(st, tokens, t_emb, ctx)
        return m.finalize(out, t_emb, x.shape)

    return forward, stacked, rest_state
