"""Pipeline parallelism (parallel/pp.py) on the virtual CPU mesh: GPipe
microbatch schedule over a 'pipe' axis, forward/grad parity pinned against
the unsharded single-device model, hybrid DP×PP, and the round-trip back
into the nnx model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import Mesh

from stablediffusion_pytorch_tpu.models import DIT
from stablediffusion_pytorch_tpu.parallel.pp import (
    build_pp_forward, stack_transformer_layers, unstack_into_model,
)

TINY = {
    "hidden_size": 32,
    "patch_size": 2,
    "timestep_emb_dim": 16,
    "num_layers": 4,
    "num_heads": 4,
    "head_dim": 8,
}

TEXT_COND = {
    "condition_types": ["text"],
    "text_condition_config": {
        "text_embed_model": "clip",
        "train_text_embed_model": False,
        "text_embed_dim": 24,
        "cond_drop_prob": 0.1,
    },
}


def _build(seed=0, text=False):
    cfg = dict(TINY)
    if text:
        cfg["condition_config"] = TEXT_COND
    return DIT(4, cfg, rngs=nnx.Rngs(seed))


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


def _inputs(b=8, seed=0):
    k = jax.random.PRNGKey(seed)
    kx, kt = jax.random.split(k)
    x = jax.random.normal(kx, (b, 8, 8, 4), jnp.float32)
    t = jax.random.randint(kt, (b,), 0, 1000)
    return x, t


class TestStacking:
    def test_stack_unstack_roundtrip(self):
        model = _build()
        graphdef, stacked = stack_transformer_layers(model)
        # leading axis is the layer axis
        leaf = jax.tree.leaves(stacked)[0]
        assert leaf.shape[0] == TINY["num_layers"]
        # perturb and write back
        bumped = jax.tree.map(lambda a: a + 1.0, stacked)
        unstack_into_model(model, bumped)
        _, restacked = stack_transformer_layers(model)
        for a, b in zip(jax.tree.leaves(bumped), jax.tree.leaves(restacked)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestPipelineParity:
    @pytest.mark.parametrize("n_stages,n_mb", [(2, 4), (4, 2), (4, 8)])
    def test_forward_matches_sequential(self, n_stages, n_mb):
        model = _build()
        mesh = _pipe_mesh(n_stages)
        fwd, stacked, rest = build_pp_forward(model, mesh, n_microbatches=n_mb)
        x, t = _inputs(b=8)
        ref = model(x, t)
        out = jax.jit(fwd)(stacked, rest, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_forward_matches_with_text_context(self):
        model = _build(text=True)
        mesh = _pipe_mesh(4)
        fwd, stacked, rest = build_pp_forward(model, mesh, n_microbatches=4)
        x, t = _inputs(b=8)
        ctx = jax.random.normal(jax.random.PRNGKey(3), (8, 7, 24))
        cond = {"text": ctx}
        ref = model(x, t, cond)
        out = jax.jit(fwd)(stacked, rest, x, t, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_grads_match_sequential(self):
        """ppermute is differentiable: layer-param grads through the
        pipeline equal the sequential model's grads."""
        model = _build()
        mesh = _pipe_mesh(4)
        fwd, stacked, rest = build_pp_forward(model, mesh, n_microbatches=2)
        x, t = _inputs(b=4)
        tgt = jax.random.normal(jax.random.PRNGKey(9), x.shape)

        def pp_loss(st, rs):
            return jnp.mean((fwd(st, rs, x, t) - tgt) ** 2)

        g_pp, g_rest = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(stacked,
                                                                  rest)
        # prologue/epilogue params get gradients too (they are arguments,
        # not baked-in constants)
        assert sum(float(jnp.sum(jnp.abs(g)))
                   for g in jax.tree.leaves(g_rest)) > 0

        graphdef, ref_stacked = stack_transformer_layers(model)

        def seq_loss(st):
            def body(carry, sl):
                layer = nnx.merge(graphdef, sl)
                tokens, t_emb, context = carry
                return (layer(tokens, t_emb, context), t_emb, context), None

            tokens, t_emb, context = model.prepare(x, t, None)
            (tokens, _, _), _ = jax.lax.scan(
                body, (tokens, t_emb, context), st)
            out = model.finalize(tokens, t_emb, x.shape)
            return jnp.mean((out - tgt) ** 2)

        g_ref = jax.jit(jax.grad(seq_loss))(ref_stacked)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)

    def test_dp_pp_hybrid(self):
        model = _build()
        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "pipe"))
        fwd, stacked, rest = build_pp_forward(model, mesh, n_microbatches=2,
                                              data_axis="data")
        x, t = _inputs(b=8)
        ref = model(x, t)
        out = jax.jit(fwd)(stacked, rest, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_uneven_layers_rejected(self):
        model = _build()  # 4 layers
        mesh = Mesh(np.array(jax.devices()[:3]), ("pipe",))
        with pytest.raises(ValueError, match="not divisible"):
            build_pp_forward(model, mesh, n_microbatches=2)
