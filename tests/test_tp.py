"""Tensor-parallel sharding (parallel/tp.py) on the virtual CPU mesh:
Megatron column/row-parallel DiT params over ('data', 'model'), correctness
pinned against the unsharded single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from stablediffusion_pytorch_tpu.models import DIT
from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
from stablediffusion_pytorch_tpu.parallel.tp import (
    apply_tp_sharding, tp_spec_for,
)
from stablediffusion_pytorch_tpu.schedulers import (
    make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.training import LdmTrainer

TINY = {
    "hidden_size": 32,
    "patch_size": 2,
    "timestep_emb_dim": 16,
    "num_layers": 2,
    "num_heads": 4,
    "head_dim": 8,
}


def _build(seed=0):
    return DIT(4, dict(TINY), rngs=nnx.Rngs(seed))


class TestTpSpecs:
    def test_rules_cover_attention_and_mlp(self):
        model = _build()
        specs = {}
        state = nnx.state(model)

        from stablediffusion_pytorch_tpu.parallel.tp import _path_strs

        def visit(path, x):
            keys = _path_strs(path)
            specs["/".join(keys[-2:])] = tp_spec_for(path)
            return x

        jax.tree_util.tree_map_with_path(visit, state)
        assert specs["qkv_proj/kernel"] == P(None, "model")
        assert specs["output_proj/kernel"] == P("model", None)
        assert specs["mlp_in/kernel"] == P(None, "model")
        assert specs["mlp_out/kernel"] == P("model", None)
        assert specs["patch_embed/kernel"] == P()


class TestTpTrainStep:
    def test_dp_tp_step_matches_unsharded(self):
        mesh = make_mesh(8, ("data", "model"), axis_sizes=(2, 4))
        sched = make_compvis_linear_schedule(20, 0.0015, 0.0195)
        batch = 4
        lat = jax.random.normal(jax.random.PRNGKey(0), (batch, 8, 8, 4))
        key = jax.random.PRNGKey(1)

        # unsharded reference step
        m_ref = _build()
        tr_ref = LdmTrainer(m_ref, sched, lr=1e-3)
        loss_ref = float(tr_ref.train_step(lat, None, key)["loss"])

        # TP+DP step: params sharded over 'model', batch over 'data'
        m_tp = _build()
        n_tp = apply_tp_sharding(m_tp, mesh)
        assert n_tp == 3 * TINY["num_layers"] + TINY["num_layers"] * 3
        tr_tp = LdmTrainer(m_tp, sched, lr=1e-3)
        lat_tp = jax.device_put(
            lat, NamedSharding(mesh, P("data", None, None, None)))
        loss_tp = float(tr_tp.train_step(lat_tp, None, key)["loss"])

        assert np.isfinite(loss_tp)
        np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-4)

        # params keep their tensor-parallel sharding after the update
        qkv = m_tp.transformer_layers[0].attn_block.qkv_proj.kernel[...]
        spec = qkv.sharding.spec if hasattr(qkv.sharding, "spec") else None
        assert spec == P(None, "model")


class TestTpUnet:
    def test_unet_attention_tp_matches_unsharded(self):
        """The UNet's separate-projection attention shards head-parallel
        (q/k/v column, out row) — a 2x2 DP x TP train step reproduces the
        single-device loss; convs stay replicated."""
        from stablediffusion_pytorch_tpu.models import Unet
        from tests.test_models import TINY_UNET

        mesh = make_mesh(4, ("data", "model"), axis_sizes=(2, 2))
        sched = make_compvis_linear_schedule(20, 0.0015, 0.0195)
        lat = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4))
        key = jax.random.PRNGKey(3)

        m_ref = Unet(4, dict(TINY_UNET), rngs=nnx.Rngs(0))
        tr_ref = LdmTrainer(m_ref, sched, lr=1e-3)
        loss_ref = float(tr_ref.train_step(lat, None, key)["loss"])

        m_tp = Unet(4, dict(TINY_UNET), rngs=nnx.Rngs(0))
        n_tp = apply_tp_sharding(m_tp, mesh)
        assert n_tp > 0, "no UNet params matched the TP rules"
        tr_tp = LdmTrainer(m_tp, sched, lr=1e-3)
        lat_tp = jax.device_put(
            lat, NamedSharding(mesh, P("data", None, None, None)))
        loss_tp = float(tr_tp.train_step(lat_tp, None, key)["loss"])

        assert np.isfinite(loss_tp)
        np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-4)
