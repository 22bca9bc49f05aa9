"""ZeRO-1 optimizer-state sharding (parallel/zero.py).

Pins, on the 8-device CPU mesh (conftest.py):
  * zero1_spec picks the largest divisible dim and replicates otherwise;
  * apply_zero1 physically shards the Adam moments + EMA — each device
    holds 1/N of every sharded leaf (addressable shard shapes checked);
  * training is numerically unchanged: several LdmTrainer steps with
    ZeRO-1 sharding produce the same losses and final params as the
    plain replicated-optimizer run on identical data/keys;
  * TP-placed leaves are left alone (composability guard).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from stablediffusion_pytorch_tpu.models.dit import DIT
from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh, shard_batch
from stablediffusion_pytorch_tpu.parallel.zero import (
    apply_zero1,
    shard_tree_zero1,
    zero1_spec,
)
from stablediffusion_pytorch_tpu.schedulers.linear import make_linear_schedule
from stablediffusion_pytorch_tpu.training.ldm import LdmTrainer

DIT_CFG = dict(hidden_size=32, patch_size=2, timestep_emb_dim=32,
               num_layers=2, num_heads=2, head_dim=16)


def _make_trainer():
    model = DIT(4, dict(DIT_CFG), rngs=nnx.Rngs(0))
    sched = make_linear_schedule(20, 0.0015, 0.0195)
    return LdmTrainer(model, sched, lr=1e-3)


class TestSpec:
    def test_largest_divisible_dim(self):
        assert zero1_spec((16, 128), 8) == P(None, "data")
        assert zero1_spec((256, 32), 8) == P("data", None)
        assert zero1_spec((32,), 8) == P("data")

    def test_indivisible_replicates(self):
        assert zero1_spec((7, 9), 8) == P()
        assert zero1_spec((), 8) == P()
        assert zero1_spec((4,), 8) == P()  # smaller than the axis

    def test_trivial_axis(self):
        assert zero1_spec((64, 64), 1) == P()


class TestSharding:
    def test_moments_and_ema_are_sharded(self):
        mesh = make_mesh(8)
        trainer = _make_trainer()
        n = apply_zero1(trainer, mesh)
        assert n > 0

        # every big float leaf of the moments now stores 1/8 per device
        state = nnx.state(trainer.optimizer)
        checked = 0
        for leaf in jax.tree.leaves(state):
            if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
                continue
            if not np.issubdtype(leaf.dtype, np.floating):
                continue
            if zero1_spec(leaf.shape, 8) == P():
                continue
            shard = leaf.addressable_shards[0].data
            assert int(np.prod(shard.shape)) == int(np.prod(leaf.shape)) // 8
            checked += 1
        assert checked >= 4  # mu/nu kernels at least

        ema_leaf = max(jax.tree.leaves(trainer.ema_params),
                       key=lambda x: x.size)
        shard = ema_leaf.addressable_shards[0].data
        assert int(np.prod(shard.shape)) == int(np.prod(ema_leaf.shape)) // 8

    def test_already_sharded_leaves_untouched(self):
        mesh = make_mesh(8, ("data", "model"), axis_sizes=(4, 2))
        x = jax.device_put(jnp.ones((16, 64)),
                           NamedSharding(mesh, P(None, "model")))
        tree, n = shard_tree_zero1({"kernel": x, "other": jnp.ones((8, 8))},
                                   mesh, "data")
        assert tree["kernel"].sharding.spec == P(None, "model")  # untouched
        assert n == 1  # only 'other' was placed

    def test_integer_leaves_untouched(self):
        mesh = make_mesh(8)
        tree, n = shard_tree_zero1({"count": jnp.zeros((), jnp.int32),
                                    "ids": jnp.zeros((16,), jnp.int32)},
                                   mesh, "data")
        assert n == 0


class TestNumericalParity:
    def _run(self, zero1, steps=3):
        mesh = make_mesh(8)
        trainer = _make_trainer()
        if zero1:
            apply_zero1(trainer, mesh)
        losses = []
        for i in range(steps):
            k = jax.random.PRNGKey(100 + i)
            latents = jax.random.normal(jax.random.fold_in(k, 1),
                                        (8, 8, 8, 4))
            latents = shard_batch(mesh, latents)
            m = trainer.train_step(latents, None, jax.random.fold_in(k, 2))
            losses.append(float(m["loss"]))
        params = jax.tree.map(np.asarray,
                              jax.tree.leaves(nnx.state(trainer.model,
                                                        nnx.Param)))
        ema = jax.tree.map(np.asarray, jax.tree.leaves(trainer.ema_params))
        return losses, params, ema

    def test_matches_replicated_dp(self):
        l0, p0, e0 = self._run(zero1=False)
        l1, p1, e1 = self._run(zero1=True)
        np.testing.assert_allclose(l0, l1, rtol=1e-5)
        for a, b in zip(p0, p1):
            np.testing.assert_allclose(a, b, atol=1e-6)
        for a, b in zip(e0, e1):
            np.testing.assert_allclose(a, b, atol=1e-6)
