"""Gradient checkpointing (nnx.remat / jax.checkpoint) for DIT, Unet, VQVAE.

The TPU memory lever: recompute per-layer/per-block activations in the
backward pass instead of storing them, trading one extra forward of MXU
FLOPs for O(layers)→O(1) activation HBM. These tests pin that remat is

  * numerically a no-op: loss and gradients match the non-remat model
    (same seed) to float tolerance;
  * structurally real: the grad jaxpr contains `remat` equations when
    enabled and none otherwise;
  * reachable from the trainers (the config key and the ``model.remat``
    attribute both enable it).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.models.dit import DIT
from stablediffusion_pytorch_tpu.models.unet import Unet
from stablediffusion_pytorch_tpu.models.vqvae import VQVAE

DIT_CFG = dict(hidden_size=32, patch_size=2, timestep_emb_dim=32,
               num_layers=2, num_heads=2, head_dim=16)
UNET_CFG = dict(down_channels=[8, 16, 16], mid_channels=[16, 16],
                time_emb_dim=16, down_sample=[True, False],
                attn_down=[False, True], norm_channels=4, num_heads=2,
                conv_out_channels=8, num_down_layers=1, num_mid_layers=1,
                num_up_layers=1)
VQ_CFG = dict(down_channels=[8, 16], mid_channels=[16, 16],
              down_sample=[True], num_down_layers=1, num_mid_layers=1,
              num_up_layers=1, attn_down=[False], z_channels=3,
              codebook_size=32, norm_channels=4, num_heads=2)


def _max_leaf_diff(a, b):
    d = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)
    return max(jax.tree.leaves(d))


def _perturb(model, scale=0.02):
    """Add deterministic noise to every param so zero-init layers (DiT's
    proj_out / adaLN) don't make the loss — and every gradient — exactly 0,
    which would vacuously pass a parity check."""
    state = nnx.state(model, nnx.Param)
    leaves, treedef = jax.tree.flatten(state)
    keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    nnx.update(model, jax.tree.unflatten(treedef, leaves))
    return model


def _assert_nontrivial(loss, grads):
    assert float(loss) != 0.0
    assert _max_leaf_diff(grads, jax.tree.map(jnp.zeros_like, grads)) > 0


def _grad_jaxpr(model, loss_of_state):
    gdef, state = nnx.split(model)

    def f(state):
        return loss_of_state(nnx.merge(gdef, state))

    return str(jax.make_jaxpr(jax.grad(f))(state))


class TestDitRemat:
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 7])

    def _loss_and_grad(self, remat):
        m = _perturb(DIT(4, dict(DIT_CFG, gradient_checkpointing=remat),
                         rngs=nnx.Rngs(0)))

        def loss_fn(m):
            return jnp.mean(m(self.x, self.t) ** 2)

        return nnx.value_and_grad(loss_fn)(m)

    def test_loss_and_grads_match(self):
        (l0, g0) = self._loss_and_grad(False)
        (l1, g1) = self._loss_and_grad(True)
        _assert_nontrivial(l0, g0)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert _max_leaf_diff(g0, g1) < 1e-5

    def test_jaxpr_has_remat_only_when_enabled(self):
        off = DIT(4, dict(DIT_CFG), rngs=nnx.Rngs(0))
        on = DIT(4, dict(DIT_CFG, gradient_checkpointing=True),
                 rngs=nnx.Rngs(0))
        loss = lambda m: jnp.mean(m(self.x, self.t) ** 2)
        assert "remat" not in _grad_jaxpr(off, loss)
        assert "remat" in _grad_jaxpr(on, loss)

    def test_attribute_toggle(self):
        """Trainers enable remat by setting model.remat post-construction."""
        m = DIT(4, dict(DIT_CFG), rngs=nnx.Rngs(0))
        m.remat = True
        loss = lambda mm: jnp.mean(mm(self.x, self.t) ** 2)
        assert "remat" in _grad_jaxpr(m, loss)


class TestUnetRemat:
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([3, 7])

    def _loss_and_grad(self, remat):
        m = _perturb(Unet(4, dict(UNET_CFG, gradient_checkpointing=remat),
                          rngs=nnx.Rngs(0)))

        def loss_fn(m):
            return jnp.mean(m(self.x, self.t) ** 2)

        return nnx.value_and_grad(loss_fn)(m)

    def test_loss_and_grads_match(self):
        (l0, g0) = self._loss_and_grad(False)
        (l1, g1) = self._loss_and_grad(True)
        _assert_nontrivial(l0, g0)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert _max_leaf_diff(g0, g1) < 1e-5


class TestVqvaeRemat:
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))

    def _loss_and_grad(self, remat):
        m = _perturb(VQVAE(3, dict(VQ_CFG, gradient_checkpointing=remat),
                           rngs=nnx.Rngs(0)))

        def loss_fn(m):
            out, _, losses = m(self.x)
            return (jnp.mean((out - self.x) ** 2)
                    + losses["codebook_loss"]
                    + 0.2 * losses["commitment_loss"])

        return nnx.value_and_grad(loss_fn)(m)

    def test_loss_and_grads_match(self):
        (l0, g0) = self._loss_and_grad(False)
        (l1, g1) = self._loss_and_grad(True)
        _assert_nontrivial(l0, g0)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert _max_leaf_diff(g0, g1) < 1e-5

    def test_jaxpr_has_remat(self):
        m = VQVAE(3, dict(VQ_CFG, gradient_checkpointing=True),
                  rngs=nnx.Rngs(0))

        def loss(mm):
            out, _, _ = mm(self.x)
            return jnp.mean(out ** 2)

        assert "remat" in _grad_jaxpr(m, loss)


import pytest


@pytest.mark.slow
class TestRematQuantized:
    """remat composes with the QAT layer surgery: after convert_to_layers
    the LSQ-quantized DiT (weight noise ON, drawn through the external
    noise key) produces bit-identical loss and gradients with and without
    gradient checkpointing — the recompute re-draws the same noise."""

    def test_quantized_dit_parity(self):
        from stablediffusion_pytorch_tpu.cim import registry
        from stablediffusion_pytorch_tpu.cim.progressive import (
            ProgressiveTrain,
        )
        from stablediffusion_pytorch_tpu.ops import quant

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        t = jnp.array([3, 7])

        def loss_and_grad(remat):
            m = _perturb(DIT(4, dict(DIT_CFG, gradient_checkpointing=remat),
                             rngs=nnx.Rngs(0)))
            pt = ProgressiveTrain(m)
            pt.convert_to_layers(list(registry.nn_layers), "layers_qn_lsq",
                                 noise_scale=0.05, input_bit=8,
                                 output_bit=8, weight_bit=8)
            for _, lyr in pt.customized_layers():
                lyr.calibrating = True
            m(x, t)  # absmax calibration pass (eager)
            for _, lyr in pt.customized_layers():
                lyr.calibrating = False

            def loss_fn(m):
                with quant.external_noise_key(jax.random.PRNGKey(5)):
                    return jnp.mean(m(x, t) ** 2)

            return nnx.value_and_grad(loss_fn)(m)

        l0, g0 = loss_and_grad(False)
        l1, g1 = loss_and_grad(True)
        assert float(l0) != 0.0
        np.testing.assert_array_equal(float(l0), float(l1))
        assert _max_leaf_diff(g0, g1) == 0.0
