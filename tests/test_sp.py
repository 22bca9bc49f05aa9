"""Sequence parallelism (parallel/sp.py) on the 8-device CPU mesh.

Pins that the residual-stream sharding constraint is (a) numerically a
no-op — TP+SP forward and train-step losses match the single-device model
exactly — and (b) structurally real — the lowered HLO of the constrained
forward carries Sharding custom-calls between layers that the
unconstrained forward doesn't have.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.models.dit import DIT
from stablediffusion_pytorch_tpu.parallel.mesh import make_mesh
from stablediffusion_pytorch_tpu.parallel.sp import apply_sp, sp_sharding
from stablediffusion_pytorch_tpu.parallel.tp import apply_tp_sharding

DIT_CFG = dict(hidden_size=32, patch_size=2, timestep_emb_dim=32,
               num_layers=2, num_heads=4, head_dim=8)


def _fwd(model, x, t):
    gdef, state = nnx.split(model)

    @jax.jit
    def f(state, x, t):
        return nnx.merge(gdef, state)(x, t)

    return f, gdef, nnx.state(model)


class TestSpSharding:
    def test_requires_axes(self):
        mesh = make_mesh(8)  # 'data' only
        try:
            sp_sharding(mesh)
            assert False, "expected ValueError for missing 'model' axis"
        except ValueError:
            pass


class TestSpParity:
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 4))
    t = jnp.array([3, 7, 11, 2])

    def _outputs(self, sp):
        mesh = make_mesh(8, ("data", "model"), axis_sizes=(2, 4))
        m = DIT(4, dict(DIT_CFG), rngs=nnx.Rngs(0))
        apply_tp_sharding(m, mesh)
        if sp:
            apply_sp(m, mesh)
        f, gdef, state = _fwd(m, self.x, self.t)
        out = f(state, self.x, self.t)
        lowered = f.lower(state, self.x, self.t).as_text()
        return np.asarray(out), lowered

    def test_tp_sp_matches_tp(self):
        out_tp, hlo_tp = self._outputs(sp=False)
        out_sp, hlo_sp = self._outputs(sp=True)
        np.testing.assert_allclose(out_tp, out_sp, atol=1e-5)
        # the constraint shows up as sharding-constraint ops in the
        # lowered module (sdy dialect; "Sharding" custom-calls pre-shardy)
        def n_constraints(hlo):
            return (hlo.count("sdy.sharding_constraint")
                    + hlo.count('custom_call_target = "Sharding"'))
        assert n_constraints(hlo_sp) > n_constraints(hlo_tp)

    def test_sp_matches_single_device(self):
        m0 = DIT(4, dict(DIT_CFG), rngs=nnx.Rngs(0))
        ref = np.asarray(m0(self.x, self.t))
        out_sp, _ = self._outputs(sp=True)
        np.testing.assert_allclose(ref, out_sp, atol=1e-5)
