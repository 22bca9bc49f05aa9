"""Sampler-time weight-noise key threading (VERDICT r3 W2 follow-through).

The reference resamples quantized-weight noise independently on every
denoiser call (cim_layers/quant_noise_utils.py:92-98). Inside this
framework's jitted-scan samplers, flax forbids advancing a module's
stateful RNG stream, so round 3 fell back to a data-derived key
(deterministic per (seed, input), data-correlated). Round 4 threads an
explicit per-step key from the sampler through
``ops.quant.external_noise_key`` instead; these tests pin the new
semantics:

  * under the context, noise is a pure function of (external key, layer
    seed) — independent of the activations, different across steps;
  * the shipped samplers actually thread it (eta=0 DDIM output now
    depends on the sampler key through a noisy quantized model, and is
    reproducible for the same key);
  * without the context, the documented data-derived fallback and the
    stateful training path are unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim.layers import LinearQnLsq
from stablediffusion_pytorch_tpu.ops import quant
from stablediffusion_pytorch_tpu.schedulers.linear import (
    make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.schedulers import samplers


def make_noisy_linear(seed=0):
    lin = nnx.Linear(8, 8, rngs=nnx.Rngs(0))
    q = LinearQnLsq(lin, weight_bit=8, input_bit=8, output_bit=8,
                    noise_scale=0.1, seed=seed)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    # calibrate the LSQ step sizes eagerly so jitted calls don't mutate
    q.calibrating = True
    q(x)
    q.calibrating = False
    return q, x


class TestExternalKeySemantics:
    def test_same_key_same_output_different_key_different(self):
        q, x = make_noisy_linear()
        k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
        with quant.external_noise_key(k1):
            y1a = np.asarray(q(x))
        with quant.external_noise_key(k1):
            y1b = np.asarray(q(x))
        with quant.external_noise_key(k2):
            y2 = np.asarray(q(x))
        np.testing.assert_array_equal(y1a, y1b)
        assert not np.allclose(y1a, y2)

    def test_noise_independent_of_activations(self):
        """Same external key, different inputs: the drawn weight noise is
        identical, so outputs differ only through the input (linearity of
        the quantized layer in x after fixed weights)."""
        q, x = make_noisy_linear()
        k = jax.random.PRNGKey(7)
        with quant.external_noise_key(k):
            y_x = np.asarray(q(x))
            y_2x = np.asarray(q(2.0 * x))
        # with input quant at 8 bits, doubling the input doubles the LSQ
        # grid usage; just check the draws were the same by reproducing
        # y_2x from a fresh context (data-derived keys would differ)
        with quant.external_noise_key(k):
            y_2x_again = np.asarray(q(2.0 * x))
        np.testing.assert_array_equal(y_2x, y_2x_again)
        assert not np.allclose(y_x, y_2x)

    def test_per_step_resampling_inside_jitted_scan(self):
        """Identical input at every scan step, fresh fold per step: outputs
        must differ across steps (round 3's data-derived fallback would
        freeze them)."""
        q, x = make_noisy_linear()
        gdef, state = nnx.split(q)

        @jax.jit
        def run(state, x, key):
            m = nnx.merge(gdef, state)

            def body(carry, i):
                with quant.external_noise_key(jax.random.fold_in(key, i)):
                    y = m(x)
                return carry, y

            _, ys = jax.lax.scan(body, 0, jnp.arange(4))
            return ys

        ys = np.asarray(run(state, x, jax.random.PRNGKey(0)))
        assert not np.allclose(ys[0], ys[1])
        assert not np.allclose(ys[1], ys[2])

    def test_layer_seed_decorrelates(self):
        qa, x = make_noisy_linear(seed=0)
        qb, _ = make_noisy_linear(seed=1)
        k = jax.random.PRNGKey(11)
        with quant.external_noise_key(k):
            ya, yb = np.asarray(qa(x)), np.asarray(qb(x))
        assert not np.allclose(ya, yb)

    def test_fallback_unchanged_without_context(self):
        """No context, closure-captured jit: the data-derived fallback keeps
        its (seed, input)-deterministic semantics."""
        q, x = make_noisy_linear()

        @jax.jit
        def f(x):
            return q(x)

        y1, y2 = np.asarray(f(x)), np.asarray(f(x))
        np.testing.assert_array_equal(y1, y2)


class TestSamplerThreading:
    def _sample(self, key, sampler="ddim"):
        q, _ = make_noisy_linear()
        sched = make_compvis_linear_schedule(50, 0.00085, 0.012)

        def model_fn(x, t, cond=None):
            b, h, w, c = x.shape
            flat = x.reshape(b, -1)[:, :8]
            out = q(flat)
            return jnp.tile(out[:, :1][:, None, None, :], (1, h, w, c)) * 0.01

        xt = jax.random.normal(jax.random.PRNGKey(42), (2, 2, 2, 2))
        if sampler == "ddim":
            return np.asarray(samplers.ddim_sample(
                model_fn, sched, xt, key, steps=8, eta=0.0))
        return np.asarray(samplers.dpm_solver_sample(
            model_fn, sched, xt, steps=8, noise_key=key))

    def test_ddim_eta0_depends_on_key_and_reproduces(self):
        a = self._sample(jax.random.PRNGKey(0))
        b = self._sample(jax.random.PRNGKey(0))
        c = self._sample(jax.random.PRNGKey(1))
        np.testing.assert_array_equal(a, b)
        # eta=0 adds no posterior noise, so any key dependence proves the
        # weight-noise key is threaded through the scan
        assert not np.allclose(a, c)

    def test_dpm_solver_noise_key(self):
        a = self._sample(jax.random.PRNGKey(0), sampler="dpm")
        b = self._sample(jax.random.PRNGKey(0), sampler="dpm")
        c = self._sample(jax.random.PRNGKey(1), sampler="dpm")
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)
        assert np.isfinite(a).all()
