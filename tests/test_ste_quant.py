"""Golden-value tests for the STE / LSQ quantization library.

Analytic ground truths follow the formulas in the reference's
cim_layers/quant_noise_utils.py and the gradient checks mirror the
reference's cim_layers/test_script/ gradient scripts (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablediffusion_pytorch_tpu.ops import (
    ste,
    round_pass,
    floor_pass,
    floor_no_pass,
    clamp_pass,
    grad_scale,
    grad_scale_factor,
    data_quant,
    data_quant_pass,
    data_quant_lsq,
    weight_quant_lsq,
    add_noise,
    init_step_size,
    bit_split,
    bit_concat,
    bit_len_for,
)
from stablediffusion_pytorch_tpu.ops.quant import update_step_size


class TestSTE:
    def test_round_pass_forward_and_grad(self):
        x = jnp.array([0.4, 0.6, -1.2, 2.5, -2.5])
        # round half to even, like torch.round
        np.testing.assert_allclose(round_pass(x), [0.0, 1.0, -1.0, 2.0, -2.0])
        g = jax.grad(lambda v: jnp.sum(round_pass(v) * 3.0))(x)
        np.testing.assert_allclose(g, 3.0 * np.ones(5))

    def test_floor_pass_truncates_toward_zero(self):
        x = jnp.array([1.7, -1.7, 0.3, -0.3])
        np.testing.assert_allclose(floor_pass(x), [1.0, -1.0, 0.0, -0.0])
        g = jax.grad(lambda v: jnp.sum(floor_pass(v)))(x)
        np.testing.assert_allclose(g, np.ones(4))

    def test_floor_no_pass_zero_grad(self):
        x = jnp.array([1.7, -1.7])
        np.testing.assert_allclose(floor_no_pass(x), [1.0, -1.0])
        g = jax.grad(lambda v: jnp.sum(floor_no_pass(v)))(x)
        np.testing.assert_allclose(g, np.zeros(2))

    def test_clamp_pass_identity_grad_outside(self):
        x = jnp.array([-5.0, 0.5, 5.0])
        np.testing.assert_allclose(clamp_pass(x, -1, 1), [-1.0, 0.5, 1.0])
        g = jax.grad(lambda v: jnp.sum(clamp_pass(v, -1, 1)))(x)
        np.testing.assert_allclose(g, np.ones(3))  # identity grad, not clipped

    def test_grad_scale(self):
        x = jnp.array([2.0, -3.0])
        np.testing.assert_allclose(grad_scale(x, 0.25), x)
        g = jax.grad(lambda v: jnp.sum(grad_scale(v, 0.25)))(x)
        np.testing.assert_allclose(g, 0.25 * np.ones(2))

    def test_grad_scale_factor(self):
        x = jnp.zeros((4, 8))
        expected = 1.0 / np.sqrt(7 * 32)
        np.testing.assert_allclose(grad_scale_factor(7, x), expected, rtol=1e-6)


class TestAbsmaxQuant:
    def test_data_quant_levels(self):
        x = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0])
        q, scale = data_quant(x, 3, isint=True)  # half_level = 3
        np.testing.assert_allclose(q, [-3, -2, 0, 2, 3])
        np.testing.assert_allclose(scale, 3.0)

    def test_data_quant_float_mode(self):
        x = jnp.array([-1.0, 0.25, 1.0])
        q, scale = data_quant(x, 3, isint=False)
        np.testing.assert_allclose(q, [-1.0, np.round(0.75) / 3, 1.0])
        np.testing.assert_allclose(scale, 1.0)

    def test_data_quant_zero_bit_passthrough(self):
        x = jnp.array([1.0, 2.0])
        q, s = data_quant(x, 0)
        np.testing.assert_allclose(q, x)
        np.testing.assert_allclose(s, 1.0)

    def test_data_quant_zero_range(self):
        x = jnp.zeros(4)
        q, s = data_quant(x, 4, isint=True)
        np.testing.assert_allclose(q, x)
        np.testing.assert_allclose(s, 1.0)

    def test_data_quant_pass_matches_forward(self):
        x = jnp.array([-0.9, -0.1, 0.3, 0.7])
        q1, _ = data_quant(x, 4)
        q2, _ = data_quant_pass(x, 4)
        np.testing.assert_allclose(q1, q2, rtol=1e-6)
        g = jax.grad(lambda v: jnp.sum(data_quant_pass(v, 4)[0]))(x)
        # STE through round; d(q)/dx = 1 for in-range values
        np.testing.assert_allclose(g, np.ones(4), rtol=1e-6)


class TestLSQ:
    def test_forward_values(self):
        # step 0.5, 4-bit -> range 7: q = clamp(round(x/0.5), -7, 7)*0.5
        x = jnp.array([-10.0, -0.6, 0.2, 3.3, 10.0])
        s = jnp.asarray(0.5)
        q, _ = data_quant_lsq(x, 4, s)
        np.testing.assert_allclose(q, [-3.5, -0.5, 0.0, 3.5, 3.5], rtol=1e-6)

    def test_int_mode_scale(self):
        x = jnp.array([0.9])
        s = jnp.asarray(0.25)
        q, scale = data_quant_lsq(x, 4, s, isint=True)
        np.testing.assert_allclose(q, [4.0], rtol=1e-6)  # round(0.9/0.25)=4
        np.testing.assert_allclose(scale, 4.0)  # 1/step

    def test_step_size_gradient_lsq_formula(self):
        """LSQ step-size gradient (Esser et al. 2020):
        per-element dq/ds = (round(x/s) - x/s) if |x/s| < Qp else sign*Qp,
        all multiplied by g = 1/sqrt(Qp * numel).
        Reference analytic check mirrors
        cim_layers/test_script/layers_LSQ_adda_test_step_size_grad.py."""
        x = jnp.array([0.3, -0.8, 2.0, 5.0])  # 5.0 clamps at Qp with s=0.5,Qp=7
        s = jnp.asarray(0.5)
        qp = 7

        g_s = jax.grad(lambda ss: jnp.sum(data_quant_lsq(x, 4, ss)[0]))(s)

        gsf = 1.0 / np.sqrt(qp * x.size)
        xs = np.asarray(x) / 0.5
        per_elem = np.where(
            np.abs(xs) < qp, np.round(xs) - xs, np.sign(xs) * qp
        )
        expected = per_elem.sum() * gsf
        np.testing.assert_allclose(g_s, expected, rtol=1e-5)

    def test_input_gradient_clamp_mask(self):
        # d(q)/dx = 1 inside the clamp range, 0 outside
        x = jnp.array([0.3, 50.0])
        s = jnp.asarray(0.5)
        g = jax.grad(lambda v: jnp.sum(data_quant_lsq(v, 4, s)[0]))(x)
        np.testing.assert_allclose(g, [1.0, 0.0], rtol=1e-6)

    def test_weight_quant_lsq_same_core(self):
        x = jnp.array([-0.3, 0.45])
        s = jnp.asarray(0.1)
        qd, _ = data_quant_lsq(x, 8, s)
        qw, _ = weight_quant_lsq(x, 8, s)
        np.testing.assert_allclose(qd, qw)

    def test_init_step_size(self):
        x = jnp.array([-2.0, 1.0])
        # absmax/half_level = 2/7 for 4-bit
        np.testing.assert_allclose(init_step_size(x, 4), 2.0 / 7, rtol=1e-6)

    def test_update_step_size_bit_change(self):
        s = jnp.asarray(0.4)
        # 4 -> 8 bits: s / 2^(8-4)
        np.testing.assert_allclose(update_step_size(s, 4, 8), 0.4 / 16, rtol=1e-6)
        np.testing.assert_allclose(update_step_size(s, 8, 4), 0.4 * 16, rtol=1e-6)


class TestNoise:
    def test_add_noise_statistics(self):
        key = jax.random.PRNGKey(0)
        w = jnp.concatenate([jnp.zeros(5000), jnp.ones(5000)])  # range = 1
        noisy = add_noise(w, key, n_scale=0.1)
        resid = np.asarray(noisy - w)
        assert abs(resid.std() - 0.1) < 0.01
        assert abs(resid.mean()) < 0.01

    def test_add_noise_zero_scale_is_identity(self):
        w = jnp.arange(10.0)
        assert add_noise(w, jax.random.PRNGKey(0), 0) is w


class TestBitOps:
    @pytest.mark.parametrize("x_bit,slice_bit", [(8, 1), (8, 2), (8, 4), (5, 2), (4, 4)])
    def test_roundtrip_int_domain(self, x_bit, slice_bit):
        """bit_concat(bit_split(x)) == x for signed int levels (SURVEY §4)."""
        half = 2 ** (x_bit - 1) - 1
        x = jnp.arange(-half, half + 1, dtype=jnp.float32).reshape(-1, 1)
        slices = bit_split(x, x_bit, slice_bit)
        assert slices.shape[0] == bit_len_for(x_bit, slice_bit) * x.shape[0]
        back = bit_concat(slices, x_bit, slice_bit)
        np.testing.assert_allclose(back, x)

    def test_slice_values_8bit_4slice(self):
        # x=77=0b1001101, slice_bit=4, x_bit=8 -> slices [13, 4] (low, high)
        x = jnp.array([[77.0]])
        s = bit_split(x, 8, 4)
        np.testing.assert_allclose(s.reshape(-1), [13.0, 4.0])

    def test_negative_values(self):
        x = jnp.array([[-77.0]])
        s = bit_split(x, 8, 4)
        back = bit_concat(s, 8, 4)
        np.testing.assert_allclose(back, x)

    def test_ste_gradient_sums_to_identityish(self):
        """Each slice carries grad shift/bit_len; summing the weighted concat
        gradient reproduces the reference STE behavior."""
        x = jnp.array([[10.0, -3.0]])
        def f(v):
            return jnp.sum(bit_concat(bit_split(v, 8, 2), 8, 2))
        g = jax.grad(f)(x)
        # grad = sum_i 2^(2i) * d(slice_i)/dx = sum_i 2^(2i) * (1/2^(2i))/bit_len...
        # d(shift_i)/dx = 1/2^(lsb_i) via floor_pass STE, slice grad = that / bit_len
        bit_len = bit_len_for(8, 2)
        expected = sum((2.0 ** (2 * i)) * (1.0 / 2 ** (2 * i)) / bit_len for i in range(bit_len))
        np.testing.assert_allclose(g, expected * np.ones((1, 2)), rtol=1e-6)
