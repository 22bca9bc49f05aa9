"""CIM quantized-layer tests: forward semantics, surgery round-trips,
bit-split layer equivalence, ADDA ADC transfer, progressive scheduling —
mirroring the reference's cim_layers/test_script/ gradient and equivalence
scripts (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from stablediffusion_pytorch_tpu.cim import (
    ProgressiveTrain,
    calibrate_quant_layers,
)
from stablediffusion_pytorch_tpu.cim.layers import (
    ConvLsqAdda,
    ConvLsqAddaCim,
    ConvLsqBitSplit,
    ConvQnLsq,
    LinearLsqAddaCim,
    LinearQnLsq,
)
from stablediffusion_pytorch_tpu.cim.registry import REGISTRY, nn_layers, resolve


def make_conv(seed=0, cin=3, cout=8):
    return nnx.Conv(cin, cout, kernel_size=(3, 3), padding="SAME",
                    rngs=nnx.Rngs(seed))


def make_linear(seed=0, cin=8, cout=16):
    return nnx.Linear(cin, cout, rngs=nnx.Rngs(seed))


def calib(layer, x):
    layer.calibrating = True
    layer(x)
    layer.calibrating = False


class TestQnLsqLayers:
    def test_weight_sharing(self):
        conv = make_conv()
        q = ConvQnLsq(conv, weight_bit=8, input_bit=8, output_bit=8)
        assert q.kernel is conv.kernel  # surgery contract: shared param

    def test_use_fp_bypass_exact(self):
        conv = make_conv()
        q = ConvQnLsq(conv, weight_bit=4, input_bit=4, output_bit=4)
        q.use_FP = True
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        np.testing.assert_allclose(q(x), conv(x), rtol=1e-5, atol=1e-6)

    def test_8bit_close_4bit_coarser(self):
        conv = make_conv()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        ref = conv(x)
        q8 = ConvQnLsq(conv, weight_bit=8, input_bit=8, output_bit=8)
        calib(q8, x)
        err8 = float(jnp.abs(q8(x) - ref).max())
        q4 = ConvQnLsq(conv, weight_bit=4, input_bit=4, output_bit=4)
        calib(q4, x)
        err4 = float(jnp.abs(q4(x) - ref).max())
        assert err8 < err4
        assert err8 < 0.2

    def test_step_size_receives_gradient(self):
        linear = make_linear()
        q = LinearQnLsq(linear, weight_bit=4, input_bit=4, output_bit=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        calib(q, x)

        def loss(m, x):
            return jnp.sum(m(x) ** 2)

        grads = nnx.grad(loss)(q, x)
        assert abs(float(grads.step_size_weight[...])) > 0
        assert abs(float(grads.step_size_input[...])) > 0

    def test_calibration_sets_absmax_over_halflevel(self):
        linear = make_linear()
        q = LinearQnLsq(linear, weight_bit=8, input_bit=8, output_bit=8)
        x = jnp.linspace(-2.0, 2.0, 32).reshape(4, 8)
        calib(q, x)
        np.testing.assert_allclose(float(q.step_size_input[...]), 2.0 / 127,
                                   rtol=1e-5)

    def test_noise_draws_differ_per_call(self):
        conv = make_conv()
        q = ConvQnLsq(conv, weight_bit=8, input_bit=8, output_bit=8,
                      noise_scale=0.1)
        x = jnp.ones((1, 8, 8, 3))
        calib(q, x)
        assert not np.allclose(np.asarray(q(x)), np.asarray(q(x)))

    def test_update_para_rescales_step_sizes(self):
        linear = make_linear()
        q = LinearQnLsq(linear, weight_bit=8, input_bit=8, output_bit=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        calib(q, x)
        s_before = float(q.step_size_weight[...])
        q.update_para(weight_bit=4)
        np.testing.assert_allclose(float(q.step_size_weight[...]),
                                   s_before * 16, rtol=1e-5)
        assert q.weight_bit == 4

    def test_lsq_int_mode_levels_and_grad_path(self):
        """isint=True returns integer levels while keeping the step-size
        gradient alive through s/stop_grad(s) (reference:
        quant_noise_utils.py:119, checked by the
        layers_grad_test_lsq_int_grad.py scripts)."""
        from stablediffusion_pytorch_tpu.ops.quant import data_quant_lsq

        x = jnp.array([0.3, -0.8, 2.0, 5.0])
        s = jnp.asarray(0.5)
        q, scale = data_quant_lsq(x, 4, s, isint=True)
        np.testing.assert_allclose(q, [1.0, -2.0, 4.0, 7.0], rtol=1e-6)
        np.testing.assert_allclose(scale, 2.0)  # 1/step

        g = jax.grad(lambda ss: jnp.sum(data_quant_lsq(x, 4, ss, True)[0]))(s)
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestBitSplitLayer:
    def test_equals_plain_lsq_when_ideal(self):
        """bit-split path == plain LSQ output (reference equivalence test:
        test_script/layers_LSQ_bit_split_test_speed_and_output.py:12-70)."""
        conv = make_conv()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        # compare pre-output-quant (summation order at the output-quant
        # rounding boundary can flip a level, as in the reference's
        # numeric-diff check)
        q = ConvQnLsq(conv, weight_bit=8, input_bit=8, output_bit=8,
                      output_quant=False)
        calib(q, x)
        qb = ConvLsqBitSplit(conv, weight_bit=8, input_bit=8, output_bit=8,
                             dac_bit=5, output_quant=False)
        qb.step_size_input = q.step_size_input
        qb.step_size_weight = q.step_size_weight
        np.testing.assert_allclose(np.asarray(q(x)), np.asarray(qb(x)),
                                   rtol=1e-4, atol=1e-5)


class TestAddaLayer:
    def test_adc_saturation(self):
        conv = make_conv()
        q = ConvLsqAdda(conv, weight_bit=4, input_bit=8, output_bit=8,
                        dac_bit=5, adc_bit=3, adc_k=1.0, output_quant=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3)) * 4
        calib(q, x)
        # with a 3-bit ADC the per-slice outputs clamp to [-4, 3]
        out = q(x)
        assert np.isfinite(np.asarray(out)).all()

    def test_adc_gain_gradient_flows(self):
        conv = make_conv()
        q = ConvLsqAdda(conv, weight_bit=4, input_bit=8, output_bit=8,
                        dac_bit=5, adc_bit=8, adc_k=1.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
        calib(q, x)

        def loss(m, x):
            return jnp.sum(m(x) ** 2)

        grads = nnx.grad(loss)(q, x)
        assert abs(float(grads.adc_gain[...])) >= 0  # exists & finite
        assert np.isfinite(float(grads.adc_gain[...]))

    def test_update_para_adjusts_adc_gain(self):
        conv = make_conv()
        q = ConvLsqAdda(conv, weight_bit=4, input_bit=8, output_bit=8,
                        dac_bit=5, adc_bit=8, adc_k=1.0)
        q.adc_gain.value = jnp.asarray(8.0)
        q.update_para(adc_bit=6)  # -2 bits -> gain / 4
        np.testing.assert_allclose(float(q.adc_gain[...]), 2.0)
        assert q.adc_bit == 6


class TestAddaCimLayer:
    def test_linear_cim_blocks_match_unblocked_when_adc_ideal(self):
        """With a huge ADC range the block-tiled MVM must equal the plain
        int matmul path (padding exactness)."""
        linear = make_linear(cin=24, cout=20)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 24))
        q = LinearLsqAddaCim(linear, weight_bit=8, input_bit=8, output_bit=8,
                             dac_bit=5, adc_bit=24, adc_k=1.0,
                             array_size=(8, 8), output_quant=False)
        calib(q, x)
        from stablediffusion_pytorch_tpu.cim.layers import LinearLsqBitSplit

        qb = LinearLsqBitSplit(linear, weight_bit=8, input_bit=8,
                               output_bit=8, dac_bit=5, output_quant=False)
        qb.step_size_input = q.step_size_input
        qb.step_size_weight = q.step_size_weight
        np.testing.assert_allclose(np.asarray(q(x)), np.asarray(qb(x)),
                                   rtol=1e-4, atol=1e-4)

    def test_adc_noise_applied(self):
        linear = make_linear(cin=16, cout=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        q1 = LinearLsqAddaCim(linear, weight_bit=8, input_bit=8, output_bit=8,
                              dac_bit=5, adc_bit=8, adc_k=1.0,
                              array_size=(8, 8), output_quant=False)
        calib(q1, x)
        base = np.asarray(q1(x))
        q1.gain_noise_scale = 0.5
        q1.offset_noise_scale = 0.5
        noisy = np.asarray(q1(x))
        assert not np.allclose(base, noisy)


class TestRegistry:
    def test_families_present(self):
        for fam in ["layers_qn", "layers_qn_lsq", "layers_q_lsq",
                    "layers_qn_lsq_bit_split", "layers_qn_lsq_adda",
                    "layers_qn_lsq_adda_cim"]:
            assert fam in REGISTRY

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            resolve("layers_nope")


class TestProgressiveHarness:
    def _net(self):
        class Net(nnx.Module):
            def __init__(self, rngs):
                self.conv = make_conv()
                self.fc = make_linear()

            def __call__(self, x):
                h = self.conv(x)
                return self.fc(h.reshape(h.shape[0], -1, 8))

        return Net(nnx.Rngs(0))

    def test_convert_calibrate_revert_roundtrip(self):
        net = self._net()
        pt = ProgressiveTrain(net)
        x = jnp.ones((2, 8, 8, 3))
        y0 = net(x)
        assert pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                                    weight_bit=8, input_bit=8,
                                    output_bit=8) == 2
        calibrate_quant_layers(net, lambda m: m(x))
        assert pt.revert_to_nn_layer() == 2
        np.testing.assert_allclose(np.asarray(net(x)), np.asarray(y0),
                                   rtol=1e-6)

    def test_progressive_schedule_interpolation(self):
        net = self._net()
        pt = ProgressiveTrain(net)
        pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                             weight_bit=8, input_bit=8, output_bit=8)
        seen = []

        def train_model(cycle, **kw):
            layer = dict(pt.customized_layers())["conv"]
            seen.append((cycle, layer.weight_bit, round(layer.noise_scale, 3)))

        pt.train_model = train_model
        pt.progressive_train(qn_cycle=5, weight_bit_range=[8, 4],
                             noise_scale_range=[0.0, 0.08])
        assert seen[0] == (0, 8, 0.0)
        assert seen[-1] == (4, 4, 0.08)
        assert len(seen) == 5

    def test_quantized_model_trains_under_jit(self):
        """QAT end-to-end: converted model takes grad steps under nnx.jit."""
        import optax

        net = self._net()
        pt = ProgressiveTrain(net)
        pt.convert_to_layers(list(nn_layers), "layers_qn_lsq", weight_bit=8,
                             input_bit=8, output_bit=8, noise_scale=0.01)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 3))
        calibrate_quant_layers(net, lambda m: m(x))
        opt = nnx.Optimizer(net, optax.adam(1e-3), wrt=nnx.Param)

        @nnx.jit
        def step(net, opt, x):
            def loss(m):
                return jnp.mean(m(x) ** 2)

            l, g = nnx.value_and_grad(loss)(net)
            opt.update(net, g)
            return l

        l0 = float(step(net, opt, x))
        for _ in range(5):
            l = float(step(net, opt, x))
        assert np.isfinite(l) and l < l0

    def test_ops_and_energy(self):
        net = self._net()
        pt = ProgressiveTrain(net)
        ops = pt.gen_ops_dict(jnp.ones((2, 8, 8, 3)))
        assert set(ops) == {"conv", "fc"}
        assert ops["conv"]["ops"] > 0
        energy = pt.get_energy_dict(ops)
        assert energy["conv"]["acim_energy_j"] > 0
        assert energy["conv"]["dmac_energy_j"] > 0
        assert 0 < energy["conv"]["acim_utilization"] <= 1


class TestAdcGainBitRescale:
    def test_tc05_subunity_gain_survives_bit_change(self):
        """Round-3 regression: with a TC05-style fixed sub-unity gain range
        (1/64), a dac/adc/weight bit change must rescale the gain within
        [0.8*gain_min, 1.2*gain_max] (reference layers_utils_adda.py:53-74),
        NOT floor it at 1.0 — the old floor snapped the ADC scale 64x too
        high and saturated every block."""
        linear = make_linear(cin=16, cout=16)
        q = LinearLsqAddaCim(linear, weight_bit=4, input_bit=8, output_bit=8,
                             dac_bit=5, adc_bit=8, adc_k=9.071428571,
                             array_size=(8, 8))
        q.adc_adjust_mode = "current"
        q.adc_gain_min = 1 / 64
        q.adc_gain_max = 1 / 64
        q.adc_gain.value = jnp.asarray(1 / 64)
        q.update_para(dac_bit=4)  # halves the DAC range -> gain doubles
        g = float(q.adc_gain[...])
        assert g <= 1.2 * q.adc_gain_max + 1e-9, g
        assert g >= 0.8 * q.adc_gain_min - 1e-9, g
        # and an unchanged update leaves the gain alone
        q.adc_gain.value = jnp.asarray(1 / 64)
        q.update_para(dac_bit=4)
        assert abs(float(q.adc_gain[...]) - 1 / 64) < 1e-9


class TestCimConvFidelity:
    def test_conv_cim_matches_plain_conv_at_benign_adc(self):
        """Round-3 regression for the im2col/weight-row-order scramble:
        ConvLsqAddaCim must approximate the plain conv it wraps once the
        ADC is benign (fine scale, wide range) and bits are high. The old
        (kh,kw,in)-major weight reshape contracted against channel-major
        patches and produced garbage (conversion loss 1.0 on a trained
        model) while every shape still checked out."""
        conv = make_conv(cin=5, cout=6)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 5))
        ref = np.asarray(conv(x))
        q = ConvLsqAddaCim(conv, weight_bit=8, input_bit=8, output_bit=8,
                           dac_bit=8, adc_bit=16, adc_k=1.0,
                           array_size=(64, 64), noise_scale=0.0,
                           output_quant=False)
        calib(q, x)
        out = np.asarray(q(x))
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        assert rel < 0.05, rel


class TestChipSimConvFidelity:
    def test_conv_chip_sim_matches_conv_numerics(self):
        """ConvChipSim (numpy chip runtime) vs lax conv at noise 0 / wide
        ADC — the original test only asserted shapes, which let the same
        channel-major/kh-major row mismatch through."""
        from stablediffusion_pytorch_tpu.cim.int_layers import ConvChipSim

        k = np.random.default_rng(0).normal(size=(3, 3, 2, 4)).astype(
            np.float32) * 0.5
        x = np.abs(np.random.default_rng(1).normal(size=(1, 8, 8, 2))
                   ).astype(np.float32)
        ref = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        layer = ConvChipSim(k, stride=1, padding=1, noise_scale=0.0,
                            adc_bits=16, dac_bits=8, it_time=100)
        out = layer(x, relu=False, input_quant=True)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.99, corr
