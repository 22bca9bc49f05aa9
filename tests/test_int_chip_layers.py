"""Integer-arithmetic layers, helper modules, chip-sim layers, multi-gains."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim import ProgressiveTrain
from stablediffusion_pytorch_tpu.cim.int_layers import (
    BitShiftLayer,
    ConvChipSim,
    ConvInt,
    IdentityLayer,
    LinearChipSim,
    LinearLsqInt,
    QuantLayer,
    fit_lsq_int_layer,
)
from stablediffusion_pytorch_tpu.cim.layers import (
    LinearLsqAddaCim,
    LinearQnLsq,
)
from stablediffusion_pytorch_tpu.cim.registry import REGISTRY, nn_layers


class TestIntLayers:
    def test_conv_int_pure_integer(self):
        ci = ConvInt(strides=(1, 1), padding="SAME")
        x = jnp.round(jax.random.uniform(jax.random.PRNGKey(0),
                                         (1, 4, 4, 2)) * 10)
        w = jnp.round(jax.random.uniform(jax.random.PRNGKey(1),
                                         (3, 3, 2, 3)) * 5 - 2)
        y = ci(x, w)
        np.testing.assert_allclose(y, np.round(np.asarray(y)))

    def test_lsq_int_matches_lsq_float(self):
        """Int-layer forward equals the source LSQ layer's dequantized
        forward (the reference's lsq-vs-int equivalence scripts)."""
        lin = nnx.Linear(8, 6, rngs=nnx.Rngs(0))
        q = LinearQnLsq(lin, weight_bit=8, input_bit=8, output_bit=0)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        q.calibrating = True
        q(x)
        q.calibrating = False
        qi = LinearLsqInt(q, weight_bit_extension=4)
        np.testing.assert_allclose(np.asarray(qi(x)), np.asarray(q(x)),
                                   rtol=1e-3, atol=1e-4)

    def test_convert_to_lsq_int_layers(self):
        class Net(nnx.Module):
            def __init__(self):
                self.fc = nnx.Linear(8, 8, rngs=nnx.Rngs(0))

            def __call__(self, x):
                return self.fc(x)

        net = Net()
        pt = ProgressiveTrain(net)
        pt.convert_to_layers(list(nn_layers), "layers_qn_lsq",
                             weight_bit=8, input_bit=8, output_bit=0)
        x = jnp.ones((2, 8))
        from stablediffusion_pytorch_tpu.cim import calibrate_quant_layers

        calibrate_quant_layers(net, lambda m: m(x))
        assert pt.convert_to_lsq_int_layers() == 1
        assert np.isfinite(np.asarray(net(x))).all()

    def test_distillation_fit(self):
        lin = nnx.Linear(4, 4, rngs=nnx.Rngs(0))
        q = LinearQnLsq(lin, weight_bit=4, input_bit=4, output_bit=0)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        q.calibrating = True
        q(x)
        q.calibrating = False
        qi = LinearLsqInt(q, weight_bit_extension=2)
        losses = fit_lsq_int_layer(qi, lambda v: lin(v), [x], steps=40,
                                   lr=5e-4)
        assert np.isfinite(losses).all()
        assert min(losses) <= losses[0]  # fit moves toward the teacher
        assert losses[-1] < 10 * losses[0]  # and does not diverge


class TestHelperModules:
    def test_quant_layer(self):
        ql = QuantLayer(isint=False, data_bit=4)
        x = jnp.linspace(-1, 1, 8)
        ql.calibrating = True
        ql(x)
        ql.calibrating = False
        q = ql(x)
        levels = np.unique(np.round(np.asarray(q) /
                                    float(ql.step_size[...])))
        assert len(levels) <= 15  # 4-bit symmetric

    def test_bit_shift_and_identity(self):
        x = jnp.ones(3)
        np.testing.assert_allclose(BitShiftLayer(3)(x), 8.0 * np.ones(3))
        assert IdentityLayer()(x) is x


class TestChipSimLayers:
    def test_conv_chip_sim(self):
        k = np.random.default_rng(0).normal(size=(3, 3, 2, 4)).astype(
            np.float32)
        layer = ConvChipSim(k, stride=1, padding=1, noise_scale=0.0,
                            adc_bits=16)
        x = np.random.default_rng(1).normal(size=(2, 8, 8, 2)).astype(
            np.float32)
        out = layer(x)
        assert out.shape == (2, 8, 8, 4)
        assert (out >= 0).all()  # relu default

    def test_linear_chip_sim(self):
        w = np.eye(4, dtype=np.float32) * 2
        layer = LinearChipSim(w, noise_scale=0.0, adc_bits=16)
        out = layer(np.arange(8, dtype=np.float32).reshape(2, 4))
        assert out.shape == (2, 4)


class TestMultiGains:
    def test_enable_and_forward(self):
        lin = nnx.Linear(32, 24, rngs=nnx.Rngs(0))
        q = LinearLsqAddaCim(lin, weight_bit=8, input_bit=8, output_bit=0,
                             dac_bit=5, adc_bit=24, adc_k=1.0,
                             array_size=(16, 8))
        nc = q.enable_multi_gains()
        assert nc == 3  # 24 cols / 8 per block
        assert q.adc_gain[...].shape == (3,)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
        q.calibrating = True
        q(x)
        q.calibrating = False
        out = q(x)
        assert np.isfinite(np.asarray(out)).all()

    def test_registry_aliases(self):
        assert "layers_qn_lsq_adda_cim_multi_gains" in REGISTRY
        assert "layers_qn_lsq_adda_cim_row_split" in REGISTRY
