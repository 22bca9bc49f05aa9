"""Integer-arithmetic inference layers + custom helper modules + chip-sim
layers — the remaining cim_layers/ families.

  * ConvInt / LinearInt — pure integer conv/linear on pre-quantized operands
    (reference: layers_lsq_int.py Conv2d_int:23-45)
  * ConvLsqInt / LinearLsqInt — built FROM a trained LSQ layer: freeze its
    step sizes, run the forward entirely in integer levels with an extended
    weight bit budget, rescale at the end; optional int-STE gradient for
    on-chip-training simulation (reference: layers_lsq_int.py
    Conv2d_lsq_int:47-246, scaled/unscaled variants)
  * fit_lsq_int_layer — distillation fit of an int layer to its float
    teacher (reference: train_lsq_int_layers)
  * QuantLayer / BitShiftLayer / IdentityLayer — helper modules
    (reference: cim_layers/custom_modules.py:19-95)
  * ConvChipSim / LinearChipSim — eager-only layers that route the MVM
    through the chip runtime simulator (the replacement for the closed
    c200_sdk/sdk_512k on-chip paths of layers_lsq_144k_FPGA_expansion.py
    and layers_512k.py; the simulator numerics live in cim/runtime_sim.py)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim.layers import (
    QuantState, _QuantConvBase, _QuantLinearBase, _conv,
)
from stablediffusion_pytorch_tpu.ops.quant import data_quant_lsq
from stablediffusion_pytorch_tpu.ops.ste import round_pass


# ---------------------------------------------------------------------------
# pure-int primitives (reference: Conv2d_int)
# ---------------------------------------------------------------------------

class ConvInt(nnx.Module):
    """Integer conv on pre-quantized operands (no state)."""

    def __init__(self, strides=(1, 1), padding="SAME", groups=1):
        self.strides = strides
        self.padding = padding
        self.groups = groups

    def __call__(self, x_int, weight_int, bias_int=None):
        y = _conv(x_int, weight_int, self.strides, self.padding, self.groups)
        if bias_int is not None:
            y = y + bias_int
        return y


class LinearInt(nnx.Module):
    def __call__(self, x_int, weight_int, bias_int=None):
        y = x_int @ weight_int
        if bias_int is not None:
            y = y + bias_int
        return y


# ---------------------------------------------------------------------------
# LSQ-int layers built from trained LSQ layers (reference: Conv2d_lsq_int)
# ---------------------------------------------------------------------------

class _LsqIntState(nnx.Module):
    def _init_int(self, src: QuantState, weight_bit_extension: int,
                  int_grad: bool, x_detach: bool):
        self.weight_bit = src.weight_bit
        self.input_bit = src.input_bit
        self.output_bit = src.output_bit
        self.weight_bit_extension = weight_bit_extension
        self.extended_levels = 2 ** weight_bit_extension
        self.int_grad = int_grad
        self.x_detach = x_detach
        # frozen copies of the trained step sizes
        self.step_size_input = nnx.Param(jnp.asarray(src.step_size_input[...]))
        self.step_size_weight = nnx.Param(
            jnp.asarray(src.step_size_weight[...]))

    def _quant_in(self, x):
        x_q, _ = data_quant_lsq(x, self.input_bit,
                                self.step_size_input[...], isint=True)
        if self.x_detach:
            x_q = jax.lax.stop_gradient(x_q)
        return x_q

    def _quant_w(self, w):
        # extended precision: weight levels scaled by 2^extension so small
        # integer updates are representable (on-chip training sim,
        # layers_lsq_int.py weight_bit_extension)
        w_q, _ = data_quant_lsq(w, self.weight_bit,
                                self.step_size_weight[...], isint=True)
        return round_pass(w_q * self.extended_levels)

    def _rescale(self, y_int):
        return (y_int * self.step_size_input[...] *
                self.step_size_weight[...] / self.extended_levels)


class ConvLsqInt(_QuantConvBase, _LsqIntState):
    def __init__(self, conv_lsq, weight_bit_extension: int = 4,
                 int_grad: bool = False, x_detach: bool = False):
        self._init_from_conv(conv_lsq)
        self._init_quant_state(conv_lsq.weight_bit, conv_lsq.input_bit,
                               conv_lsq.output_bit, 0.0)
        self._init_int(conv_lsq, weight_bit_extension, int_grad, x_detach)

    def __call__(self, x):
        x_q = self._quant_in(x)
        w_q = self._quant_w(self.kernel[...])
        y = _conv(x_q, w_q, self.strides, self.padding, self.groups)
        y = self._rescale(y)
        if self.bias is not None:
            y = y + self.bias[...]
        return y


class LinearLsqInt(_QuantLinearBase, _LsqIntState):
    def __init__(self, linear_lsq, weight_bit_extension: int = 4,
                 int_grad: bool = False, x_detach: bool = False):
        self._init_from_linear(linear_lsq)
        self._init_quant_state(linear_lsq.weight_bit, linear_lsq.input_bit,
                               linear_lsq.output_bit, 0.0)
        self._init_int(linear_lsq, weight_bit_extension, int_grad, x_detach)

    def __call__(self, x):
        x_q = self._quant_in(x)
        w_q = self._quant_w(self.kernel[...])
        y = self._rescale(x_q @ w_q)
        if self.bias is not None:
            y = y + self.bias[...]
        return y


def fit_lsq_int_layer(int_layer, teacher_fn, batches, lr: float = 1e-3,
                      steps: int = 100):
    """Distill an int layer onto its float teacher's outputs (reference:
    train_lsq_int_layers). ``batches`` is an iterable of inputs."""
    import optax

    opt = nnx.Optimizer(int_layer, optax.adam(lr), wrt=nnx.Param)

    @nnx.jit
    def step(layer, opt, x, target):
        def loss(m):
            return jnp.mean((m(x) - target) ** 2)

        l, g = nnx.value_and_grad(loss)(layer)
        opt.update(layer, g)
        return l

    losses = []
    it = iter(batches)
    for _ in range(steps):
        try:
            x = next(it)
        except StopIteration:
            it = iter(batches)
            x = next(it)
        losses.append(float(step(int_layer, opt,
                                 x, jax.lax.stop_gradient(teacher_fn(x)))))
    return losses


# ---------------------------------------------------------------------------
# helper modules (reference: custom_modules.py)
# ---------------------------------------------------------------------------

class QuantLayer(nnx.Module):
    """Standalone LSQ quantizer module (reference: Quant_layer:19-60)."""

    def __init__(self, isint: bool, data_bit: int,
                 step_size: Optional[float] = None):
        self.isint = isint
        self.data_bit = data_bit
        self.calibrating = False
        self.step_size = nnx.Param(jnp.asarray(step_size or 1.0))

    def __call__(self, x):
        if self.calibrating:
            from stablediffusion_pytorch_tpu.ops.quant import data_quant

            _, scale = data_quant(x, self.data_bit, isint=True)
            self.step_size.value = jnp.where(
                self.step_size[...] == 1.0, 1.0 / scale,
                self.step_size[...])
        q, _ = data_quant_lsq(x, self.data_bit, self.step_size[...],
                              isint=self.isint)
        return q


class BitShiftLayer(nnx.Module):
    """Power-of-two rescale (reference: Bit_shift_layer)."""

    def __init__(self, shift_bits: int = 0):
        self.shift_bits = shift_bits

    def __call__(self, x):
        return x * (2.0 ** self.shift_bits)


class IdentityLayer(nnx.Module):
    def __call__(self, x):
        return x


# ---------------------------------------------------------------------------
# chip-simulator layers (eager/host-side; replaces the closed chip SDKs)
# ---------------------------------------------------------------------------

class ConvChipSim:
    """Eager conv through the numpy chip runtime simulator (the on-chip
    inference path of layers_lsq_144k_FPGA_expansion/layers_512k with
    use_simulator=True). NOT jittable — mirrors the reference, where the
    chip call is a host SDK roundtrip."""

    def __init__(self, kernel_hwio: np.ndarray, stride=1, padding=1,
                 it_time=10, dac_bits=2, adc_bits=4, noise_scale=0.05,
                 seed=0):
        kh, kw, cin, cout = kernel_hwio.shape
        self.kernel_size = kh
        self.stride = stride
        self.padding = padding
        # feature_map_to_input flattens (C, kh, kw) windows CHANNEL-major,
        # so the weight rows must be IHWO-ordered (round-3 fix — the plain
        # HWIO reshape scrambled the contraction; the old test only checked
        # shapes)
        self.w2d = np.ascontiguousarray(
            np.transpose(np.asarray(kernel_hwio), (2, 0, 1, 3))
        ).reshape(cin * kh * kw, cout)
        self.kw = dict(it_time=it_time, dac_bits=dac_bits,
                       adc_bits=adc_bits, noise_scale=noise_scale)
        self.rng = np.random.default_rng(seed)

    def __call__(self, x_nhwc: np.ndarray, relu: bool = True,
                 input_quant: bool = True) -> np.ndarray:
        from stablediffusion_pytorch_tpu.cim.runtime_sim import conv2d_sim

        outs = []
        for img in np.asarray(x_nhwc):
            chw = np.transpose(img, (2, 0, 1))
            out = conv2d_sim(chw, self.w2d, stride=self.stride,
                             kernel_size=self.kernel_size,
                             padding=self.padding, relu=relu,
                             input_quant=input_quant, rng=self.rng,
                             **self.kw)
            outs.append(np.transpose(out, (1, 2, 0)))
        return np.stack(outs)


class LinearChipSim:
    def __init__(self, weight_io: np.ndarray, it_time=10, dac_bits=2,
                 adc_bits=4, noise_scale=0.05, seed=0):
        self.w2d = np.asarray(weight_io)
        self.kw = dict(it_time=it_time, dac_bits=dac_bits,
                       adc_bits=adc_bits, noise_scale=noise_scale)
        self.rng = np.random.default_rng(seed)

    def __call__(self, x: np.ndarray, relu: bool = False) -> np.ndarray:
        from stablediffusion_pytorch_tpu.cim.runtime_sim import linear_sim

        return np.stack([linear_sim(v, self.w2d, relu=relu, rng=self.rng,
                                    **self.kw) for v in np.asarray(x)])
