"""Quantized drop-in twins of nnx.Conv / nnx.Linear — the CIM layer zoo.

Re-implements the reference's cim_layers/ families (SURVEY.md §2.8) as nnx
modules that SHARE the parent layer's kernel/bias parameters (surgery swaps
the module, not the weights):

  family            | reference file                     | behavior
  ------------------+------------------------------------+---------------------
  Conv/LinearQn     | layers_qn.py:12-216                | absmax quant + noise
  Conv/LinearQnLsq  | layers_qn_lsq.py:17-216            | LSQ in/w/out + noise
  Conv/LinearQLsq   | layers_q_lsq.py:16-325             | LSQ, no noise
  Conv/LinearLsqBitSplit | layers_qn_lsq_bit_split.py:150-192 | + DAC bit-slicing
  Conv/LinearLsqAdda     | layers_qn_lsq_adda.py:239-283 | + ADC scale/clamp/round per slice
  Conv/LinearLsqAddaCim  | layers_qn_lsq_adda_cim_opt.py:255-292 | + array-tiled MVM with per-block ADC

TPU-first departure: the reference loops Python-side over DAC slices and
weight blocks (layers_qn_lsq_adda_cim_opt.py:195-233 — its dominant QAT
cost). Here slices live on a leading axis and array blocks on einsum axes,
so the whole CIM simulation is ONE batched matmul + elementwise ADC math
that XLA fuses onto the MXU; zero-padding to the array grid is numerically
exact because padded rows contribute 0 before the (nonlinear) ADC and padded
columns are sliced off after it.

Static vs traced: bit widths, use_FP, and ADC/DAC bits are plain Python
attributes — changing them (update_para) triggers a recompile, but only at
the schedule's rare bit transitions. The continuously-annealed noise scales
ride module STATE as ``QuantKnob`` variables (traced scalar operands), so
the per-cycle noise anneal costs ZERO retraces — where the reference pays a
full recompile every progressive cycle (SURVEY.md §7 hard parts). Step
sizes and adc_gain are learned nnx.Params.

LSQ step-size init is data-driven on the first batch in the reference
(layers_utils_lsq.py:31-49); here it is an explicit eager calibration pass:
``calibrate_quant_layers(model, batch_fwd)``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import errors as flax_errors
from flax import nnx

from stablediffusion_pytorch_tpu.ops.quant import (
    add_noise,
    data_quant,
    data_quant_lsq,
    data_quant_pass,
    get_external_noise_key,
    weight_quant_lsq,
)
from stablediffusion_pytorch_tpu.ops.ste import clamp_pass, round_pass
from stablediffusion_pytorch_tpu.ops.bit_ops import bit_len_for


# ---------------------------------------------------------------------------
# shared quant-state mixin
# ---------------------------------------------------------------------------

class QuantKnob(nnx.Variable):
    """Continuously-annealed quant knob (the noise scales).

    Lives in module STATE (a traced scalar operand), not in the graphdef,
    so the progressive schedule can move it EVERY cycle without retracing
    or recompiling the train step. Bit widths stay static attrs — they
    change only a handful of times per stage, and each change genuinely
    needs a recompile (they select quantizer constants). The reference
    pays a full per-cycle torch recompile for both (SURVEY.md §7); here
    only the rare bit transitions pay one."""


class QuantState(nnx.Module):
    """Holds bits/noise config, learned step sizes, and calibration logic."""

    def _init_quant_state(self, weight_bit, input_bit, output_bit,
                          noise_scale, input_quant=True, output_quant=True,
                          weight_quant=True, gain_noise_scale=0.0,
                          offset_noise_scale=0.0, seed=0):
        self.use_FP = False
        self.calibrating = False
        self.weight_bit = weight_bit
        self.input_bit = input_bit
        self.output_bit = output_bit
        # annealed scalars ride state; static bools gate the (rare) on/off
        # graph shape (see QuantKnob docstring). Init goes THROUGH the
        # property setters so nnx registers the attr names in its pytree
        # node registry now — a later first-write would mutate the graphdef
        # once and cost one spurious retrace.
        self.noise_scale_v = QuantKnob(jnp.float32(0.0))
        self.gain_noise_scale_v = QuantKnob(jnp.float32(0.0))
        self.offset_noise_scale_v = QuantKnob(jnp.float32(0.0))
        self.noise_scale = float(noise_scale)
        self.gain_noise_scale = float(gain_noise_scale)
        self.offset_noise_scale = float(offset_noise_scale)
        # bit width 0 disables that quantizer (reference: data_quant's
        # data_bit == 0 passthrough, quant_noise_utils.py:9-10)
        self.input_quant = input_quant and input_bit != 0
        self.output_quant = output_quant and output_bit != 0
        self.weight_quant = weight_quant and weight_bit != 0
        self.seed = seed
        # scalar learned step sizes, sentinel 1.0 = uninitialized
        # (reference: layers_qn_lsq.py:60-62)
        self.step_size_input = nnx.Param(jnp.asarray(1.0))
        self.step_size_output = nnx.Param(jnp.asarray(1.0))
        self.step_size_weight = nnx.Param(jnp.asarray(1.0))
        self.noise_rngs = nnx.Rngs(noise=seed)

    # -- annealed-knob float views (eager-only: logging / ckpt naming) ---
    @property
    def noise_scale(self) -> float:
        return float(self.noise_scale_v[...])

    @noise_scale.setter
    def noise_scale(self, v):
        self.noise_scale_v.value = jnp.float32(v)
        self.noise_on = bool(v)

    @property
    def gain_noise_scale(self) -> float:
        return float(self.gain_noise_scale_v[...])

    @gain_noise_scale.setter
    def gain_noise_scale(self, v):
        self.gain_noise_scale_v.value = jnp.float32(v)
        self.gain_offset_noise_on = bool(v) or bool(self.offset_noise_scale)

    @property
    def offset_noise_scale(self) -> float:
        return float(self.offset_noise_scale_v[...])

    @offset_noise_scale.setter
    def offset_noise_scale(self, v):
        self.offset_noise_scale_v.value = jnp.float32(v)
        self.gain_offset_noise_on = bool(v) or bool(self.gain_noise_scale)

    # -- calibration (jit-safe: traced where on the 1.0 sentinel) --------
    def _maybe_calibrate(self, param: nnx.Param, x: jax.Array, bit: int):
        if self.calibrating:
            _, scale = data_quant(x, data_bit=bit, isint=True)
            init = jnp.asarray(1.0 / scale, jnp.float32)
            param.value = jnp.where(param[...] == 1.0, init, param[...])

    # -- quant helpers (reference: layers_utils_lsq.py:37-83) ------------
    def _input_q(self, x, isint):
        if not self.input_quant:
            return x, jnp.asarray(1.0)
        self._maybe_calibrate(self.step_size_input, x, self.input_bit)
        return data_quant_lsq(x, self.input_bit, self.step_size_input[...],
                              isint=isint)

    def _noise_key(self, x: jax.Array) -> jax.Array:
        """Fresh key per forward, resolved in priority order:

        1. An external key set by ``ops.quant.external_noise_key`` (the
           samplers thread a fresh per-step split through their scan
           bodies): fold in the per-layer seed → noise i.i.d. across
           denoise steps, independent of the data, decorrelated across
           layers, reproducible from the sampler key. This matches the
           reference's per-call resampling (quant_noise_utils.py:92-98)
           at inference.
        2. The layer's stateful RNG stream when the module is threaded
           through the transform (nnx.jit/nnx.grad — training: true
           i.i.d. resampling per call).
        3. Inside a closure-captured jitted scan with no external key,
           flax forbids mutating the RNG count (TraceContextError): fall
           back to a stateless key derived from the input data. Caveat
           (VERDICT r3): this makes weight noise a pure function of the
           activations — same input ⇒ same "noise", data-correlated —
           where the reference draws independently per call. Across
           denoise steps the activations change, so steps still see
           different draws. Only custom sampling loops that bypass the
           shipped samplers hit this branch."""
        ext = get_external_noise_key()
        if ext is not None:
            return jax.random.fold_in(ext, self.seed)
        try:
            return self.noise_rngs.noise()
        except flax_errors.TraceContextError:
            h = jnp.sum(jax.lax.stop_gradient(x).astype(jnp.float32))
            salt = jnp.abs(jnp.nan_to_num(h * 1e4)).astype(jnp.int32)
            return jax.random.fold_in(jax.random.PRNGKey(self.seed), salt)

    def _weight_q(self, w, isint, noise_key=None):
        w_scale = jnp.asarray(1.0)
        if self.weight_quant:
            self._maybe_calibrate(self.step_size_weight, w, self.weight_bit)
            w, w_scale = weight_quant_lsq(
                w, self.weight_bit, self.step_size_weight[...], isint=isint)
        if self.noise_on:
            key = noise_key if noise_key is not None else self._noise_key(w)
            w = add_noise(w, key, self.noise_scale_v[...])
        return w, w_scale

    def _output_q(self, x, isint=False):
        if not self.output_quant:
            return x, jnp.asarray(1.0)
        self._maybe_calibrate(self.step_size_output, x, self.output_bit)
        return data_quant_lsq(x, self.output_bit, self.step_size_output[...],
                              isint=isint)

    # -- progressive schedule hook (reference: layers_qn_lsq.py:64-98) ---
    def update_para(self, use_FP=False, weight_bit=None, input_bit=None,
                    output_bit=None, noise_scale=None, gain_noise_scale=None,
                    offset_noise_scale=None, **kw):
        old = (self.weight_bit, self.input_bit, self.output_bit)
        self.use_FP = use_FP
        if weight_bit is not None:
            self.weight_bit = int(weight_bit)
        if input_bit is not None:
            self.input_bit = int(input_bit)
        if output_bit is not None:
            self.output_bit = int(output_bit)
        if noise_scale is not None:
            self.noise_scale = float(noise_scale)
        if gain_noise_scale is not None:
            self.gain_noise_scale = float(gain_noise_scale)
        if offset_noise_scale is not None:
            self.offset_noise_scale = float(offset_noise_scale)
        # noise scales route through the property setters above -> the
        # QuantKnob state vars + static gates; no graphdef change per cycle
        # bit-width-change step rescale (layers_utils_lsq.py:11-28)
        for param, b_old, b_new in [
            (self.step_size_weight, old[0], self.weight_bit),
            (self.step_size_input, old[1], self.input_bit),
            (self.step_size_output, old[2], self.output_bit),
        ]:
            if b_old != b_new:
                param.value = param[...] / (2.0 ** (b_new - b_old))


# ---------------------------------------------------------------------------
# functional conv/linear on quantized operands
# ---------------------------------------------------------------------------

def _conv(x, kernel, strides, padding, groups):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _QuantConvBase(QuantState):
    """Wraps geometry + shared kernel/bias of an nnx.Conv."""

    def _init_from_conv(self, conv: nnx.Conv):
        self.kernel = conv.kernel            # SHARED param (surgery contract)
        self.bias = conv.bias
        kh, kw, _, out_ch = conv.kernel[...].shape
        self.kernel_size = (kh, kw)
        s = conv.strides
        self.strides = (s, s) if isinstance(s, int) else tuple(s)
        self.padding = conv.padding
        self.groups = conv.feature_group_count
        self.out_channels = out_ch

    def _fp_forward(self, x):
        out = _conv(x, self.kernel[...], self.strides, self.padding,
                    self.groups)
        if self.bias is not None:
            out = out + self.bias[...]
        return out


class _QuantLinearBase(QuantState):
    def _init_from_linear(self, linear: nnx.Linear):
        self.kernel = linear.kernel          # (in, out), SHARED
        self.bias = linear.bias

    def _fp_forward(self, x):
        out = x @ self.kernel[...]
        if self.bias is not None:
            out = out + self.bias[...]
        return out


# ---------------------------------------------------------------------------
# qn: absmax quant + noise (layers_qn.py)
# ---------------------------------------------------------------------------

class ConvQn(_QuantConvBase):
    def __init__(self, conv: nnx.Conv, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, **kw):
        self._init_from_conv(conv)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        if self.input_quant:
            x, _ = data_quant_pass(x, self.input_bit)
        w = self.kernel[...]
        if self.weight_quant:
            w, _ = data_quant_pass(w, self.weight_bit)
        if self.noise_on:
            w = add_noise(w, self._noise_key(x), self.noise_scale_v[...])
        out = _conv(x, w, self.strides, self.padding, self.groups)
        if self.bias is not None:
            out = out + self.bias[...]
        if self.output_quant:
            out, _ = data_quant_pass(out, self.output_bit)
        return out


class LinearQn(_QuantLinearBase):
    def __init__(self, linear: nnx.Linear, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, **kw):
        self._init_from_linear(linear)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        if self.input_quant:
            x, _ = data_quant_pass(x, self.input_bit)
        w = self.kernel[...]
        if self.weight_quant:
            w, _ = data_quant_pass(w, self.weight_bit)
        if self.noise_on:
            w = add_noise(w, self._noise_key(x), self.noise_scale_v[...])
        out = x @ w
        if self.bias is not None:
            out = out + self.bias[...]
        if self.output_quant:
            out, _ = data_quant_pass(out, self.output_bit)
        return out


# ---------------------------------------------------------------------------
# qn_lsq: the main QAT family (layers_qn_lsq.py)
# ---------------------------------------------------------------------------

class ConvQnLsq(_QuantConvBase):
    def __init__(self, conv: nnx.Conv, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, **kw):
        self._init_from_conv(conv)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        nk = self._noise_key(x) if self.noise_on else None
        x, _ = self._input_q(x, isint=False)
        w, _ = self._weight_q(self.kernel[...], isint=False, noise_key=nk)
        out = _conv(x, w, self.strides, self.padding, self.groups)
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


class LinearQnLsq(_QuantLinearBase):
    def __init__(self, linear: nnx.Linear, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, **kw):
        self._init_from_linear(linear)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        nk = self._noise_key(x) if self.noise_on else None
        x, _ = self._input_q(x, isint=False)
        w, _ = self._weight_q(self.kernel[...], isint=False, noise_key=nk)
        out = x @ w
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


class ConvQLsq(ConvQnLsq):
    """LSQ without noise (layers_q_lsq.py) — noise_scale pinned to 0."""

    def __init__(self, conv, **kw):
        kw["noise_scale"] = 0.0
        super().__init__(conv, **kw)


class LinearQLsq(LinearQnLsq):
    def __init__(self, linear, **kw):
        kw["noise_scale"] = 0.0
        super().__init__(linear, **kw)


# ---------------------------------------------------------------------------
# DAC bit-split (layers_qn_lsq_bit_split.py) — int LSQ, slice matmuls, concat
# ---------------------------------------------------------------------------

def _bit_split_axis(x_q: jax.Array, x_bit: int, slice_bit: int) -> jax.Array:
    """bit_split with slices on a NEW leading axis (bit_len, ...) — the
    vectorized layout (reference stacks on dim 0, layers_utils_adda.py:184)."""
    from stablediffusion_pytorch_tpu.ops.bit_ops import bit_split

    bit_len = bit_len_for(x_bit, slice_bit)
    stacked = bit_split(x_q, x_bit, slice_bit)
    return stacked.reshape((bit_len, x_q.shape[0]) + x_q.shape[1:])


def _bit_concat_axis(y: jax.Array, slice_bit: int) -> jax.Array:
    """weighted sum over the leading slice axis."""
    bit_len = y.shape[0]
    powv = (2.0 ** (slice_bit * jnp.arange(bit_len, dtype=y.dtype)))
    return jnp.tensordot(powv, y, axes=(0, 0))


class ConvLsqBitSplit(_QuantConvBase):
    """Int-LSQ input -> DAC slices -> per-slice conv -> weighted recombine.
    Numerically equals ConvQnLsq when ADC is ideal (the reference's
    equivalence test: test_script/layers_LSQ_bit_split_test_speed_and_output
    .py:12-70)."""

    def __init__(self, conv: nnx.Conv, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, **kw):
        self._init_from_conv(conv)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self.dac_bit = dac_bit

    @property
    def slice_bit(self):
        return self.dac_bit - 1

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
        w, w_scale = self._weight_q(self.kernel[...], isint=True,
                                    noise_key=nk)
        bit_len, b = slices.shape[0], x.shape[0]
        merged = slices.reshape((bit_len * b,) + slices.shape[2:])
        out = _conv(merged, w, self.strides, self.padding, self.groups)
        out = out.reshape((bit_len, b) + out.shape[1:])
        out = _bit_concat_axis(out, self.slice_bit)
        out = out / w_scale / in_scale
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


class LinearLsqBitSplit(_QuantLinearBase):
    def __init__(self, linear: nnx.Linear, weight_bit=8, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, **kw):
        self._init_from_linear(linear)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self.dac_bit = dac_bit

    @property
    def slice_bit(self):
        return self.dac_bit - 1

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
        w, w_scale = self._weight_q(self.kernel[...], isint=True,
                                    noise_key=nk)
        out = jnp.einsum("s...i,io->s...o", slices, w)
        out = _bit_concat_axis(out, self.slice_bit)
        out = out / w_scale / in_scale
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


# ---------------------------------------------------------------------------
# fused ADDA MVM: Pallas forward on TPU, jnp(STE) backward
# ---------------------------------------------------------------------------

def _adda_mvm_jnp(x_q, w_q, adc_scale, x_bit, slice_bit, adc_range):
    """Differentiable jnp reference: bit-split -> matmul -> ADC -> concat
    (the numerics oracle for the Pallas kernel)."""
    from stablediffusion_pytorch_tpu.ops.bit_ops import bit_split, bit_len_for

    bit_len = bit_len_for(x_bit, slice_bit)
    m = x_q.shape[0]
    slices = bit_split(x_q, x_bit, slice_bit).reshape(bit_len, m, -1)
    partial = jnp.einsum("smk,kn->smn", slices, w_q)
    adc = round_pass(jnp.clip(partial * adc_scale, -adc_range - 1, adc_range))
    powv = (2.0 ** (slice_bit * jnp.arange(bit_len,
                                           dtype=adc.dtype)))[:, None, None]
    return jnp.sum(adc * powv, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def adda_mvm(x_q, w_q, adc_scale, x_bit, slice_bit, adc_range, w_bit=0):
    """Fused ADDA matmul (M, K) x (K, N): Pallas kernel on TPU, jnp
    elsewhere; backward always differentiates the jnp/STE formulation.

    ``w_bit`` (static hint) enables the int8-operand kernel when both
    operands' integer levels provably fit int8 (x_bit <= 8 and
    0 < w_bit <= 8) — ~4x less HBM traffic and the int8 MXU rate, still
    bit-exact (VERDICT #9). w_bit=0 means unknown -> f32 kernel."""
    if jax.default_backend() == "tpu":
        from stablediffusion_pytorch_tpu.ops.bit_ops import bit_len_for
        from stablediffusion_pytorch_tpu.ops.pallas.cim_mvm import (
            fused_adda_mvm, fused_adda_mvm_int8,
        )

        kern = (fused_adda_mvm_int8 if x_bit <= 8 and 0 < w_bit <= 8
                else fused_adda_mvm)
        return kern(
            x_q, w_q, adc_scale, x_bit=x_bit,
            bit_len=bit_len_for(x_bit, slice_bit), slice_bit=slice_bit,
            adc_range=float(adc_range))
    return _adda_mvm_jnp(x_q, w_q, adc_scale, x_bit, slice_bit, adc_range)


def _adda_mvm_fwd(x_q, w_q, adc_scale, x_bit, slice_bit, adc_range, w_bit=0):
    return (adda_mvm(x_q, w_q, adc_scale, x_bit, slice_bit, adc_range,
                     w_bit),
            (x_q, w_q, adc_scale))


def _adda_mvm_bwd(x_bit, slice_bit, adc_range, w_bit, res, g):
    x_q, w_q, adc_scale = res
    _, vjp = jax.vjp(
        lambda x, w, s: _adda_mvm_jnp(x, w, s, x_bit, slice_bit, adc_range),
        x_q, w_q, adc_scale)
    return vjp(g)


adda_mvm.defvjp(_adda_mvm_fwd, _adda_mvm_bwd)


# ---------------------------------------------------------------------------
# ADDA: ADC/DAC model without array tiling (layers_qn_lsq_adda.py)
# ---------------------------------------------------------------------------

class _AddaState(QuantState):
    def _init_adda(self, dac_bit, adc_bit, adc_k):
        self.dac_bit = int(dac_bit)
        self.adc_bit = int(adc_bit)
        self.adc_k = float(adc_k)  # adc_gain_1_scale
        self.adc_gain = nnx.Param(jnp.asarray(1.0))
        self.adc_adjust_mode = "gain"
        self.adc_gain_min = 1.0
        self.adc_gain_max = float(2 ** 6)

    @property
    def slice_bit(self):
        return self.dac_bit - 1

    @property
    def adc_range(self):
        return 2 ** (self.adc_bit - 1) - 1

    def _adc_scale(self):
        """clamp_pass + round_pass on the learned gain
        (reference: layers_utils_adda.py:40-49)."""
        g = clamp_pass(self.adc_gain[...], self.adc_gain_min,
                       self.adc_gain_max)
        if self.adc_adjust_mode == "gain":
            g = round_pass(g)
        else:  # 'current': quantize the reciprocal range
            g = 1.0 / round_pass(1.0 / g)
        return g * self.adc_k

    def _adc(self, out, adc_scale):
        """ADC transfer: scale -> clamp [-range-1, range] -> STE round
        (reference: layers_qn_lsq_adda.py:265-267)."""
        out = adc_scale * out
        out = jnp.clip(out, -self.adc_range - 1, self.adc_range)
        return round_pass(out)

    def update_adc_gain_for_bits(self, adc_bit_old, dac_bit_old,
                                 weight_bit_old):
        """Gain rescale on bit change, clamped to [0.8*gain_min,
        1.2*gain_max] (reference: layers_utils_adda.py:53-74). Round-3 fix:
        this used to floor at 1.0, which for TC05-style sub-unity gain
        ranges (gain fixed at 1/64) would snap the gain 64x too high on any
        adc/dac/weight bit change and saturate the ADC."""
        g = float(self.adc_gain[...])
        changed = False
        if adc_bit_old != self.adc_bit:
            g = g * 2 ** (self.adc_bit - adc_bit_old)
            changed = True
        if dac_bit_old != self.dac_bit:
            g = g / 2 ** (self.dac_bit - dac_bit_old)
            changed = True
        if weight_bit_old != self.weight_bit:
            g = g / 2 ** (self.weight_bit - weight_bit_old)
            changed = True
        if changed:
            g = min(max(g, 0.8 * self.adc_gain_min), 1.2 * self.adc_gain_max)
        self.adc_gain.value = jnp.asarray(g)

    def update_para(self, adc_bit=None, dac_bit=None, **kw):
        adc_old, dac_old, w_old = self.adc_bit, self.dac_bit, self.weight_bit
        super().update_para(**kw)
        if adc_bit is not None:
            self.adc_bit = int(adc_bit)
        if dac_bit is not None:
            self.dac_bit = int(dac_bit)
        self.update_adc_gain_for_bits(adc_old, dac_old, w_old)

    def _maybe_init_adc_gain(self, out_pre_adc):
        """Data-driven gain init during calibration, jit-safe
        (reference: layers_utils_adda.py:12-20)."""
        if self.calibrating:
            absmax = jnp.max(jnp.abs(jax.lax.stop_gradient(out_pre_adc)))
            safe = jnp.where(absmax > 0, absmax, 1.0)
            ideal = jnp.clip((self.adc_range / safe) / self.adc_k,
                             0.8 * self.adc_gain_min,
                             1.2 * self.adc_gain_max)
            self.adc_gain.value = jnp.where(
                (self.adc_gain[...] == self.adc_gain_min) & (absmax > 0),
                ideal, self.adc_gain[...])


class ConvLsqAdda(_QuantConvBase, _AddaState):
    def __init__(self, conv: nnx.Conv, weight_bit=4, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, adc_bit=8,
                 adc_k=1.0, **kw):
        self._init_from_conv(conv)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self._init_adda(dac_bit, adc_bit, adc_k)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        adc_scale = self._adc_scale()
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
        w, w_scale = self._weight_q(self.kernel[...], isint=True,
                                    noise_key=nk)
        bit_len, b = slices.shape[0], x.shape[0]
        merged = slices.reshape((bit_len * b,) + slices.shape[2:])
        out = _conv(merged, w, self.strides, self.padding, self.groups)
        out = out.reshape((bit_len, b) + out.shape[1:])
        self._maybe_init_adc_gain(out)
        out = self._adc(out, adc_scale)
        out = _bit_concat_axis(out, self.slice_bit)
        out = out / w_scale / in_scale / adc_scale
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


class LinearLsqAdda(_QuantLinearBase, _AddaState):
    def __init__(self, linear: nnx.Linear, weight_bit=4, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, adc_bit=8,
                 adc_k=1.0, **kw):
        self._init_from_linear(linear)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self._init_adda(dac_bit, adc_bit, adc_k)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        adc_scale = self._adc_scale()
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        w, w_scale = self._weight_q(self.kernel[...], isint=True,
                                    noise_key=nk)
        if self.calibrating:
            # calibration needs pre-ADC activations for the gain init
            slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
            out = jnp.einsum("s...i,io->s...o", slices, w)
            self._maybe_init_adc_gain(out)
            out = self._adc(out, adc_scale)
            out = _bit_concat_axis(out, self.slice_bit)
        else:
            # fused Pallas path (TPU) / jnp path (CPU), STE backward
            lead = x_q.shape[:-1]
            flat = x_q.reshape(-1, x_q.shape[-1])
            # int8 kernel only when w is provably integer int8 levels:
            # quantizer on AND no additive (float) weight noise
            w_bit_hint = (self.weight_bit
                          if self.weight_quant and not self.noise_on
                          else 0)
            out = adda_mvm(flat, w, adc_scale, self.input_bit,
                           self.slice_bit, self.adc_range, w_bit_hint)
            out = out.reshape(lead + (w.shape[1],))
        out = out / w_scale / in_scale / adc_scale
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


# ---------------------------------------------------------------------------
# ADDA-CIM: full array simulation (layers_qn_lsq_adda_cim_opt.py)
# ---------------------------------------------------------------------------

def get_cols(layer) -> int:
    """Output-column count of a layer's 2-D weight view."""
    k = layer.kernel[...].shape
    return k[-1]


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


class _CimArrayMixin(_AddaState):
    """Array-tiled MVM: weight (R, C) split into (r_a, c_a) blocks; ADC
    clamp/round applies PER BLOCK before row-block accumulation.

    Vectorized equivalent of the reference's per-mapping-block loop
    (layers_qn_lsq_adda_cim_opt.py:195-233): einsum
    ``(s, b, nr, n, ra) x (nr, ra, nc, ca) -> (s, b, n, nr, nc, ca)``
    keeps row-blocks separate for the nonlinear ADC, then sums nr and
    recombines slices.
    """

    def _init_cim(self, array_size: Tuple[int, int]):
        self.array_size = tuple(int(v) for v in array_size)
        self._adc_noise_cache = {}
        self.weight_mapping_info = None  # filled by the weight mapper

    def _adc_noise(self, nc: int, ca: int):
        """Per-column ADC gain/offset noise, seeded per layer and sized to
        the actual column-block grid (reference: layers_utils_adda.py:100-116).
        Generated on demand so layers of any width work — no fixed-size
        buffer cap. Deterministic per (layer seed, grid shape)."""
        cached = self._adc_noise_cache.get((nc, ca))
        if cached is None:
            k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
            cached = (np.asarray(jax.random.normal(k1, (nc, ca))),
                      np.asarray(jax.random.normal(k2, (nc, ca))))
            self._adc_noise_cache[(nc, ca)] = cached
        return cached

    def enable_multi_gains(self) -> int:
        """Per-column-block learned ADC gains instead of one scalar
        (reference: layers_qn_lsq_adda_cim_multi_gains.py:25-489,
        adc_gain_dict + update_adc_gain_multi layers_utils_adda.py:76-97).
        Returns the number of column blocks."""
        _, ca = self.array_size
        cols = get_cols(self)
        nc = -(-cols // ca)
        g = float(jnp.ravel(self.adc_gain[...])[0])
        self.adc_gain.value = jnp.full((nc,), g)
        return nc

    def _descale_adc(self, out: jax.Array, adc_scale) -> jax.Array:
        """Undo the ADC scale on the recombined output; with multi-gains the
        per-block gains expand to per-column factors on the last axis."""
        if jnp.ndim(adc_scale) == 1:
            _, ca = self.array_size
            percol = jnp.repeat(adc_scale, ca)[:out.shape[-1]]
            return out / percol
        return out / adc_scale

    def _cim_matmul(self, x2d: jax.Array, w2d: jax.Array,
                    adc_scale) -> jax.Array:
        """x2d (s, b, n, R), w2d (R, C) -> (s, b, n, C) with per-block ADC.
        ``adc_scale`` is scalar, or (nc,) with multi-gains enabled."""
        ra, ca = self.array_size
        R, C = w2d.shape
        xp = _pad_to(x2d, 3, ra)
        wp = _pad_to(_pad_to(w2d, 0, ra), 1, ca)
        nr, nc = wp.shape[0] // ra, wp.shape[1] // ca
        xp = xp.reshape(xp.shape[:3] + (nr, ra))
        wp = wp.reshape(nr, ra, nc, ca)
        out = jnp.einsum("sbnri,rico->sbnrco", xp, wp)  # (s,b,n,nr,nc,ca)
        self._maybe_init_adc_gain(out)
        if jnp.ndim(adc_scale) == 1:  # per-column-block gains
            adc_scale = adc_scale.reshape(1, 1, 1, 1, nc, 1)
        out = adc_scale * out
        if self.gain_offset_noise_on:
            gn_base, on_base = self._adc_noise(nc, ca)
            gn = jnp.asarray(gn_base) * self.gain_noise_scale_v[...]
            on = jnp.asarray(on_base) * self.offset_noise_scale_v[...]
            noised = out * (1.0 + gn) + self.adc_range * on
            out = out + jax.lax.stop_gradient(noised - out)
        out = jnp.clip(out, -self.adc_range - 1, self.adc_range)
        out = round_pass(out)
        out = out.sum(axis=3)  # accumulate row blocks
        return out.reshape(out.shape[:3] + (nc * ca,))[..., :C]


class ConvLsqAddaCim(_QuantConvBase, _CimArrayMixin):
    def __init__(self, conv: nnx.Conv, weight_bit=4, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, adc_bit=8,
                 adc_k=1.0, array_size=(576, 2048), **kw):
        self._init_from_conv(conv)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self._init_adda(dac_bit, adc_bit, adc_k)
        self._init_cim(array_size)

    def _im2col(self, x):
        """NHWC patches -> (b, n_patches, K) with K = in_ch*kh*kw.

        ``jax.lax.conv_general_dilated_patches`` emits the feature axis
        CHANNEL-major (in_ch, kh, kw) — the same row layout as the
        reference's ``nn.Unfold`` on NCHW — so the weight 2-D view below
        must be built from an IHWO transpose. (Round-3 fix: the original
        (kh, kw, in)-major weight reshape scrambled every CIM conv and was
        the root cause of the broken ADDA-stage QAT evidence — conversion
        loss 1.0 at 8-bit ideal settings, runs_evidence_qat_r3/qat_ladder.)"""
        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, str):
            patches = jax.lax.conv_general_dilated_patches(
                x, (kh, kw), self.strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            patches = jax.lax.conv_general_dilated_patches(
                x, (kh, kw), self.strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, oh, ow, k = patches.shape
        return patches.reshape(b, oh * ow, k), (oh, ow)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        adc_scale = self._adc_scale()
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
        w, w_scale = self._weight_q(self.kernel[...], isint=True,
                                    noise_key=nk)

        bit_len, b = slices.shape[0], x.shape[0]
        merged = slices.reshape((bit_len * b,) + slices.shape[2:])
        x2d, (oh, ow) = self._im2col(merged)
        x2d = x2d.reshape(bit_len, b, x2d.shape[1], x2d.shape[2])

        # (kh, kw, in, out) -> (in*kh*kw, out): rows CHANNEL-major to match
        # the patches layout (see _im2col docstring)
        kh, kw = self.kernel_size
        w2d = jnp.transpose(w, (2, 0, 1, 3)).reshape(
            w.shape[2] * kh * kw, self.out_channels)

        out = self._cim_matmul(x2d, w2d, adc_scale)       # (s, b, n, C)
        out = _bit_concat_axis(out, self.slice_bit)        # (b, n, C)
        out = self._descale_adc(out / w_scale / in_scale, adc_scale)
        out = out.reshape(b, oh, ow, self.out_channels)
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


class LinearLsqAddaCim(_QuantLinearBase, _CimArrayMixin):
    def __init__(self, linear: nnx.Linear, weight_bit=4, input_bit=8,
                 output_bit=8, noise_scale=0.0, dac_bit=5, adc_bit=8,
                 adc_k=1.0, array_size=(576, 2048), **kw):
        self._init_from_linear(linear)
        self._init_quant_state(weight_bit, input_bit, output_bit,
                               noise_scale, **kw)
        self._init_adda(dac_bit, adc_bit, adc_k)
        self._init_cim(array_size)

    def __call__(self, x):
        if self.use_FP:
            return self._fp_forward(x)
        adc_scale = self._adc_scale()
        nk = self._noise_key(x) if self.noise_on else None
        x_q, in_scale = self._input_q(x, isint=True)
        slices = _bit_split_axis(x_q, self.input_bit, self.slice_bit)
        w2d = self.kernel[...]
        w2d, w_scale = self._weight_q(w2d, isint=True, noise_key=nk)

        lead = slices.shape[:-1]
        flat = slices.reshape(slices.shape[0], -1, 1, slices.shape[-1])
        # reuse the block matmul with n=1 token axis
        out = self._cim_matmul(flat, w2d, adc_scale)
        out = out.reshape(lead + (w2d.shape[1],))
        out = _bit_concat_axis(out, self.slice_bit)
        out = self._descale_adc(out / w_scale / in_scale, adc_scale)
        if self.bias is not None:
            out = out + self.bias[...]
        out, _ = self._output_q(out)
        return out


# ---------------------------------------------------------------------------
# calibration driver
# ---------------------------------------------------------------------------

def calibrate_quant_layers(model: nnx.Module, forward_fn, jit: bool = True
                           ) -> int:
    """Run ``forward_fn(model)`` once with every quant layer in calibration
    mode, initializing uninitialized LSQ step sizes (and ADC gains) from
    real data — the explicit-pass replacement for the reference's lazy
    first-batch init (SURVEY.md §7 hard parts).

    The pass runs under nnx.jit by default (one extra compile of the
    calibration graph; the step-size writes are traced ``where`` updates) —
    eager execution is pathologically slow on remote-dispatch TPU backends.
    Returns the number of calibrated layers."""
    layers = [m for _, m in _iter_modules(model) if isinstance(m, QuantState)]
    for lyr in layers:
        lyr.calibrating = True
    try:
        if jit:
            nnx.jit(lambda m: forward_fn(m))(model)
        else:
            forward_fn(model)
    finally:
        for lyr in layers:
            lyr.calibrating = False
    return len(layers)


def _iter_modules(model):
    for path, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Module):
            yield path, node
