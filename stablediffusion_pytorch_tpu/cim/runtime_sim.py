"""Chip runtime simulator: numpy functional pipeline for on-chip inference.

Re-implements reference cim_runtime_simple/ (615 LoC) and the second-gen
cim_runtime_simple_512k/ variant's simulator path:

  * feature_map_to_input — im2col into array-input columns
    (reference: cim_module.py:37-60)
  * pooling — non-overlapping max pool (cim_module.py:64-72)
  * input_multi_bits_shift_expansion / restore — unsigned DAC shift
    expansion and shift-accumulate restore (cim_utils.py:131-175)
  * mvm_calculate — MVM with weight + ADC-offset noise, ADC
    scale/round/clamp (reference: cim_utils.py:177-241 use_simulator path;
    the real-chip path calls the closed c200_sdk / sdk_512k binaries, which
    are replaced by this simulator — SURVEY.md §2.9)
  * conv2d_sim / linear_sim — the conv2d_144k / linear_144k wrappers
    (cim_module.py:75-189)
  * adc_auto_adjust — integration-time/gain search targeting a saturation
    percentage (reference: cim_adc.py:13+)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# im2col + pooling (reference: cim_module.py:37-72)
# ---------------------------------------------------------------------------

def feature_map_to_input(feature_map: np.ndarray, kernel_size: int,
                         stride: int, padding: int,
                         repeat: Optional[Tuple[int, int]] = None
                         ) -> np.ndarray:
    """(C, H, W) -> (k^2*C, out_h*out_w) sliding-window matrix."""
    while feature_map.ndim < 3:
        feature_map = feature_map[None]
    c, h, w = feature_map.shape
    out_h = (h - kernel_size + 2 * padding) // stride + 1
    out_w = (w - kernel_size + 2 * padding) // stride + 1
    if padding:
        feature_map = np.pad(feature_map,
                             ((0, 0), (padding, padding), (padding, padding)))
    cols = np.zeros((kernel_size * kernel_size * c, out_h * out_w),
                    feature_map.dtype)
    idx = 0
    for i in range(out_h):
        for j in range(out_w):
            win = feature_map[:, i * stride:i * stride + kernel_size,
                              j * stride:j * stride + kernel_size]
            cols[:, idx] = win.reshape(-1)
            idx += 1
    if repeat:
        cols = np.tile(cols, (repeat[0], 1))
    return cols


def pooling(feature_map: np.ndarray, kernel_size: int) -> np.ndarray:
    """Non-overlapping max pool on (C, H, W)."""
    c = feature_map.shape[0]
    ph = feature_map.shape[1] // kernel_size
    pw = feature_map.shape[2] // kernel_size
    x = feature_map[:, :ph * kernel_size, :pw * kernel_size]
    x = x.reshape(c, ph, kernel_size, pw, kernel_size)
    return x.max(axis=(2, 4))


# ---------------------------------------------------------------------------
# DAC shift expansion (reference: cim_utils.py:131-175)
# ---------------------------------------------------------------------------

def input_multi_bits_shift_expansion(input_matrix: np.ndarray,
                                     dac_bits: int = 2
                                     ) -> Tuple[np.ndarray, int]:
    """Split non-negative int inputs (rows, cal) into dac_bits-wide slices
    stacked along the cal axis: returns ((rows, bitlen*cal), bitlen) with
    slice i occupying columns [i*cal, (i+1)*cal)."""
    x = np.clip(np.asarray(input_matrix, np.int64), 0, None)
    max_val = int(x.max()) if x.size else 0
    bitlen = max(1, math.ceil(max(max_val.bit_length(), 1) / dac_bits))
    mask = (1 << dac_bits) - 1
    slices = [(x >> (i * dac_bits)) & mask for i in range(bitlen)]
    return np.concatenate(slices, axis=1).astype(np.float64), bitlen


def restore_shift_expansion_output(output: np.ndarray, bitlen: int,
                                   dac_bits: int,
                                   output_bitwise_batch: np.ndarray
                                   ) -> np.ndarray:
    """Shift-accumulate the per-slice ADC outputs back:
    sum_i out_i * 2^(i*dac_bits)."""
    rows = output_bitwise_batch.shape[0] // bitlen
    out = np.zeros_like(output, dtype=np.float64)
    for i in range(bitlen):
        out += output_bitwise_batch[i * rows:(i + 1) * rows] * (
            2.0 ** (i * dac_bits))
    return out


# ---------------------------------------------------------------------------
# MVM with analog noise + ADC (reference: cim_utils.py:177-241)
# ---------------------------------------------------------------------------

def mvm_calculate(input_matrix: np.ndarray, weight: np.ndarray,
                  it_time: int = 5, dac_bits: int = 2, adc_bits: int = 4,
                  adc_scale: float = 1 / 63, noise_scale: float = 0.05,
                  rng: Optional[np.random.Generator] = None
                  ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Simulator MVM: input (rows, cal_times) int levels, weight
    (rows, cols). Returns (output (cal_times, cols), raw ADC outputs,
    ADC_scale)."""
    rng = rng or np.random.default_rng(0)
    x = np.asarray(input_matrix, np.float64)
    x[x > 127] = 127
    cal_times = x.shape[1]
    cols = weight.shape[1]

    expanded, bitlen = input_multi_bits_shift_expansion(x, dac_bits)
    full_scale = adc_scale * it_time

    offset_noise = rng.standard_normal(cols) * 15 * noise_scale * it_time / 63
    w_range = weight.max() - weight.min()
    weight_n = weight + w_range * noise_scale * rng.standard_normal(
        weight.shape)

    adc_out = expanded.T @ weight_n + offset_noise  # (bitlen*cal, cols)
    adc_out = adc_out * full_scale
    adc_out = np.round(adc_out)
    adc_range = 2 ** (adc_bits - 1) - 1
    np.clip(adc_out, -adc_range, adc_range, out=adc_out)

    output = restore_shift_expansion_output(
        np.zeros((cal_times, cols)), bitlen, dac_bits, adc_out)
    return output, adc_out, full_scale


def conv2d_sim(input_feature_map: np.ndarray, weight_2d: np.ndarray,
               stride: int, kernel_size: int, padding: int,
               input_half_level: int = 127, output_half_level: int = 127,
               it_time: int = 10, relu: bool = True,
               input_quant: bool = False, dac_bits: int = 2,
               adc_bits: int = 4, noise_scale: float = 0.05,
               rng=None) -> np.ndarray:
    """conv2d_144k simulator path (reference: cim_module.py:75-160):
    im2col -> quantize -> MVM -> output absmax quantize -> optional relu.
    Returns (C_out, out_h, out_w)."""
    c, h, w = input_feature_map.shape
    out_h = (h - kernel_size + 2 * padding) // stride + 1
    out_w = (w - kernel_size + 2 * padding) // stride + 1
    cols = feature_map_to_input(input_feature_map, kernel_size, stride,
                                padding)
    if input_quant:
        absmax = np.abs(cols).max() or 1.0
        cols = np.round(cols / absmax * input_half_level)
    out, _, full_scale = mvm_calculate(cols, weight_2d, it_time=it_time,
                                       dac_bits=dac_bits, adc_bits=adc_bits,
                                       noise_scale=noise_scale, rng=rng)
    absmax = np.abs(out).max() or 1.0
    out = np.round(out / absmax * output_half_level)
    if relu:
        out = np.maximum(out, 0)
    return out.T.reshape(weight_2d.shape[1], out_h, out_w)


def linear_sim(x: np.ndarray, weight_2d: np.ndarray,
               output_half_level: int = 127, it_time: int = 10,
               relu: bool = False, dac_bits: int = 2, adc_bits: int = 4,
               noise_scale: float = 0.05, rng=None) -> np.ndarray:
    """linear_144k simulator path (reference: cim_module.py:163-189)."""
    out, _, _ = mvm_calculate(x.reshape(-1, 1), weight_2d, it_time=it_time,
                              dac_bits=dac_bits, adc_bits=adc_bits,
                              noise_scale=noise_scale, rng=rng)
    out = out[0]
    absmax = np.abs(out).max() or 1.0
    out = np.round(out / absmax * output_half_level)
    return np.maximum(out, 0) if relu else out


# ---------------------------------------------------------------------------
# ADC auto adjust (reference: cim_adc.py:13+)
# ---------------------------------------------------------------------------

def adc_auto_adjust(input_matrix: np.ndarray, weight: np.ndarray,
                    target_percent: Tuple[float, float] = (0.01, 0.1),
                    dac_bits: int = 2, adc_bits: int = 4,
                    threshold: Optional[float] = None,
                    max_iters: int = 30, rng=None) -> Tuple[float, float]:
    """Search the ADC gain (integration time analogue) so the fraction of
    near-saturating ADC outputs lands inside ``target_percent``. Returns
    (adc_gain, achieved_fraction)."""
    rng = rng or np.random.default_rng(0)
    low_lim, high_lim = target_percent
    adc_range = 2 ** (adc_bits - 1) - 1
    threshold = threshold if threshold is not None else adc_range - 1
    adc_gain = 1.0
    step = 8.0
    frac = 1.0
    for _ in range(max_iters):
        _, adc_raw, _ = mvm_calculate(input_matrix, weight, it_time=1,
                                      dac_bits=dac_bits, adc_bits=adc_bits,
                                      adc_scale=adc_gain, noise_scale=0.0,
                                      rng=rng)
        frac = float((np.abs(adc_raw) >= threshold).mean())
        if low_lim <= frac <= high_lim:
            break
        if frac < low_lim:
            adc_gain *= 1 + step / 8
        else:
            adc_gain /= 1 + step / 8
        step = max(step * 0.8, 0.5)
    return adc_gain, frac
