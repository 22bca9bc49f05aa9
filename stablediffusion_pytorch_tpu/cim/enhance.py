"""Digital enhancement adapters: identity-init grouped 1x1 layers and
LoRA-style parallel branches with learned blend, plus the ops-budget solver.

Re-implements reference cim_qn_train/layers_enhance.py:

  * ops-budget analysis — pick groups / hidden width so the adapter costs
    ``ops_factor`` of the original layer, balancing the three compression
    axes at ops_factor^(1/3) (reference: :27-262)
  * GroupedLinear — block-diagonal linear, group-wise identity init
    (reference: :324+; the stacked-weight fast path the reference migrates
    checkpoints to with weight_convert.py:21-54 is the native layout here)
  * EnhanceLayerConv/Linear — serial grouped 1x1 after the quant layer,
    identity-init so insertion is a no-op (reference: :368-436)
  * EnhanceBranchConvLoR/LinearLoR — two-layer grouped LoRA branch blended
    by sigmoid(blend_factor), init -6.9068 => sigma ~ 1e-3
    (reference: :439-533)
  * freeze / blend utilities + teacher-student distillation of the adapters
    (reference: :955-1082, train_enhance_layer_w_teacher :1144-1236)

Adapters are flagged ``layer_flag='enhance_layer'/'enhance_branch'`` so the
CIM converter skips them (digital_compute_layers, register_dict.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.cim.layers import (
    _QuantConvBase, _QuantLinearBase, _conv,
)


# ---------------------------------------------------------------------------
# ops-budget solver (reference: layers_enhance.py:27-262)
# ---------------------------------------------------------------------------

def _divisors(x: int):
    divs = set()
    for d in range(1, int(x**0.5) + 1):
        if x % d == 0:
            divs.add(d)
            divs.add(x // d)
    return sorted(divs)


def _closest_divisor(val, candidates):
    return min(candidates, key=lambda d: abs(d - val))


def ideal_hidden_channels(c_in, c_out, kh, kw, ops_factor):
    r = ops_factor ** (1 / 3)
    return max(1, round(r * c_in * c_out * (kh * kw) / (c_in + c_out)))


def analyze_enhance_conv_ops(in_channels, out_channels, kh, kw, ops_factor):
    """Smallest group count whose 1x1 grouped conv costs <= ops_factor of
    the original conv (reference: :71-96)."""
    original_ops = in_channels * out_channels * kh * kw
    for g in range(1, out_channels + 1):
        if out_channels % g != 0:
            continue
        ratio = (out_channels * out_channels // g) / original_ops
        if ratio <= ops_factor:
            return {"group": g, "estimated_ops_factor": ratio}
    return {"group": out_channels, "estimated_ops_factor": 1.0 / (kh * kw)}


def analyze_enhance_linear_ops(in_features, out_features, ops_factor):
    """Reference: :99-122."""
    original_ops = in_features * out_features
    for g in range(1, out_features + 1):
        if out_features % g != 0:
            continue
        ratio = (out_features * out_features // g) / original_ops
        if ratio <= ops_factor:
            return {"group": g, "estimated_ops_factor": ratio}
    return {"group": out_features, "estimated_ops_factor": 1.0}


def analyze_lora_conv_ops(in_channels, out_channels, kh, kw, ops_factor):
    """Joint (group1, group2, hidden) search targeting ops_factor with
    balanced per-axis compression (reference: :54-140)."""
    ops_orig = in_channels * out_channels * kh * kw
    base_ratio = ops_factor ** (1 / 3)
    hid_ideal = ideal_hidden_channels(in_channels, out_channels, kh, kw,
                                      ops_factor)
    div_in, div_out = _divisors(in_channels), _divisors(out_channels)
    best, best_l1, best_l2 = None, float("inf"), float("inf")
    for hc in range(max(1, int(hid_ideal * 0.1)),
                    max(1, int(hid_ideal * 10)) + 1):
        div_hid = _divisors(hc)
        g_ideal = 1 / base_ratio
        g1_c = [d for d in div_hid if d in div_in]
        g2_c = [d for d in div_hid if d in div_out]
        if not g1_c or not g2_c:
            continue
        g1 = _closest_divisor(g_ideal, g1_c)
        g2 = _closest_divisor(g_ideal, g2_c)
        factor = (in_channels * hc // g1 + hc * out_channels // g2) / ops_orig
        l1 = abs(factor - ops_factor)
        r_rank = (in_channels * hc + hc * out_channels) / ops_orig
        r_g1 = (in_channels * hid_ideal / g1 + hid_ideal * out_channels) / ops_orig
        r_g2 = (in_channels * hid_ideal + hid_ideal * out_channels / g2) / ops_orig
        l2 = math.sqrt((r_rank - base_ratio) ** 2 + (r_g1 - base_ratio) ** 2
                       + (r_g2 - base_ratio) ** 2)
        if (l1 < best_l1) or (l1 == best_l1 and l2 < best_l2):
            best_l1, best_l2 = l1, l2
            best = dict(group1=g1, group2=g2, hidden_channels=hc,
                        estimated_ops_factor=factor)
    if best is None:
        hc = max(1, int(hid_ideal))
        best = dict(group1=1, group2=1, hidden_channels=hc,
                    estimated_ops_factor=(in_channels * hc + hc * out_channels)
                    / ops_orig)
    return best


def analyze_lora_linear_ops(in_features, out_features, ops_factor):
    return analyze_lora_conv_ops(in_features, out_features, 1, 1, ops_factor)


# ---------------------------------------------------------------------------
# grouped linear (reference: :324+)
# ---------------------------------------------------------------------------

class GroupedLinear(nnx.Module):
    """Block-diagonal linear: weight (groups, in_g, out_g), identity init
    when in_g == out_g."""

    layer_flag = "enhance_layer"

    def __init__(self, in_features, out_features, groups, *, rngs: nnx.Rngs,
                 identity_init: bool = True):
        assert in_features % groups == 0, "in_features must be divisible by groups"
        assert out_features % groups == 0, "out_features must be divisible by groups"
        self.groups = groups
        self.in_group = in_features // groups
        self.out_group = out_features // groups
        if identity_init and self.in_group == self.out_group:
            w = jnp.tile(jnp.eye(self.in_group)[None], (groups, 1, 1))
        else:
            init = nnx.initializers.lecun_normal()
            w = init(rngs.params(), (groups, self.in_group, self.out_group))
        self.weight = nnx.Param(w)
        self.bias = nnx.Param(jnp.zeros((out_features,)))

    def __call__(self, x):
        lead = x.shape[:-1]
        xg = x.reshape(lead + (self.groups, self.in_group))
        out = jnp.einsum("...gi,gio->...go", xg, self.weight[...])
        out = out.reshape(lead + (self.groups * self.out_group,))
        return out + self.bias[...]


# ---------------------------------------------------------------------------
# serial enhance layers (reference: :368-436)
# ---------------------------------------------------------------------------

class EnhanceLayerConv(nnx.Module):
    """original conv -> identity-init grouped 1x1 conv."""

    layer_flag = "enhance_layer"

    def __init__(self, original_conv, ops_factor: float = 0.05, *,
                 rngs: Optional[nnx.Rngs] = None):
        self.original_conv = original_conv
        k = original_conv.kernel[...].shape  # (kh, kw, in_g, out)
        kh, kw, cin_g, cout = k
        groups_src = getattr(original_conv, "groups",
                             getattr(original_conv, "feature_group_count", 1))
        cin = cin_g * groups_src
        cfg = analyze_enhance_conv_ops(cin, cout, kh, kw, ops_factor)
        self.groups = cfg["group"]
        self.estimated_ops_factor = cfg["estimated_ops_factor"]
        # grouped 1x1 conv as block-diagonal kernel, eye init
        # (reference eye-init: :399-405)
        eye = jnp.eye(cout // self.groups)
        self.weight = nnx.Param(
            jnp.tile(eye[None], (self.groups, 1, 1)))  # (g, in_g, out_g)
        self.bias = nnx.Param(jnp.zeros((cout,)))
        self.out_channels = cout

    def __call__(self, x):
        out = self.original_conv(x)
        g = self.groups
        b, h, w, c = out.shape
        og = c // g
        xg = out.reshape(b, h, w, g, og)
        y = jnp.einsum("bhwgi,gio->bhwgo", xg, self.weight[...])
        return y.reshape(b, h, w, c) + self.bias[...]


class EnhanceLayerLinear(nnx.Module):
    layer_flag = "enhance_layer"

    def __init__(self, original_linear, ops_factor: float = 0.05, *,
                 rngs: Optional[nnx.Rngs] = None):
        self.original_linear = original_linear
        cin, cout = original_linear.kernel[...].shape
        cfg = analyze_enhance_linear_ops(cin, cout, ops_factor)
        self.estimated_ops_factor = cfg["estimated_ops_factor"]
        self.fc1 = GroupedLinear(cout, cout, cfg["group"],
                                 rngs=rngs or nnx.Rngs(0))

    def __call__(self, x):
        return self.fc1(self.original_linear(x))


# ---------------------------------------------------------------------------
# parallel LoRA branches with learned blend (reference: :439-533)
# ---------------------------------------------------------------------------

BLEND_INIT = -6.9068  # sigmoid => ~1e-3 (reference: :489)


class EnhanceBranchConvLoR(nnx.Module):
    layer_flag = "enhance_branch"

    def __init__(self, original_conv, ops_factor: float = 0.05,
                 relu: bool = False, sigmoid: bool = True, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.original_conv = original_conv
        self.relu = relu
        self.sigmoid = sigmoid
        k = original_conv.kernel[...].shape
        kh, kw, cin_g, cout = k
        groups_src = getattr(original_conv, "groups",
                             getattr(original_conv, "feature_group_count", 1))
        cin = cin_g * groups_src
        strides = getattr(original_conv, "strides", (1, 1))
        self.strides = ((strides, strides) if isinstance(strides, int)
                        else tuple(strides))

        cfg = analyze_lora_conv_ops(cin, cout, kh, kw, ops_factor)
        self.estimated_ops_factor = cfg["estimated_ops_factor"]
        self.branch1 = nnx.Conv(cin, cfg["hidden_channels"],
                                kernel_size=(1, 1),
                                feature_group_count=cfg["group1"], rngs=rngs)
        self.branch2 = nnx.Conv(cfg["hidden_channels"], cout,
                                kernel_size=(1, 1),
                                feature_group_count=cfg["group2"], rngs=rngs)
        self.blend_factor = nnx.Param(
            jnp.asarray(BLEND_INIT if sigmoid else 0.0))

    def _blend(self, original, enhance):
        a = (jax.nn.sigmoid(self.blend_factor[...]) if self.sigmoid
             else self.blend_factor[...])
        return original * (1 - a) + enhance * a

    def __call__(self, x):
        original = self.original_conv(x)
        e = self.branch1(x)
        if self.relu:
            e = nnx.relu(e)
        e = self.branch2(e)
        if any(s != 1 for s in self.strides):
            e = nnx.avg_pool(e, window_shape=self.strides,
                             strides=self.strides)
        # pad/crop to match (reference: :516-527)
        dy = original.shape[1] - e.shape[1]
        dx = original.shape[2] - e.shape[2]
        if dy < 0 or dx < 0:
            e = e[:, :original.shape[1], :original.shape[2], :]
        elif dy > 0 or dx > 0:
            e = jnp.pad(e, ((0, 0), (dy // 2, dy - dy // 2),
                            (dx // 2, dx - dx // 2), (0, 0)))
        return self._blend(original, e)


class EnhanceBranchLinearLoR(nnx.Module):
    layer_flag = "enhance_branch"

    def __init__(self, original_linear, ops_factor: float = 0.05,
                 relu: bool = False, sigmoid: bool = True, *,
                 rngs: Optional[nnx.Rngs] = None):
        rngs = rngs or nnx.Rngs(0)
        self.original_linear = original_linear
        self.relu = relu
        self.sigmoid = sigmoid
        cin, cout = original_linear.kernel[...].shape
        cfg = analyze_lora_linear_ops(cin, cout, ops_factor)
        self.estimated_ops_factor = cfg["estimated_ops_factor"]
        self.branch1 = GroupedLinear(cin, cfg["hidden_channels"],
                                     cfg["group1"], rngs=rngs,
                                     identity_init=False)
        self.branch2 = GroupedLinear(cfg["hidden_channels"], cout,
                                     cfg["group2"], rngs=rngs,
                                     identity_init=False)
        self.blend_factor = nnx.Param(
            jnp.asarray(BLEND_INIT if sigmoid else 0.0))

    def __call__(self, x):
        original = self.original_linear(x)
        e = self.branch1(x)
        if self.relu:
            e = nnx.relu(e)
        e = self.branch2(e)
        a = (jax.nn.sigmoid(self.blend_factor[...]) if self.sigmoid
             else self.blend_factor[...])
        return original * (1 - a) + e * a


# ---------------------------------------------------------------------------
# utilities (reference: :955-1082, :1144-1236)
# ---------------------------------------------------------------------------

def is_enhance_module(m) -> bool:
    return getattr(m, "layer_flag", None) in ("enhance_layer",
                                              "enhance_branch")


def set_blend_factors(model: nnx.Module, value: float) -> int:
    """Force every branch blend factor (pre-sigmoid) to ``value``."""
    n = 0
    for _, m in _walk_modules(model):
        if isinstance(m, (EnhanceBranchConvLoR, EnhanceBranchLinearLoR)):
            m.blend_factor.value = jnp.asarray(value)
            n += 1
    return n


def enhance_losses_distillation(student_out: jax.Array,
                                teacher_out: jax.Array) -> jax.Array:
    """Teacher-student adapter distillation loss: MSE of the enhanced
    quantized output vs the FP teacher output
    (reference: train_enhance_layer_w_teacher :1144-1236)."""
    return jnp.mean((student_out - jax.lax.stop_gradient(teacher_out)) ** 2)


def _walk_modules(model):
    from stablediffusion_pytorch_tpu.cim.progressive import _walk

    for path, _, _, m in _walk(model):
        yield path, m
