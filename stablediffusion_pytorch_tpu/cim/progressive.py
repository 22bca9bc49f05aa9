"""ProgressiveTrain: model surgery + progressive QAT harness.

Re-implements reference cim_qn_train/progressive_qn_train.py (1,621 LoC,
class ProgressiveTrain at :27) on flax.nnx graph surgery:

  * model introspection: module names, layer tables, param counts
    (reference: :73-170)
  * analytic op counting per conv/linear + hook-style shape capture
    (reference: cal_ops :172-238, gen_ops_dict :391-447)
  * ACIM vs DMAC energy / TOPS-W model (reference: get_energy_dict :240-389)
  * module surgery: convert_to_layers / revert_to_nn_layer — swap
    nnx.Conv/nnx.Linear for quantized twins SHARING the weight params
    (reference: :553-652, 810-871)
  * progressive_train: linear interpolation of every ``*_range`` kwarg over
    cycles; each cycle pushes new bits/noise into the layers (one recompile)
    then calls ``self.train_model(...)`` (reference: :1306-1362)
  * checkpoint I/O via Orbax (reference handles DDP 'module.' prefixes,
    :1377-1435 — not needed on a pytree)

NNX was chosen over linen precisely because this surgery needs mutable
module graphs (SURVEY.md §7 design pillars).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Type

import jax
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim import registry as reg
from stablediffusion_pytorch_tpu.cim.layers import (
    QuantState, _QuantConvBase, _QuantLinearBase,
)
from stablediffusion_pytorch_tpu.training.checkpoint import (
    load_model as _ckpt_load, save_model as _ckpt_save,
)

log = logging.getLogger("sdtpu")


# ---------------------------------------------------------------------------
# energy-model constants (reference: progressive_qn_train.py:240-246)
# ---------------------------------------------------------------------------

ACIM_ARRAY = (256, 256)
ACIM_TOPS_PER_J = 50.0
DMAC_ARRAY = (64, 1)
DMAC_TOPS_PER_J = 5.0


def _walk(module: nnx.Module, prefix: str = ""):
    """Yield (dotted_path, parent, key, child) for every sub-module edge,
    descending into nnx.List/nnx.Dict containers."""
    if isinstance(module, nnx.List):
        items = list(enumerate(module))
    elif isinstance(module, nnx.Dict):
        items = list(module.items())
    else:
        items = [(k, v) for k, v in vars(module).items()
                 if not str(k).startswith("_")]
    for key, child in items:
        if isinstance(child, nnx.Module):
            path = f"{prefix}{key}"
            yield path, module, key, child
            yield from _walk(child, path + ".")
        elif isinstance(child, (list, tuple)) and not isinstance(child, str):
            for i, item in enumerate(child):
                if isinstance(item, nnx.Module):
                    path = f"{prefix}{key}.{i}"
                    yield path, child, i, item
                    yield from _walk(item, path + ".")


def _is_adapter_internal(path: str) -> bool:
    """True for modules living INSIDE an enhance adapter other than the
    wrapped original layer (branch1/branch2/fc1 stay digital/unwrapped)."""
    parts = path.split(".")
    return any(p in ("branch1", "branch2", "fc1") for p in parts)


def _set_child(parent, key, value):
    if isinstance(parent, (nnx.List, nnx.Dict)):
        parent[key] = value
    elif isinstance(parent, nnx.Module):
        setattr(parent, key, value)
    else:  # plain list-like container
        parent[key] = value


class ProgressiveTrain:
    """Wraps an nnx model; ``train_model`` is either a constructor argument
    or overridden by a subclass (the reference's LDM_AnDi pattern,
    Model_DiT_12L_train.py:113-454)."""

    def __init__(self, model: nnx.Module,
                 train_model: Optional[Callable[..., Any]] = None):
        self.model = model
        if train_model is not None:
            self.train_model = train_model

    # ------------------------------------------------------------------
    # introspection (reference: :73-170)
    # ------------------------------------------------------------------
    def layer_items(self, types: Tuple[Type, ...] = None
                    ) -> List[Tuple[str, Any, Any, nnx.Module]]:
        types = types or (reg.nn_layers + reg.custom_layers)
        return [(p, parent, key, m) for p, parent, key, m in
                _walk(self.model)
                if isinstance(m, types) and not any(
                    isinstance(a, types) and a is not m
                    for a in ())]

    def layer_names(self, types=None) -> List[str]:
        return [p for p, *_ in self.layer_items(types)]

    def customized_layers(self) -> List[Tuple[str, QuantState]]:
        return [(p, m) for p, _, _, m in _walk(self.model)
                if isinstance(m, QuantState)]

    def count_params(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(nnx.state(self.model, nnx.Param)))

    def model_info(self) -> str:
        lines = [f"total params: {self.count_params():,}"]
        for p, _, _, m in _walk(self.model):
            if isinstance(m, reg.nn_layers + reg.custom_layers):
                lines.append(f"  {p}: {type(m).__name__}")
        return "\n".join(lines)

    # ------------------------------------------------------------------
    # op counting (reference: cal_ops :172-238, gen_ops_dict :391-447)
    # ------------------------------------------------------------------
    @staticmethod
    def cal_ops(layer, input_shape) -> Dict[str, float]:
        """Analytic mul/add/bias counts for one conv/linear given its input
        shape (NHWC / (..., features))."""
        if isinstance(layer, (nnx.Conv, _QuantConvBase)):
            if isinstance(layer, nnx.Conv):
                kh, kw, cin_g, cout = layer.kernel[...].shape
                strides = layer.strides
                strides = ((strides, strides) if isinstance(strides, int)
                           else tuple(strides))
                has_bias = layer.bias is not None
            else:
                kh, kw = layer.kernel_size
                cin_g, cout = layer.kernel[...].shape[2:]
                strides = layer.strides
                has_bias = layer.bias is not None
            h, w = input_shape[1], input_shape[2]
            oh, ow = h // strides[0], w // strides[1]
            muls = kh * kw * cin_g * cout * oh * ow
            adds = (kh * kw * cin_g - 1) * cout * oh * ow
            bias = cout * oh * ow if has_bias else 0
        else:  # linear
            cin, cout = layer.kernel[...].shape
            tokens = int(np.prod(input_shape[1:-1])) if len(input_shape) > 2 else 1
            muls = cin * cout * tokens
            adds = (cin - 1) * cout * tokens
            bias = cout * tokens if layer.bias is not None else 0
        return {"muls": float(muls), "adds": float(adds), "bias": float(bias),
                "ops": float(muls + adds + bias)}

    def gen_ops_dict(self, example_input, *args, **kwargs) -> Dict[str, dict]:
        """Capture per-layer input shapes by one eager forward (the
        hook-based deepcopy capture of the reference, :391-447), then apply
        cal_ops."""
        shapes: Dict[str, tuple] = {}
        originals = []
        for path, parent, key, m in list(_walk(self.model)):
            if isinstance(m, reg.nn_layers + reg.custom_layers):
                rec = _Recorder(m, path, shapes)
                _set_child(parent, key, rec)
                originals.append((parent, key, m))
        try:
            self.model(example_input, *args, **kwargs)
        finally:
            for parent, key, m in originals:
                _set_child(parent, key, m)
        ops = {}
        for path, _, _, m in _walk(self.model):
            if path in shapes:
                ops[path] = dict(self.cal_ops(m, shapes[path]),
                                 input_shape=shapes[path],
                                 layer=type(m).__name__)
        return ops

    # ------------------------------------------------------------------
    # energy model (reference: get_energy_dict :240-389)
    # ------------------------------------------------------------------
    def get_energy_dict(self, ops_dict: Dict[str, dict],
                        acim_array=ACIM_ARRAY,
                        acim_tops_per_j=ACIM_TOPS_PER_J,
                        dmac_array=DMAC_ARRAY,
                        dmac_tops_per_j=DMAC_TOPS_PER_J) -> Dict[str, dict]:
        """Per-layer energy for analog CIM vs digital MAC execution. ACIM
        efficiency degrades with array under-utilization (partial rows/cols),
        as in the reference's utilization model."""
        out = {}
        for path, info in ops_dict.items():
            layer = dict(self._layer_by_path()).get(path)
            ops = info["ops"]
            if layer is None:
                continue
            if isinstance(layer, (nnx.Conv, _QuantConvBase)):
                k = layer.kernel[...].shape
                rows, cols = k[0] * k[1] * k[2], k[3]
            else:
                rows, cols = layer.kernel[...].shape
            ra, ca = acim_array
            util = min(rows, ra) * min(cols, ca) / (ra * ca)
            util = max(util, 1e-3)
            acim_eff = acim_tops_per_j * util
            out[path] = {
                "ops": ops,
                "acim_energy_j": ops / (acim_eff * 1e12),
                "dmac_energy_j": ops / (dmac_tops_per_j * 1e12),
                "acim_utilization": util,
            }
        return out

    def est_cal_time(self, ops_dict, tops: float = 1.0) -> float:
        """Latency estimate at a given TOPS (reference: :404-423)."""
        return sum(i["ops"] for i in ops_dict.values()) / (tops * 1e12)

    def _layer_by_path(self):
        return [(p, m) for p, _, _, m in _walk(self.model)
                if isinstance(m, reg.nn_layers + reg.custom_layers)]

    # ------------------------------------------------------------------
    # surgery (reference: :553-652, 810-871)
    # ------------------------------------------------------------------
    def find_and_replace_module(self, dotted_path: str,
                                new_module: nnx.Module) -> None:
        """setattr by dotted path (reference: :553-562)."""
        for path, parent, key, _ in _walk(self.model):
            if path == dotted_path:
                _set_child(parent, key, new_module)
                return
        raise KeyError(f"module {dotted_path!r} not found")

    def convert_to_layers(self, convert_layer_type_list: Sequence[Type],
                          tar_layer_type: str,
                          skip_paths: Sequence[str] = (),
                          **layer_kwargs) -> int:
        """Replace every conv/linear of the given source types with the
        target family, sharing weights and carrying step sizes over when the
        source is already a quant layer (reference: :576-652). Returns the
        number of converted layers."""
        conv_cls, linear_cls = reg.resolve(tar_layer_type)
        converted = 0
        seed = 0
        # enhance adapters are digital-compute: never quantize their insides
        # (reference: register_dict.py digital_compute_layers)
        enhance_roots = [p for p, _, _, m in _walk(self.model)
                         if getattr(m, "layer_flag", None) in
                         ("enhance_layer", "enhance_branch")]
        skip_paths = tuple(skip_paths) + tuple(
            r + "." for r in enhance_roots)
        for path, parent, key, m in list(_walk(self.model)):
            if not isinstance(m, tuple(convert_layer_type_list)):
                continue
            skipped = any(path.startswith(sp) for sp in skip_paths)
            # the wrapped layer inside an enhance adapter IS convertible
            # (pipeline converts quant layers before/after adapter insertion)
            if skipped and (".original_conv" in path or
                            ".original_linear" in path or
                            path.endswith("original_conv") or
                            path.endswith("original_linear")):
                skipped = False
            if skipped:
                continue
            src_quant = isinstance(m, QuantState)
            if isinstance(m, (nnx.Conv, _QuantConvBase)):
                base = m if isinstance(m, nnx.Conv) else _conv_view(m)
                new = conv_cls(base, seed=seed, **layer_kwargs)
            elif isinstance(m, (nnx.Linear, _QuantLinearBase)):
                base = m if isinstance(m, nnx.Linear) else _linear_view(m)
                new = linear_cls(base, seed=seed, **layer_kwargs)
            else:
                continue
            if src_quant:  # carry learned quant state (reference: :608-651)
                new.step_size_input = m.step_size_input
                new.step_size_weight = m.step_size_weight
                new.step_size_output = m.step_size_output
                if hasattr(m, "adc_gain") and hasattr(new, "adc_gain"):
                    new.adc_gain = m.adc_gain
            _set_child(parent, key, new)
            converted += 1
            seed += 1
        log.info("convert_to_layers -> %s: %d layers", tar_layer_type,
                 converted)
        return converted

    def add_enhance_layers(self, ops_factor: float = 0.05,
                           target_types=None) -> int:
        """Wrap each conv/linear with a serial identity-init grouped-1x1
        enhance adapter (reference: add_enhance_layers, layers_enhance.py
        :368-436; harness call progressive_qn_train.py:543-546)."""
        from stablediffusion_pytorch_tpu.cim.enhance import (
            EnhanceLayerConv, EnhanceLayerLinear, is_enhance_module,
        )

        target_types = target_types or (
            reg.nn_layers + reg.custom_layers)
        n = 0
        for path, parent, key, m in list(_walk(self.model)):
            if is_enhance_module(m) or _is_adapter_internal(path):
                continue
            if isinstance(m, (nnx.Conv, _QuantConvBase)) and \
                    isinstance(m, tuple(target_types)):
                _set_child(parent, key, EnhanceLayerConv(m, ops_factor))
                n += 1
            elif isinstance(m, (nnx.Linear, _QuantLinearBase)) and \
                    isinstance(m, tuple(target_types)):
                _set_child(parent, key, EnhanceLayerLinear(m, ops_factor))
                n += 1
        log.info("add_enhance_layers(%.3f): %d adapters", ops_factor, n)
        return n

    def add_enhance_branch_LoR(self, ops_factor: float = 0.05,
                               relu: bool = False, sigmoid: bool = True,
                               target_types=None) -> int:
        """Add parallel grouped-LoRA branches with learned sigmoid blend
        (reference: add_enhance_branch_LoR, layers_enhance.py:439-533)."""
        from stablediffusion_pytorch_tpu.cim.enhance import (
            EnhanceBranchConvLoR, EnhanceBranchLinearLoR, is_enhance_module,
        )

        target_types = target_types or (reg.nn_layers + reg.custom_layers)
        n = 0
        for path, parent, key, m in list(_walk(self.model)):
            if is_enhance_module(m) or _is_adapter_internal(path) or \
                    ".original_" in path:
                continue
            if isinstance(m, (nnx.Conv, _QuantConvBase)) and \
                    isinstance(m, tuple(target_types)):
                _set_child(parent, key,
                           EnhanceBranchConvLoR(m, ops_factor, relu, sigmoid))
                n += 1
            elif isinstance(m, (nnx.Linear, _QuantLinearBase)) and \
                    isinstance(m, tuple(target_types)):
                _set_child(parent, key,
                           EnhanceBranchLinearLoR(m, ops_factor, relu,
                                                  sigmoid))
                n += 1
        log.info("add_enhance_branch_LoR(%.3f): %d branches", ops_factor, n)
        return n

    def convert_to_lsq_int_layers(self, weight_bit_extension: int = 4,
                                  int_grad: bool = False,
                                  x_detach: bool = False) -> int:
        """Swap trained LSQ quant layers for integer-arithmetic inference
        twins (reference: convert_to_lsq_int_layers :711-755)."""
        from stablediffusion_pytorch_tpu.cim.int_layers import (
            ConvLsqInt, LinearLsqInt,
        )

        n = 0
        for path, parent, key, m in list(_walk(self.model)):
            if isinstance(m, _QuantConvBase) and not isinstance(
                    m, (ConvLsqInt,)):
                _set_child(parent, key,
                           ConvLsqInt(m, weight_bit_extension, int_grad,
                                      x_detach))
                n += 1
            elif isinstance(m, _QuantLinearBase) and not isinstance(
                    m, (LinearLsqInt,)):
                _set_child(parent, key,
                           LinearLsqInt(m, weight_bit_extension, int_grad,
                                        x_detach))
                n += 1
        log.info("convert_to_lsq_int_layers: %d layers", n)
        return n

    def revert_to_nn_layer(self) -> int:
        """Swap every quant layer back to a plain nnx.Conv/nnx.Linear
        sharing the same weights (reference: :810-871)."""
        reverted = 0
        for path, parent, key, m in list(_walk(self.model)):
            if isinstance(m, _QuantConvBase):
                _set_child(parent, key, _conv_view(m))
                reverted += 1
            elif isinstance(m, _QuantLinearBase):
                _set_child(parent, key, _linear_view(m))
                reverted += 1
        return reverted

    # ------------------------------------------------------------------
    # progressive schedule (reference: :1306-1362)
    # ------------------------------------------------------------------
    def update_layer_parameter(self, update_layer_type_list=None, **params):
        """Push new static bits/noise into every matching quant layer via
        its update_para (triggers one recompile next step)."""
        types = tuple(update_layer_type_list or (QuantState,))
        n = 0
        for _, m in self.customized_layers():
            if isinstance(m, types):
                m.update_para(**params)
                n += 1
        return n

    def progressive_train(self, qn_cycle: int, update_layer_type_list=None,
                          start_cycle: int = 0, **kwargs):
        """Every kwarg named ``<param>_range=[start, end]`` is linearly
        interpolated over the cycles; integer params (bits) are rounded.
        Remaining kwargs pass through to ``self.train_model``."""
        ranges = {k[:-6]: v for k, v in kwargs.items() if k.endswith("_range")}
        passthrough = {k: v for k, v in kwargs.items()
                       if not k.endswith("_range")}
        results = []
        for cycle in range(start_cycle, qn_cycle):
            frac = cycle / max(qn_cycle - 1, 1)
            cycle_params = {}
            for name, (lo, hi) in ranges.items():
                val = lo + (hi - lo) * frac
                if "bit" in name:
                    val = int(round(val))
                cycle_params[name] = val
            self.update_layer_parameter(update_layer_type_list,
                                        **cycle_params)
            log.info("progressive cycle %d/%d: %s", cycle, qn_cycle,
                     cycle_params)
            results.append(self.train_model(cycle=cycle, **passthrough))
        return results

    def train_model(self, **kwargs):  # pragma: no cover - subclass hook
        raise NotImplementedError(
            "pass train_model= or subclass ProgressiveTrain (the reference's "
            "LDM_AnDi pattern)")

    # ------------------------------------------------------------------
    # checkpoint I/O (reference: :1377-1435)
    # ------------------------------------------------------------------
    def save_model(self, path: str) -> None:
        _ckpt_save(path, self.model)

    def load_model(self, path: str) -> None:
        _ckpt_load(path, self.model)


class _Recorder(nnx.Module):
    """Shape-capturing delegate used by gen_ops_dict."""

    def __init__(self, inner, path, sink):
        self.inner = inner
        self._path = path
        self._sink = sink

    def __call__(self, x, *args, **kwargs):
        self._sink[self._path] = tuple(x.shape)
        return self.inner(x, *args, **kwargs)


def _conv_view(q: _QuantConvBase) -> nnx.Conv:
    """Plain nnx.Conv sharing a quant conv's weights/geometry."""
    kh, kw, cin_g, cout = q.kernel[...].shape
    conv = nnx.Conv(cin_g * q.groups, cout, kernel_size=(kh, kw),
                    strides=q.strides, padding=q.padding,
                    feature_group_count=q.groups,
                    use_bias=q.bias is not None, rngs=nnx.Rngs(0))
    conv.kernel = q.kernel
    conv.bias = q.bias
    return conv


def _linear_view(q: _QuantLinearBase) -> nnx.Linear:
    cin, cout = q.kernel[...].shape
    linear = nnx.Linear(cin, cout, use_bias=q.bias is not None,
                        rngs=nnx.Rngs(0))
    linear.kernel = q.kernel
    linear.bias = q.bias
    return linear
