"""Weight-array mapper: tile layer weights into array-sized blocks and
bin-pack the blocks onto physical CIM arrays with a skyline algorithm.

Re-implements reference cim_weight_mapper/ (817 LoC):
  * gen_weight_split_dict — tile each layer's 2-D weight (rows = in*k^2,
    cols = out) into array-sized blocks with start/size records
    (reference: weight_process.py:10-40)
  * convert_to_cim_weights — attach weight_mapping_info to modules (:43-73)
  * map_blocks_to_boxes — skyline (height-map) bin packing of size-sorted
    blocks into physical arrays (reference: weight_mapper.py:22+)
  * map_weight_for_model — split -> sort -> pack -> write
    weight_addr/array_idx/array_size back (reference:
    weight_process.py:177-199; used with TC05 576x2048 arrays in the DiT-9L
    ADDA stage, Model_DiT_9L_train.py:594-600)
  * weight_drift — log-domain conductance-drift noise per weight level
    (reference: weight_process.py:122-176)
  * draw_weight_blocks — array occupancy visualization (weight_mapper.py:
    232-479)
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim import registry as reg
from stablediffusion_pytorch_tpu.cim.layers import (
    _QuantConvBase, _QuantLinearBase,
)

log = logging.getLogger("sdtpu")


def get_2d_weight_shape(module) -> Tuple[int, int]:
    """(rows, cols) of the layer's 2-D weight: conv HWIO -> (kh*kw*in, out),
    linear -> (in, out) (reference: weight_process.py:5-7 layout)."""
    k = module.kernel[...].shape
    if len(k) == 4:
        return k[0] * k[1] * k[2], k[3]
    return k[0], k[1]


def gen_weight_split_dict(module, weight_block_size) -> Dict[str, dict]:
    """Uniform tiling with remainder blocks (reference:
    weight_process.py:10-40)."""
    max_rows, max_cols = weight_block_size
    rows, cols = get_2d_weight_shape(module)
    info = {}
    for rb in range(rows // max_rows + 1):
        for cb in range(cols // max_cols + 1):
            sr, sc = rb * max_rows, cb * max_cols
            ar, ac = min(max_rows, rows - sr), min(max_cols, cols - sc)
            if ar <= 0 or ac <= 0:
                continue
            info[f"{rb}_{cb}"] = {"start_row": sr, "start_col": sc,
                                  "row_num": ar, "col_num": ac}
    return info


def convert_to_cim_weights(model, weight_block_size, module_for_map=None,
                           assign_layers=None, exclude_layers=None
                           ) -> Dict[str, dict]:
    """Attach per-module weight_mapping_info (reference:
    weight_process.py:43-73)."""
    if exclude_layers is not None and assign_layers is not None:
        raise ValueError("Either 'excluded_layers' or 'assign_layers' "
                         "should be provided, but not both.")
    from stablediffusion_pytorch_tpu.cim.progressive import _walk

    module_for_map = module_for_map or reg.cim_layers
    model_info = {}
    for name, _, _, module in _walk(model):
        if not isinstance(module, tuple(module_for_map)):
            continue
        if exclude_layers is not None and name in exclude_layers:
            continue
        if assign_layers is not None and name not in assign_layers:
            continue
        info = gen_weight_split_dict(module, weight_block_size)
        module.weight_mapping_info = info
        model_info[name] = info
    if not model_info:
        log.info("No CIM layers. No weight converted.")
    return model_info


# ---------------------------------------------------------------------------
# skyline packer (reference: weight_mapper.py:22+)
# ---------------------------------------------------------------------------

class _Array:
    def __init__(self, rows: int, cols: int):
        self.rows = rows
        self.cols = cols
        self.height_map = np.zeros(cols, dtype=np.int64)
        self.placements: List[dict] = []

    def try_place(self, brows: int, bcols: int) -> Optional[Tuple[int, int]]:
        """Lowest-skyline placement: scan candidate columns, place the block
        at the min-height feasible span."""
        if brows > self.rows or bcols > self.cols:
            return None
        best = None
        for start in range(0, self.cols - bcols + 1):
            top = int(self.height_map[start:start + bcols].max())
            if top + brows > self.rows:
                continue
            if best is None or top < best[0] or (top == best[0]
                                                 and start < best[1]):
                best = (top, start)
        if best is None:
            return None
        top, start = best
        self.height_map[start:start + bcols] = top + brows
        return top, start


def map_blocks_to_boxes(block_dict: Dict[str, Tuple[int, int]],
                        box_size: Tuple[int, int]) -> Dict[str, dict]:
    """Pack blocks {key: (rows, cols)} into arrays of box_size. Returns
    {key: {'weight_addr': (row, col), 'array_idx': i}}."""
    if not block_dict:
        log.info("No Weight For Mapping")
        return {}
    arrays: List[_Array] = []
    mapping = {}
    for key, (brows, bcols) in block_dict.items():
        placed = False
        for idx, arr in enumerate(arrays):
            pos = arr.try_place(brows, bcols)
            if pos is not None:
                mapping[key] = {"weight_addr": pos, "array_idx": idx}
                placed = True
                break
        if not placed:
            arrays.append(_Array(*box_size))
            pos = arrays[-1].try_place(brows, bcols)
            if pos is None:
                raise ValueError(
                    f"block {key} ({brows}x{bcols}) exceeds array {box_size}")
            mapping[key] = {"weight_addr": pos,
                            "array_idx": len(arrays) - 1}
    log.info("packed %d blocks into %d arrays of %s", len(block_dict),
             len(arrays), box_size)
    return mapping


def map_weight_for_model(model, array_size: Tuple[int, int],
                         weight_block_size: Optional[Tuple[int, int]] = None,
                         array_device_name: str = "array",
                         module_for_map=None, assign_layers=None,
                         exclude_layers=None) -> Dict[str, dict]:
    """split -> size-sorted skyline packing -> write-back
    (reference: weight_process.py:177-199)."""
    weight_block_size = weight_block_size or array_size
    weight_info = convert_to_cim_weights(
        model, weight_block_size, module_for_map=module_for_map,
        assign_layers=assign_layers, exclude_layers=exclude_layers)

    blocks = {}
    for layer_key, layer_info in weight_info.items():
        for split_key, mi in layer_info.items():
            blocks[f"{layer_key}|{split_key}"] = (mi["row_num"],
                                                  mi["col_num"])
    # sort by (cols, rows) descending (reference: sort_block_dict)
    blocks = dict(sorted(blocks.items(),
                         key=lambda kv: (kv[1][1], kv[1][0]), reverse=True))
    mapping = map_blocks_to_boxes(blocks, array_size)

    from stablediffusion_pytorch_tpu.cim.progressive import _walk

    model_mapping = {}
    by_name = {name: m for name, _, _, m in _walk(model)}
    for block_key, place in mapping.items():
        layer_key, split_key = block_key.split("|")
        module = by_name[layer_key]
        module.weight_mapping_info[split_key].update(
            weight_addr=place["weight_addr"], array_idx=place["array_idx"],
            array_size=tuple(array_size))
        module.array_device = array_device_name
        model_mapping[layer_key] = module.weight_mapping_info
    return model_mapping


# ---------------------------------------------------------------------------
# drift simulation (reference: weight_process.py:122-176)
# ---------------------------------------------------------------------------

def generate_weight_est(weight: jax.Array, std_tar: Dict[float, float],
                        key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-level log-normal conductance drift: look up a std per rounded
    weight level, perturb log|w|, restore sign. Returns
    (drifted, effective_std / weight_range)."""
    w = jnp.where(weight == 0, weight + 0.01, weight)
    levels = jnp.asarray(sorted(std_tar.keys()), jnp.float32)
    stds = jnp.asarray([std_tar[k] for k in sorted(std_tar.keys())],
                       jnp.float32)
    idx = jnp.clip(jnp.searchsorted(levels, jnp.round(w), side="right") - 1,
                   0, len(levels) - 1)
    w_std = stds[idx]
    noise = jax.random.normal(key, w.shape) * w_std
    est = jnp.exp(jnp.log(jnp.abs(w)) + noise) * jnp.sign(w)
    rng = jnp.max(w) - jnp.min(w)
    std_est = jnp.std(est - w) / rng
    return est, std_est


def weight_drift(model, std_tar: Dict[float, float], key=None,
                 module_for_map=None, assign_layers=None,
                 exclude_layers=None) -> Dict[str, float]:
    """Apply drift to every CIM layer's weights in place
    (reference: weight_process.py:159-176)."""
    from stablediffusion_pytorch_tpu.cim.progressive import _walk

    key = key if key is not None else jax.random.PRNGKey(0)
    module_for_map = module_for_map or reg.custom_layers
    out = {}
    for name, _, _, module in _walk(model):
        if not isinstance(module, tuple(module_for_map)):
            continue
        if exclude_layers is not None and name in exclude_layers:
            continue
        if assign_layers is not None and name not in assign_layers:
            continue
        key, sub = jax.random.split(key)
        drifted, std_est = generate_weight_est(module.kernel[...], std_tar,
                                               sub)
        module.kernel.value = drifted
        out[name] = float(std_est)
        log.info("Generated Drifted Weight: %s (eff std %.4f)", name,
                 out[name])
    return out


# ---------------------------------------------------------------------------
# visualization (reference: weight_mapper.py:232-479)
# ---------------------------------------------------------------------------

def draw_weight_blocks(model_mapping: Dict[str, dict],
                       array_size: Tuple[int, int], out_path: str) -> None:
    """Rectangle plot of block placements per array."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Rectangle

        n_arrays = 1 + max(
            mi.get("array_idx", 0)
            for layer in model_mapping.values() for mi in layer.values())
        fig, axes = plt.subplots(1, n_arrays,
                                 figsize=(4 * n_arrays, 4), squeeze=False)
        rng = np.random.default_rng(0)
        colors = {name: rng.random(3) * 0.7 + 0.2 for name in model_mapping}
        for li, (name, layer) in enumerate(model_mapping.items()):
            for mi in layer.values():
                if "weight_addr" not in mi:
                    continue
                ax = axes[0][mi["array_idx"]]
                r, c = mi["weight_addr"]
                ax.add_patch(Rectangle((c, r), mi["col_num"], mi["row_num"],
                                       facecolor=colors[name],
                                       edgecolor="black", lw=0.3))
        for i in range(n_arrays):
            ax = axes[0][i]
            ax.set_xlim(0, array_size[1])
            ax.set_ylim(0, array_size[0])
            ax.invert_yaxis()
            ax.set_title(f"array {i}")
        fig.tight_layout()
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
    except Exception as e:  # visualization is best-effort
        log.warning("draw_weight_blocks failed: %s", e)
