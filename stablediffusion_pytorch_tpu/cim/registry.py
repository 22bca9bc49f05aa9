"""Layer registry: family name -> (conv class, linear class) + group tuples.

Re-implements reference cim_layers/register_dict.py:12-115 — the string
names are preserved so configs and surgery calls written against the
reference vocabulary keep working.
"""

from __future__ import annotations

from flax import nnx

from stablediffusion_pytorch_tpu.cim.layers import (
    ConvLsqAdda, ConvLsqAddaCim, ConvLsqBitSplit, ConvQLsq, ConvQn, ConvQnLsq,
    LinearLsqAdda, LinearLsqAddaCim, LinearLsqBitSplit, LinearQLsq, LinearQn,
    LinearQnLsq,
)

# family name -> (ConvClass, LinearClass)
REGISTRY = {
    "layers_qn": (ConvQn, LinearQn),
    "layers_qn_lsq": (ConvQnLsq, LinearQnLsq),
    "layers_q_lsq": (ConvQLsq, LinearQLsq),
    "layers_qn_lsq_bit_split": (ConvLsqBitSplit, LinearLsqBitSplit),
    "layers_qn_lsq_adda": (ConvLsqAdda, LinearLsqAdda),
    "layers_qn_lsq_adda_cim": (ConvLsqAddaCim, LinearLsqAddaCim),
    "layers_qn_lsq_adda_cim_opt": (ConvLsqAddaCim, LinearLsqAddaCim),
    # row-split is subsumed by the uniform array tiling (rows always split
    # at array granularity here); multi-gains = same classes after
    # enable_multi_gains() (reference: ..._row_split.py, ..._multi_gains.py)
    "layers_qn_lsq_adda_cim_row_split": (ConvLsqAddaCim, LinearLsqAddaCim),
    "layers_qn_lsq_adda_cim_multi_gains": (ConvLsqAddaCim, LinearLsqAddaCim),
}

# group tuples (reference: register_dict.py groupings)
nn_layers = (nnx.Conv, nnx.Linear)
qn_layers = (ConvQn, LinearQn, ConvQnLsq, LinearQnLsq, ConvQLsq, LinearQLsq,
             ConvLsqBitSplit, LinearLsqBitSplit)
adda_layers = (ConvLsqAdda, LinearLsqAdda)
cim_layers = (ConvLsqAddaCim, LinearLsqAddaCim)
custom_layers = qn_layers + adda_layers + cim_layers

# digital-compute escape hatch: enhance adapters stay full precision
# (reference: register_dict.py digital_compute_layers)
digital_compute_layers = ("enhance_layer", "enhance_branch")


def resolve(tar_layer_type: str):
    """Family name -> (ConvClass, LinearClass); raises on unknown."""
    if tar_layer_type not in REGISTRY:
        raise KeyError(
            f"unknown layer family {tar_layer_type!r}; "
            f"known: {sorted(REGISTRY)}")
    return REGISTRY[tar_layer_type]
