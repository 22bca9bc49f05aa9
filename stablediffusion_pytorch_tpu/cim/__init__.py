"""CIM (compute-in-memory) quantization-aware-training stack.

The TPU-native re-implementation of the reference's research core
(SURVEY.md §2.8): quantized layer zoo (cim_layers/), progressive QAT harness
(cim_qn_train/), weight-array mapper (cim_weight_mapper/), chip runtime
simulator (cim_runtime_simple*/), energy/TOPS-W reporting, and custom
optimizers.
"""

from stablediffusion_pytorch_tpu.cim.layers import (
    ConvQn, LinearQn,
    ConvQnLsq, LinearQnLsq,
    ConvQLsq, LinearQLsq,
    ConvLsqBitSplit, LinearLsqBitSplit,
    ConvLsqAdda, LinearLsqAdda,
    ConvLsqAddaCim, LinearLsqAddaCim,
    calibrate_quant_layers,
)
from stablediffusion_pytorch_tpu.cim.registry import (
    REGISTRY, nn_layers, qn_layers, adda_layers, cim_layers, custom_layers,
)
from stablediffusion_pytorch_tpu.cim.progressive import ProgressiveTrain
