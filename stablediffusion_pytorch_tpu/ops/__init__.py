"""Numeric primitives: straight-through estimators, LSQ quantization,
bit-split/concat, and Pallas TPU kernels."""

from stablediffusion_pytorch_tpu.ops.ste import (
    ste,
    round_pass,
    round_pass_exp,
    floor_pass,
    floor_no_pass,
    clamp_pass,
    grad_scale,
    grad_scale_factor,
)
from stablediffusion_pytorch_tpu.ops.quant import (
    data_quant,
    data_quant_pass,
    data_quant_lsq,
    weight_quant_lsq,
    weight_quant_round,
    weight_quant_floor,
    add_noise,
    external_noise_key,
    get_external_noise_key,
    init_step_size,
)
from stablediffusion_pytorch_tpu.ops.bit_ops import (
    bit_split,
    bit_concat,
    bit_len_for,
)
