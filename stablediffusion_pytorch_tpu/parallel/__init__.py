"""Device mesh construction and sharding rules: DP (mesh.py), Megatron
TP (tp.py), GPipe PP (pp.py), ZeRO-1 optimizer-state sharding (zero.py),
multi-process launch (multiprocess.py)."""

from stablediffusion_pytorch_tpu.parallel.mesh import (
    make_mesh_for_batch,
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    shard_stacked_batch,
    replicate,
)

from stablediffusion_pytorch_tpu.parallel.tp import (
    apply_tp_sharding,
    tp_spec_for,
)
from stablediffusion_pytorch_tpu.parallel.pp import (
    build_pp_forward,
    stack_transformer_layers,
    unstack_into_model,
)
from stablediffusion_pytorch_tpu.parallel.zero import (
    apply_zero1,
    shard_tree_zero1,
    zero1_spec,
)
from stablediffusion_pytorch_tpu.parallel.sp import (
    apply_sp,
    sp_sharding,
)
