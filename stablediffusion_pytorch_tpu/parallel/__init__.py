"""Device mesh construction and sharding rules (DP over ICI)."""

from stablediffusion_pytorch_tpu.parallel.mesh import (
    make_mesh_for_batch,
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
