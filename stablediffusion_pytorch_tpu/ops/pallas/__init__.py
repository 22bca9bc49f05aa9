"""Pallas TPU kernels: flash attention and fused CIM bit-split MVM."""
