"""Production serving: batched TPU inference engine + HTTP front-end.

TPU-first replacement for the reference's interactive GUI scripts
(SURVEY.md §2.6) — see engine.py for the design contract (static shapes,
one compiled program, request coalescing)."""

from stablediffusion_pytorch_tpu.serving.continuous import SlotEngine
from stablediffusion_pytorch_tpu.serving.engine import (
    GenerateRequest, InferenceEngine, RequestBatcher,
)
from stablediffusion_pytorch_tpu.serving.server import make_server

__all__ = ["GenerateRequest", "InferenceEngine", "RequestBatcher",
           "SlotEngine", "make_server"]
