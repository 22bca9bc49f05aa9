"""Profiling and tracing utilities.

The reference has no torch.profiler integration; its observability is
forward hooks + analytic op counts + wall-clock/psutil logging (SURVEY.md
§5 tracing). The TPU-native equivalent:

  * ``trace(log_dir)`` — context manager around jax.profiler (produces
    Perfetto/XPlane traces viewable in TensorBoard or xprof)
  * ``annotate(name)`` — TraceAnnotation for labeling jitted regions
  * ``compiled_flops(fn, *args)`` — XLA's per-executable FLOP estimate
    (compile-time cost analysis)
  * ``MemoryMonitor`` — wall-clock + host-RSS snapshots per epoch
    (reference: psutil RAM logging, Model_DiT_12L_train.py:396-409)
"""

from __future__ import annotations

import contextlib
import logging
import os
import resource
import time
from typing import Any, Dict, Optional

import jax

log = logging.getLogger("sdtpu")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace window; open the result in xprof/TensorBoard."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Label a region inside a traced program."""
    return jax.profiler.TraceAnnotation(name)


def compiled_flops(fn, *args, **kwargs) -> Optional[float]:
    """XLA cost-analysis FLOPs for the compiled executable of fn(*args)."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception as e:  # pragma: no cover - backend-dependent
        log.warning("cost analysis unavailable: %s", e)
        return None


class MemoryMonitor:
    """Wall-clock + host peak-RSS per checkpointed phase."""

    def __init__(self):
        self.marks: Dict[str, Dict[str, Any]] = {}
        self._t0 = time.time()

    def mark(self, name: str) -> Dict[str, Any]:
        peak_rss_mb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024
        info = {"t_seconds": round(time.time() - self._t0, 2),
                "peak_rss_mb": round(peak_rss_mb, 1)}
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                info["device_bytes_in_use"] = stats.get("bytes_in_use")
                info["device_peak_bytes"] = stats.get("peak_bytes_in_use")
        except Exception:
            pass
        self.marks[name] = info
        log.info("[mem] %s: %s", name, info)
        return info
