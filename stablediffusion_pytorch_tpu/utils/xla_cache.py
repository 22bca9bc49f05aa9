"""Persistent XLA compilation-cache setup shared by tests, CLI tools, the
driver entry, and bench.

Two cache families:

- ``tpu``: executables target the remote chip through the axon relay; the
  host that deserializes them doesn't execute them, so one directory is
  shared across VM reboots.
- ``cpu``: XLA:CPU AOT results embed the *compile* machine's CPU feature set
  (AVX512 subsets etc.). After a VM reboot onto different hardware, loading
  an old entry makes cpu_aot_loader warn about unsupported features and can
  SIGILL mid-test. The cpu cache directory is therefore keyed by a
  fingerprint of the host's CPU flags: a new machine shape gets a fresh,
  automatically-rebuilt cache instead of a poisoned one.

NOTE (both families): a process killed mid-write can leave a truncated
entry; jax deserializes it without validation and segfaults in
``compilation_cache.get_executable_and_time`` on the next run. If a tool or
the suite starts segfaulting there, delete the cache directory.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cpu_fingerprint() -> str:
    """Short hash of this machine's CPU feature flags AND model name.

    The model name matters, not just the flags: XLA:CPU picks per-SKU
    compile tuning (e.g. ``prefer-no-scatter``/``prefer-no-gather`` on
    CPUs with slow scatter/gather) from the detected CPU MODEL, so two
    hosts with identical cpuinfo flags can still produce AOT entries that
    SIGILL/segfault on each other (observed after a VM migration in round
    5: cpu_aot_loader machine-feature mismatch -> segfault mid-suite)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    parts.append(line.strip())
                    if len(parts) == 2:
                        break
    except OSError:
        pass
    if parts:
        return hashlib.sha1("|".join(sorted(parts)).encode()).hexdigest()[:10]
    return (platform.machine() or "unknown").lower()


def cache_dir(kind: str) -> str:
    """Cache directory path for ``kind`` in {'cpu', 'tpu'}."""
    if kind == "tpu":
        return os.path.expanduser("~/.cache/sdtpu/xla_cache_tpu")
    if kind == "cpu":
        return os.path.expanduser(
            f"~/.cache/sdtpu/xla_cache_cpu_{host_cpu_fingerprint()}")
    raise ValueError(f"unknown cache kind: {kind!r}")


def configure_persistent_cache(jax_module, kind: str) -> bool:
    """Point jax at the persistent cache for ``kind``; True on success.

    Takes the caller's ``jax`` module instead of importing it here so import
    order stays in the caller's control (conftest must set platform config
    before anything else touches backends).
    """
    try:
        path = cache_dir(kind)
        os.makedirs(path, exist_ok=True)
        jax_module.config.update("jax_compilation_cache_dir", path)
        jax_module.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0)
        jax_module.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # pragma: no cover - read-only fs etc.
        return False
