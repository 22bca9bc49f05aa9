"""Native (C++) host-side kernels, built on demand with g++ + ctypes.

The counterpart of the reference's cross-platform JIT extension builder
(cim_layers/bitsplit/build_universal.py:1-281, MSVC/gcc detection) — here a
single g++ invocation cached next to the source. No pybind11 in this image,
so the binding is ctypes over an extern-C ABI.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger("sdtpu")

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "bitsplit.cpp")
# build OUTSIDE the package: a bare .so inside a package dir looks like a
# broken CPython extension module to importers/pkgutil
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "sdtpu")
_LIB_PATH = os.path.join(_CACHE, "libbitsplit.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    os.makedirs(_CACHE, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH]
    log.info("building native bitsplit: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library(rebuild: bool = False) -> ctypes.CDLL:
    """Build (if needed) and load the native library."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.bit_split_f32.argtypes = [fp, fp, ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int]
    lib.bit_concat_f32.argtypes = [fp, fp, ctypes.c_int64, ctypes.c_int,
                                   ctypes.c_int]
    lib.bit_len_for.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.bit_len_for.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native bitsplit unavailable: %s", e)
        return False


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float32))


def bit_split(x_q, x_bit: int, slice_bit: int) -> np.ndarray:
    """Native bit_split: (B, ...) -> (bit_len * B, ...) matching
    ops.bit_ops.bit_split's forward layout."""
    lib = load_library()
    x = _as_f32(x_q)
    n = x.size
    bit_len = lib.bit_len_for(x_bit, slice_bit)
    out = np.empty((bit_len * x.shape[0],) + x.shape[1:], np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.bit_split_f32(x.ctypes.data_as(fp), out.ctypes.data_as(fp),
                      n, x_bit, slice_bit)
    return out


def bit_concat(slices, x_bit: int, slice_bit: int) -> np.ndarray:
    """Native inverse of :func:`bit_split`."""
    lib = load_library()
    s = _as_f32(slices)
    bit_len = lib.bit_len_for(x_bit, slice_bit)
    assert s.shape[0] % bit_len == 0
    b = s.shape[0] // bit_len
    out = np.empty((b,) + s.shape[1:], np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.bit_concat_f32(s.ctypes.data_as(fp), out.ctypes.data_as(fp),
                       out.size, x_bit, slice_bit)
    return out
