"""Native (C++) host-side acceleration, consumed via ctypes.

Currently: multithreaded sub-byte packing/unpacking and fused
quantize-index+pack for checkpoint conversion (packing.cpp). The shared
library builds on first use with the system compiler; every entry point
has a numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packing.cpp")
_LIB_PATH = os.path.join(_HERE, f"_packing_{sys.platform}.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build_lib(src: str, lib_path: str) -> Optional[str]:
    """Compile one C++ source into a shared library (returns path or None)."""
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", lib_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return lib_path
    except Exception:
        return None


def _build() -> Optional[str]:
    return build_lib(_SRC, _LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.skq_pack.argtypes = [u8p, i64, i64, i32, i32p]
        lib.skq_pack.restype = i32
        lib.skq_unpack.argtypes = [i32p, i64, i64, i32, u8p]
        lib.skq_unpack.restype = i32
        lib.skq_quantize_pack_uniform.argtypes = [
            f32p, i64, i64, i32, i32, ctypes.c_float, ctypes.c_float, i32p]
        lib.skq_quantize_pack_uniform.restype = i32
        _lib = lib
        return _lib


def _vpw(nbits: int) -> int:
    return 10 if nbits == 3 else 32 // nbits


def pack_indices_np(idx: np.ndarray, nbits: int) -> np.ndarray:
    """Host-side packing: native when available, numpy otherwise.
    Bit-compatible with sleekit_tpu.ops.pack.pack_indices."""
    idx = np.ascontiguousarray(idx, np.uint8)
    k, n = idx.shape
    vpw = _vpw(nbits)
    kw = -(-k // vpw)
    lib = get_lib()
    if lib is not None:
        out = np.empty((kw, n), np.int32)
        if lib.skq_pack(idx, k, n, nbits, out) == 0:
            return out
    # numpy fallback
    pad = np.zeros((kw * vpw, n), np.uint32)
    pad[:k] = idx
    grouped = pad.reshape(kw, vpw, n)
    shifts = (np.arange(vpw, dtype=np.uint32) * nbits)[None, :, None]
    return (grouped << shifts).sum(axis=1, dtype=np.uint32).view(np.int32)


def unpack_indices_np(words: np.ndarray, nbits: int, k: int) -> np.ndarray:
    words = np.ascontiguousarray(words, np.int32)
    kw, n = words.shape
    vpw = _vpw(nbits)
    lib = get_lib()
    if lib is not None:
        out = np.empty((k, n), np.uint8)
        if lib.skq_unpack(words, k, n, nbits, out) == 0:
            return out.astype(np.int32)
    u = words.view(np.uint32)
    shifts = (np.arange(vpw, dtype=np.uint32) * nbits)[None, :, None]
    sub = (u[:, None, :] >> shifts) & np.uint32((1 << nbits) - 1)
    return sub.reshape(kw * vpw, n)[:k].astype(np.int32)


def quantize_pack_uniform_np(w_normalized: np.ndarray, nbits: int,
                             levels: int, step: float, zero: float
                             ) -> np.ndarray:
    """Fused round-to-grid + pack for uniform codebooks (the checkpoint
    conversion hot loop)."""
    w = np.ascontiguousarray(w_normalized, np.float32)
    k, n = w.shape
    vpw = _vpw(nbits)
    kw = -(-k // vpw)
    lib = get_lib()
    if lib is not None:
        out = np.empty((kw, n), np.int32)
        if lib.skq_quantize_pack_uniform(w, k, n, nbits, levels,
                                         float(step), float(zero), out) == 0:
            return out
    idx = np.clip(np.round((w - zero) / step), 0, levels - 1).astype(np.uint8)
    return pack_indices_np(idx, nbits)
