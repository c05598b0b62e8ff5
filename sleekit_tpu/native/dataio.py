"""Token-shard data loader: ctypes wrapper over dataio.cpp.

``TokenShard`` memory-maps an "SKT1" shard; ``windows()`` assembles
(batch, seq_len) int32 batches (multithreaded native gather) and
``Prefetcher`` keeps a ring of ready batches filled by a background
thread - host IO runs ahead of the accelerator. Every entry point has a
numpy fallback (np.memmap) so the framework works without a toolchain.

No reference analogue: the reference reads whole .npy files per layer
(ref experiments/compare.py:51-54); a production framework feeds
calibration and eval from pre-tokenized shards.
"""

from __future__ import annotations

import ctypes
import os
import sys
import threading
from typing import Optional

import numpy as np

from sleekit_tpu.native import build_lib

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataio.cpp")
_LIB_PATH = os.path.join(_HERE, f"_dataio_{sys.platform}.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_MAGIC = b"SKT1"


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else build_lib(
            _SRC, _LIB_PATH)
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.skt_write.argtypes = [ctypes.c_char_p, i32p, i64, i32]
        lib.skt_write.restype = i32
        lib.skt_open.argtypes = [ctypes.c_char_p]
        lib.skt_open.restype = i64
        lib.skt_len.argtypes = [i64]
        lib.skt_len.restype = i64
        lib.skt_close.argtypes = [i64]
        lib.skt_close.restype = i32
        lib.skt_fill_windows.argtypes = [i64, i64p, i64, i64, i32p]
        lib.skt_fill_windows.restype = i32
        lib.skt_prefetch_start.argtypes = [i64, i64, i64, i64, i64, i64]
        lib.skt_prefetch_start.restype = i64
        lib.skt_prefetch_next.argtypes = [i64, i32p]
        lib.skt_prefetch_next.restype = i32
        lib.skt_prefetch_stop.argtypes = [i64]
        lib.skt_prefetch_stop.restype = i32
        _lib = lib
        return _lib


def write_shard(path: str, tokens: np.ndarray,
                dtype_size: Optional[int] = None) -> None:
    """Write an SKT1 token shard (u16 when the vocab fits, else u32)."""
    tokens = np.ascontiguousarray(tokens, np.int32)
    if dtype_size is None:
        dtype_size = 2 if (tokens.size == 0 or int(tokens.max()) < 65536) else 4
    lib = get_lib()
    if lib is not None:
        rc = lib.skt_write(path.encode(), tokens, tokens.size, dtype_size)
        if rc == 0:
            return
    # numpy fallback, bit-identical format
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(dtype_size).tobytes())
        f.write(np.uint64(tokens.size).tobytes())
        dt = np.uint16 if dtype_size == 2 else np.uint32
        f.write(tokens.astype(dt).tobytes())


class TokenShard:
    """Memory-mapped token shard with native batch assembly."""

    def __init__(self, path: str):
        self.path = path
        self._handle = -1
        lib = get_lib()
        if lib is not None:
            h = lib.skt_open(path.encode())
            if h >= 0:
                self._handle = int(h)
                self._len = int(lib.skt_len(h))
                self._mm = None
                return
        # numpy fallback: parse the header, memmap the payload
        with open(path, "rb") as f:
            head = f.read(16)
        assert head[:4] == _MAGIC, f"{path}: not an SKT1 shard"
        dtype_size = int(np.frombuffer(head[4:8], np.uint32)[0])
        count = int(np.frombuffer(head[8:16], np.uint64)[0])
        dt = np.uint16 if dtype_size == 2 else np.uint32
        self._mm = np.memmap(path, dtype=dt, mode="r", offset=16,
                             shape=(count,))
        self._len = count

    def __len__(self) -> int:
        return self._len

    def windows(self, starts, seq_len: int) -> np.ndarray:
        """Gather len(starts) windows of seq_len tokens (wrapping)."""
        starts = np.ascontiguousarray(starts, np.int64)
        out = np.empty((len(starts), seq_len), np.int32)
        lib = get_lib()
        if self._handle >= 0 and lib is not None:
            rc = lib.skt_fill_windows(self._handle, starts, len(starts),
                                      seq_len, out)
            assert rc == 0, f"skt_fill_windows failed: {rc}"
            return out
        idx = (starts[:, None] + np.arange(seq_len)[None, :]) % self._len
        return self._mm[idx].astype(np.int32)

    def batches(self, n_batches: int, batch: int, seq_len: int,
                stride: Optional[int] = None, start: int = 0):
        """Sequential (batch, seq_len) windows - the calibration feed."""
        stride = stride or seq_len
        pos = start
        for _ in range(n_batches):
            starts = pos + stride * np.arange(batch, dtype=np.int64)
            yield self.windows(starts, seq_len)
            pos += stride * batch

    def close(self) -> None:
        lib = get_lib()
        if self._handle >= 0 and lib is not None:
            lib.skt_close(self._handle)
            self._handle = -1
        self._mm = None


class Prefetcher:
    """Background-thread batch pipeline over a TokenShard.

    Native path: a C++ thread fills a ring of ready batches; ``next()``
    only memcpys. Fallback: plain synchronous assembly.
    """

    def __init__(self, shard: TokenShard, batch: int, seq_len: int,
                 stride: Optional[int] = None, start: int = 0,
                 depth: int = 4):
        self.shard = shard
        self.batch, self.seq_len = batch, seq_len
        self.stride = stride or seq_len
        self._pf = -1
        self._pos = start
        lib = get_lib()
        if shard._handle >= 0 and lib is not None:
            pf = lib.skt_prefetch_start(shard._handle, batch, seq_len,
                                        self.stride, start, depth)
            if pf >= 0:
                self._pf = int(pf)

    def next(self) -> np.ndarray:
        lib = get_lib()
        if self._pf >= 0 and lib is not None:
            out = np.empty((self.batch, self.seq_len), np.int32)
            rc = lib.skt_prefetch_next(self._pf, out)
            assert rc == 0
            return out
        starts = self._pos + self.stride * np.arange(self.batch,
                                                     dtype=np.int64)
        self._pos += self.stride * self.batch
        return self.shard.windows(starts, self.seq_len)

    def stop(self) -> None:
        lib = get_lib()
        if self._pf >= 0 and lib is not None:
            lib.skt_prefetch_stop(self._pf)
            self._pf = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
