"""ctypes binding for the native C++ batch assembler (native/batcher.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source);
falls back cleanly to the numpy path when a toolchain is unavailable — the
caller checks ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "batcher.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libbatcher.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, text=True)
            lib = ctypes.CDLL(_SO)
            lib.bf_open.restype = ctypes.c_void_p
            lib.bf_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint32, ctypes.c_uint32]
            lib.bf_close.argtypes = [ctypes.c_void_p]
            lib.bf_gather_pad.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
                ctypes.c_uint32, ctypes.c_uint32,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ]
            lib.bf_gather_pad_bf16.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
                ctypes.c_uint32, ctypes.c_uint32,
                np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            ]
            lib.bf_dim.restype = ctypes.c_uint32
            lib.bf_dim.argtypes = [ctypes.c_void_p]
            lib.bf_rows.restype = ctypes.c_uint64
            lib.bf_rows.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — any failure -> numpy fallback
            _build_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


class NativeBatcher:
    """Parallel gather+pad over a packed feature cache's features.bin."""

    def __init__(self, features_bin: str, rows: int, dim: int,
                 n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native batcher unavailable: {_build_error}")
        self._lib = lib
        self.dim = dim
        self.n_threads = int(n_threads)   # as requested (0 = hw default)
        self._h = lib.bf_open(features_bin.encode(), rows, dim, n_threads)
        if not self._h:
            raise OSError(f"bf_open failed for {features_bin}")

    def gather_pad(self, starts: np.ndarray, lens: np.ndarray,
                   pad_rows: int, out: Optional[np.ndarray] = None) -> np.ndarray:
        """starts [B] uint64 row offsets, lens [B] uint32 row counts ->
        fp32 [B, pad_rows, dim]."""
        starts = np.ascontiguousarray(starts, np.uint64)
        lens = np.ascontiguousarray(lens, np.uint32)
        B = starts.shape[0]
        if out is None:
            out = np.empty((B, pad_rows, self.dim), np.float32)
        self._lib.bf_gather_pad(self._h, starts, lens, B, pad_rows, out)
        return out

    def gather_pad_bf16(self, starts: np.ndarray, lens: np.ndarray,
                        pad_rows: int,
                        out: Optional[np.ndarray] = None) -> np.ndarray:
        """Like gather_pad but emits bf16 [B, pad_rows, dim] (ml_dtypes
        view over the uint16 bit pattern) — half the host->device bytes
        for the bf16-matmul serving engine."""
        import ml_dtypes

        starts = np.ascontiguousarray(starts, np.uint64)
        lens = np.ascontiguousarray(lens, np.uint32)
        B = starts.shape[0]
        if out is None:
            bits = np.empty((B, pad_rows, self.dim), np.uint16)
        else:
            bits = out.view(np.uint16)
        self._lib.bf_gather_pad_bf16(self._h, starts, lens, B, pad_rows,
                                     bits)
        return bits.view(ml_dtypes.bfloat16)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.bf_close(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass
