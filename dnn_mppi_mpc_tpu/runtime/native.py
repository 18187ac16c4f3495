"""ctypes bindings for the dmmrt native runtime (auto-built with g++).

See src/dmmrt.cpp for what/why. The library is compiled on first use into the
package directory; pybind11 is not available in the image so the ABI is plain
C via ctypes. All classes degrade gracefully: if no C++ toolchain is present,
``load_library()`` raises and callers can fall back to Python timing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "dmmrt.cpp")
_LIB = os.path.join(_DIR, "libdmmrt.so")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    """Compile libdmmrt.so with g++ (idempotent unless force)."""
    with _LOCK:
        if force or not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
    return _LIB


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build_library()
    lib = ctypes.CDLL(_LIB)
    i64, p = ctypes.c_int64, ctypes.c_void_p
    lib.pacer_create.restype = p
    lib.pacer_create.argtypes = [i64]
    lib.pacer_wait.restype = i64
    lib.pacer_wait.argtypes = [p]
    for f in ("pacer_ticks", "pacer_overruns", "pacer_worst_late_ns", "pacer_mean_late_ns"):
        getattr(lib, f).restype = i64
        getattr(lib, f).argtypes = [p]
    lib.pacer_destroy.argtypes = [p]

    lib.ring_create.restype = p
    lib.ring_create.argtypes = [i64, i64]
    lib.ring_push.restype = ctypes.c_int32
    lib.ring_push.argtypes = [p, ctypes.c_void_p]
    lib.ring_pop.restype = i64
    lib.ring_pop.argtypes = [p, ctypes.c_void_p, i64]
    lib.ring_dropped.restype = i64
    lib.ring_dropped.argtypes = [p]
    lib.ring_destroy.argtypes = [p]

    lib.chan_create.restype = p
    lib.chan_create.argtypes = [i64]
    lib.chan_write.argtypes = [p, ctypes.c_void_p]
    lib.chan_read.restype = i64
    lib.chan_read.argtypes = [p, ctypes.c_void_p]
    lib.chan_destroy.argtypes = [p]
    _lib = lib
    return lib


def _handle(obj):
    """Guarded handle access: a NULL handle through ctypes segfaults in C
    (round-2 review finding) — raise a Python error instead."""
    h = obj._h
    if not h:
        raise RuntimeError(f"{type(obj).__name__} is closed")
    return h


class RatePacer:
    """Absolute-deadline loop pacing (native clock_nanosleep)."""

    def __init__(self, hz: float) -> None:
        if not (hz > 0):
            raise ValueError(f"hz must be positive, got {hz}")
        self._lib = load_library()
        self._h = self._lib.pacer_create(int(1e9 / hz))
        if not self._h:
            raise MemoryError("pacer_create failed")

    def wait(self) -> int:
        """Sleep until the next deadline; returns lateness in ns."""
        return self._lib.pacer_wait(_handle(self))

    @property
    def stats(self) -> dict:
        h = _handle(self)
        return {
            "ticks": self._lib.pacer_ticks(h),
            "overruns": self._lib.pacer_overruns(h),
            "worst_late_ns": self._lib.pacer_worst_late_ns(h),
            "mean_late_ns": self._lib.pacer_mean_late_ns(h),
        }

    def close(self) -> None:
        if self._h:
            self._lib.pacer_destroy(self._h)
            self._h = None


class TelemetryRing:
    """Lock-free SPSC ring of fixed-dtype records (control-loop telemetry)."""

    def __init__(self, capacity: int, dtype: np.dtype) -> None:
        self._lib = load_library()
        self.dtype = np.dtype(dtype)
        if capacity & (capacity - 1):
            raise ValueError("capacity must be a power of two")
        self._h = self._lib.ring_create(capacity, self.dtype.itemsize)
        if not self._h:
            raise MemoryError("ring_create failed")

    def push(self, record: np.ndarray) -> bool:
        rec = np.ascontiguousarray(record, dtype=self.dtype)
        return bool(
            self._lib.ring_push(_handle(self), rec.ctypes.data_as(ctypes.c_void_p))
        )

    def pop(self, max_records: int) -> np.ndarray:
        out = np.empty(max_records, dtype=self.dtype)
        n = self._lib.ring_pop(
            _handle(self), out.ctypes.data_as(ctypes.c_void_p), max_records
        )
        return out[:n]

    @property
    def dropped(self) -> int:
        return self._lib.ring_dropped(_handle(self))

    def close(self) -> None:
        if self._h:
            self._lib.ring_destroy(self._h)
            self._h = None


class StateChannel:
    """Seqlock double buffer: wait-free writer, consistent-snapshot readers."""

    def __init__(self, dtype: np.dtype) -> None:
        self._lib = load_library()
        self.dtype = np.dtype(dtype)
        self._h = self._lib.chan_create(self.dtype.itemsize)
        if not self._h:
            raise MemoryError("chan_create failed")

    def write(self, value: np.ndarray) -> None:
        v = np.ascontiguousarray(value, dtype=self.dtype)
        self._lib.chan_write(_handle(self), v.ctypes.data_as(ctypes.c_void_p))

    def read(self) -> Optional[np.ndarray]:
        out = np.empty(1, dtype=self.dtype)
        seq = self._lib.chan_read(_handle(self), out.ctypes.data_as(ctypes.c_void_p))
        if seq < 0:
            return None
        return out[0]

    def close(self) -> None:
        if self._h:
            self._lib.chan_destroy(self._h)
            self._h = None


__all__ = ["build_library", "load_library", "RatePacer", "TelemetryRing", "StateChannel"]
