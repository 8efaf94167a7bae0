"""ctypes bindings for the native real-time executor
(native/rt_executor.cc): the dual-rate loop runner + SPSC sensor ring the
reference implements with std::threads and a UDP receive thread
(MainHardware.cpp:85-130, HardwareA1ROS.cpp:89,245-378).

The shared library is built on demand with the in-repo Makefile (g++)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librt_executor.so")

_CALLBACK = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int64)


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rt_ring_create.restype = ctypes.c_void_p
    lib.rt_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.rt_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_ring_push.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.rt_ring_pop_latest.restype = ctypes.c_int
    lib.rt_ring_pop_latest.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float)]
    lib.rt_ring_dropped.restype = ctypes.c_uint64
    lib.rt_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.rt_loop_create.restype = ctypes.c_void_p
    lib.rt_loop_create.argtypes = [ctypes.c_int64, _CALLBACK,
                                   ctypes.c_void_p, ctypes.c_int]
    lib.rt_loop_start.argtypes = [ctypes.c_void_p]
    lib.rt_loop_stop.argtypes = [ctypes.c_void_p]
    lib.rt_loop_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_loop_stats.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double)]
    return lib


_lib: Optional[ctypes.CDLL] = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class SensorRing:
    """Lock-free SPSC ring of fixed-size float32 sensor frames. The producer
    (an I/O thread) pushes; the control loop pops the latest frame — same
    freshest-wins semantics as the reference's callbacks overwriting the
    blackboard."""

    def __init__(self, frame_len: int, capacity_pow2: int = 6):
        self.frame_len = frame_len
        self._h = lib().rt_ring_create(frame_len, capacity_pow2)

    def push(self, frame: np.ndarray) -> None:
        f = np.ascontiguousarray(frame, dtype=np.float32)
        assert f.size == self.frame_len
        lib().rt_ring_push(
            self._h, f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def pop_latest(self) -> Optional[np.ndarray]:
        out = np.empty(self.frame_len, np.float32)
        n = lib().rt_ring_pop_latest(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out if n > 0 else None

    @property
    def dropped(self) -> int:
        return int(lib().rt_ring_dropped(self._h))

    def __del__(self):
        try:
            lib().rt_ring_destroy(self._h)
        except Exception:
            pass


class RtLoop:
    """Fixed-period executor running ``fn(tick)`` on a native thread.

    ``compensate=True`` reproduces the hardware main's solve-time
    compensation (sleep = period - work, MainHardware.cpp:85-87);
    ``False`` is the sim mains' fixed schedule."""

    def __init__(self, period_s: float, fn: Callable[[int], None],
                 compensate: bool = True):
        self._fn = fn
        self._exc: Optional[BaseException] = None

        def trampoline(_ctx, tick):
            try:
                self._fn(int(tick))
            except BaseException as e:  # keep the native thread alive
                self._exc = e

        self._cb = _CALLBACK(trampoline)  # keep a reference!
        self._h = lib().rt_loop_create(int(period_s * 1e9), self._cb, None,
                                       1 if compensate else 0)
        self._running = False

    def start(self) -> None:
        lib().rt_loop_start(self._h)
        self._running = True

    def stop(self) -> None:
        if self._running:
            lib().rt_loop_stop(self._h)
            self._running = False
        if self._exc is not None:
            raise self._exc

    def stats(self) -> dict:
        out = (ctypes.c_double * 7)()
        lib().rt_loop_stats(self._h, out)
        return {
            "iterations": int(out[0]),
            "missed_deadlines": int(out[1]),
            "last_work_ms": out[2] / 1e6,
            "max_work_ms": out[3] / 1e6,
            "mean_work_ms": out[4] / 1e6,
            "max_jitter_ms": out[5] / 1e6,
            "mean_jitter_ms": out[6] / 1e6,
        }

    def __del__(self):
        try:
            if self._running:
                lib().rt_loop_stop(self._h)
            lib().rt_loop_destroy(self._h)
        except Exception:
            pass
