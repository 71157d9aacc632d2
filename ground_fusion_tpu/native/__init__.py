"""ctypes bindings for the native ingest runtime (src/ingest.cpp).

Build with ``python scripts/build_native.py``; falls back to None when the
shared library is absent (the pure-Python pipeline path keeps working)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(os.path.dirname(__file__), "libgfingest.so")
    if not os.path.exists(so):
        return None
    L = ctypes.CDLL(so)
    L.gf_ingest_create.restype = ctypes.c_void_p
    L.gf_ingest_destroy.argtypes = [ctypes.c_void_p]
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ip = ctypes.POINTER(ctypes.c_int)
    L.gf_push_imu.argtypes = [ctypes.c_void_p, ctypes.c_double, dp, dp]
    L.gf_push_wheel.argtypes = [ctypes.c_void_p, ctypes.c_double, dp, dp]
    for f in (L.gf_drain_imu, L.gf_drain_wheel):
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
                      ctypes.c_int, dp, dp, dp, u8p, dp, dp]
    L.gf_sync_pairs.restype = ctypes.c_int
    L.gf_sync_pairs.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int,
                                ctypes.c_double, ip, ip, ctypes.c_int]
    _LIB = L
    return L


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeIngest:
    """Ring-buffered sensor ingest backed by the C++ runtime."""

    def __init__(self):
        L = lib()
        if L is None:
            raise RuntimeError("libgfingest.so not built — run scripts/build_native.py")
        self._L = L
        self._h = L.gf_ingest_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._L.gf_ingest_destroy(self._h)
            self._h = None

    def push_imu(self, t, acc, gyr):
        acc = np.ascontiguousarray(acc, np.float64)
        gyr = np.ascontiguousarray(gyr, np.float64)
        self._L.gf_push_imu(self._h, float(t), _dptr(acc), _dptr(gyr))

    def push_wheel(self, t, vel, gyr):
        vel = np.ascontiguousarray(vel, np.float64)
        gyr = np.ascontiguousarray(gyr, np.float64)
        self._L.gf_push_wheel(self._h, float(t), _dptr(vel), _dptr(gyr))

    def _drain(self, fn, t0, t1, cap):
        dts = np.zeros(cap)
        a = np.zeros((cap, 3))
        b = np.zeros((cap, 3))
        valid = np.zeros(cap, np.uint8)
        a0 = np.zeros(3)
        b0 = np.zeros(3)
        fn(self._h, float(t0), float(t1), cap, _dptr(dts), _dptr(a), _dptr(b),
           valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _dptr(a0), _dptr(b0))
        return dts, a, b, valid.astype(bool), a0, b0

    def drain_imu(self, t0, t1, cap):
        return self._drain(self._L.gf_drain_imu, t0, t1, cap)

    def drain_wheel(self, t0, t1, cap):
        return self._drain(self._L.gf_drain_wheel, t0, t1, cap)


def sync_pairs(ts_a, ts_b, tol=0.003, cap=4096):
    """Greedy timestamp pairing (sync_process ±3 ms)."""
    L = lib()
    ts_a = np.ascontiguousarray(ts_a, np.float64)
    ts_b = np.ascontiguousarray(ts_b, np.float64)
    oi = np.zeros(cap, np.int32)
    oj = np.zeros(cap, np.int32)
    n = L.gf_sync_pairs(_dptr(ts_a), len(ts_a), _dptr(ts_b), len(ts_b),
                        float(tol),
                        oi.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                        oj.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), cap)
    return oi[:n], oj[:n]
