"""Native (C++/OpenMP) host-side kernels, built on demand with g++ and
bound via ctypes (no pybind11 dependency).

The TPU compute path never uses these — XLA/Pallas kernels do the device
work (refign_tpu/ops) — but the host runtime keeps native equivalents of the
reference's C++ ops for CPU-side tooling and as independent numerics oracles
(reference models/correlation_ops/correlation.cpp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libnative.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    # compile to a pid-unique temp path and rename into place: os.rename is
    # atomic, so a concurrent process either loads the old complete .so or
    # the new complete one — never a half-written ELF (the in-process lock
    # cannot guard cross-process races, e.g. pytest-xdist workers)
    src = os.path.join(_HERE, "correlation.cc")
    tmp = f"{_LIB_PATH}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.rename(tmp, _LIB_PATH)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def get_lib() -> ctypes.CDLL:
    """Build (if needed) and load the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_HERE, "correlation.cc")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.correlation_forward_nhwc.argtypes = [f32p, f32p, f32p,
                                                 i64, i64, i64, i64, i64]
        lib.correlation_backward_nhwc.argtypes = [f32p, f32p, f32p, f32p,
                                                  f32p, i64, i64, i64, i64,
                                                  i64]
        _LIB = lib
        return lib


def correlation_forward(target: np.ndarray, source: np.ndarray,
                        patch_size: int = 9) -> np.ndarray:
    """NHWC local correlation on the host: (N,H,W,C)x(N,H,W,C) ->
    (N,H,W,P*P)."""
    lib = get_lib()
    target = np.ascontiguousarray(target, np.float32)
    source = np.ascontiguousarray(source, np.float32)
    N, H, W, C = target.shape
    out = np.empty((N, H, W, patch_size * patch_size), np.float32)
    lib.correlation_forward_nhwc(target, source, out, N, H, W, C,
                                 patch_size)
    return out


def correlation_backward(target: np.ndarray, source: np.ndarray,
                         grad_out: np.ndarray, patch_size: int = 9):
    lib = get_lib()
    target = np.ascontiguousarray(target, np.float32)
    source = np.ascontiguousarray(source, np.float32)
    grad_out = np.ascontiguousarray(grad_out, np.float32)
    N, H, W, C = target.shape
    gt = np.empty_like(target)
    gs = np.empty_like(source)
    lib.correlation_backward_nhwc(target, source, grad_out, gt, gs,
                                  N, H, W, C, patch_size)
    return gt, gs
