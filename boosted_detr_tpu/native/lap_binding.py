"""ctypes bindings for the native C++ LAP solver (native/lap/lap.cpp).

Builds the shared library on first use with g++ (cached next to the source;
rebuilt when the source is newer). This is the framework's own host-side
matcher — the reference leaned on scipy's C extension for the same job
(reference losses_and_metrics.py:4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "lap", "lap.cpp")
_SO = os.path.join(os.path.dirname(__file__), "lap", "liblap.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.lap_solve_batch.restype = None
    lib.lap_solve_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    lib.lap_total_cost.restype = ctypes.c_double
    lib.lap_total_cost.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def lap_solve_batch(cost: np.ndarray, num_objects: np.ndarray) -> np.ndarray:
    """cost [B, O, P] f32, num_objects [B] int32 -> mask [B, O, P] f32."""
    lib = load()
    cost = np.ascontiguousarray(cost, np.float32)
    n = np.ascontiguousarray(num_objects, np.int32).reshape(-1)
    b, o, p = cost.shape
    assert n.shape == (b,)
    mask = np.zeros_like(cost)
    lib.lap_solve_batch(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, o, p, n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return mask


def lap_total_cost(cost: np.ndarray, num_objects: np.ndarray) -> float:
    lib = load()
    cost = np.ascontiguousarray(cost, np.float32)
    n = np.ascontiguousarray(num_objects, np.int32).reshape(-1)
    b, o, p = cost.shape
    return float(lib.lap_total_cost(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, o, p, n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))
