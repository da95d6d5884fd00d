"""ctypes bindings to the native C++ runtime (libpointslot_native.so).

Builds on first import if the compiled library is missing (g++ -O3); every
entry point has a pure-Python fallback so the framework degrades gracefully
on systems without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "native.cpp")
_LIB = os.path.join(_HERE, "libpointslot_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _build_failed = True
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.covis_create.restype = ctypes.c_void_p
    lib.covis_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.covis_destroy.argtypes = [ctypes.c_void_p]
    lib.covis_add_obs.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.covis_remove_obs.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.covis_remove_point.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.covis_remove_kf.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.covis_weights_of.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p]
    lib.covis_top.restype = ctypes.c_int
    lib.covis_top.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, i32p, i32p]
    lib.hungarian_solve.restype = ctypes.c_int
    lib.hungarian_solve.argtypes = [f64p, ctypes.c_int, ctypes.c_int, i32p]
    lib.hamming_knn.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int, i32p, i32p]
    lib.native_abi_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


class CovisGraph:
    """Incremental covisibility graph (native; numpy fallback)."""

    def __init__(self, max_points: int, max_kfs: int):
        self.max_points = max_points
        self.max_kfs = max_kfs
        lib = load()
        self._lib = lib
        if lib is not None:
            self._h = lib.covis_create(max_points, max_kfs)
        else:
            self._obs = np.zeros((max_points, max_kfs), bool)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.covis_destroy(self._h)
            self._h = None

    def add_obs(self, point: int, kf: int):
        if self._lib is not None:
            self._lib.covis_add_obs(self._h, int(point), int(kf))
        else:
            self._obs[point, kf] = True

    def remove_obs(self, point: int, kf: int):
        if self._lib is not None:
            self._lib.covis_remove_obs(self._h, int(point), int(kf))
        else:
            self._obs[point, kf] = False

    def remove_point(self, point: int):
        if self._lib is not None:
            self._lib.covis_remove_point(self._h, int(point))
        else:
            self._obs[point, :] = False

    def remove_kf(self, kf: int):
        if self._lib is not None:
            self._lib.covis_remove_kf(self._h, int(kf))
        else:
            self._obs[:, kf] = False

    def weights_of(self, kf: int) -> np.ndarray:
        if self._lib is not None:
            out = np.zeros(self.max_kfs, np.int32)
            self._lib.covis_weights_of(self._h, int(kf), out)
            return out
        col = self._obs[:, kf]
        return (self._obs[col].sum(axis=0)).astype(np.int32)

    def top(self, kf: int, min_weight: int = 15, n: int = 64):
        if self._lib is not None:
            ids = np.zeros(n, np.int32)
            ws = np.zeros(n, np.int32)
            cnt = self._lib.covis_top(self._h, int(kf), int(min_weight), int(n),
                                      ids, ws)
            return ids[:cnt], ws[:cnt]
        w = self.weights_of(kf)
        w[kf] = 0
        ids = np.nonzero(w >= min_weight)[0]
        ids = ids[np.argsort(-w[ids])][:n]
        return ids.astype(np.int32), w[ids].astype(np.int32)


def hungarian(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment: (R, C) cost with R <= C -> col index per row."""
    cost = np.ascontiguousarray(cost, np.float64)
    R, C = cost.shape
    lib = load()
    if lib is not None and R <= C:
        out = np.full(R, -1, np.int32)
        if lib.hungarian_solve(cost, R, C, out) == 0:
            return out
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.full(R, -1, np.int32)
    out[rows] = cols
    return out


def hamming_nn(desc_a: np.ndarray, desc_b: np.ndarray):
    """Nearest neighbor per row of desc_a in desc_b (packed uint32x8)."""
    a = np.ascontiguousarray(desc_a, np.uint32)
    b = np.ascontiguousarray(desc_b, np.uint32)
    lib = load()
    if lib is not None:
        idx = np.zeros(len(a), np.int32)
        dist = np.zeros(len(a), np.int32)
        lib.hamming_knn(a, len(a), b, len(b), idx, dist)
        return idx, dist
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    d = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    return d.argmin(axis=1).astype(np.int32), d.min(axis=1).astype(np.int32)
