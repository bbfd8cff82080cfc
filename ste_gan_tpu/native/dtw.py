"""ctypes binding of the native DTW kernel (see dtw.cpp)."""
from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from ste_gan_tpu.native.build import build_library

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_library("dtw")))
        lib.ste_gan_dtw_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.ste_gan_dtw_align.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def dtw_matrix(costs: np.ndarray) -> np.ndarray:
    costs = np.ascontiguousarray(costs, dtype=np.float32)
    t1, t2 = costs.shape
    out = np.empty((t1, t2), dtype=np.float32)
    _get_lib().ste_gan_dtw_matrix(_as_float_ptr(costs), t1, t2, _as_float_ptr(out))
    return out


def align_from_distances(costs: np.ndarray) -> List[int]:
    costs = np.ascontiguousarray(costs, dtype=np.float32)
    t1, t2 = costs.shape
    out = np.zeros((t1,), dtype=np.int32)
    _get_lib().ste_gan_dtw_align(
        _as_float_ptr(costs), t1, t2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out.tolist()
