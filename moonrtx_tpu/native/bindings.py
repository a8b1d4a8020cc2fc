"""ctypes bindings for the native data-pipeline kernels.

The shared library is built lazily on first use (make in this directory);
every entry point has a numpy fallback in the callers, so a missing
toolchain only costs speed, never functionality (mirroring the cache
philosophy of reference data_loader.py:13-18).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libmoonrtx_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    lib.block_mean_int16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), i64, i64, i64,
        ctypes.POINTER(ctypes.c_float), i64]
    lib.block_mean_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, i64, i64,
        ctypes.POINTER(ctypes.c_float), i64]
    lib.resample_bilinear_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, i64,
        ctypes.POINTER(ctypes.c_float), i64, i64, i64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def block_mean_int16(src: np.ndarray, factor: int,
                     n_threads: int = 0) -> np.ndarray:
    """Multithreaded block-mean of an int16 raster -> float32."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.int16)
    h, w = src.shape
    dst = np.empty((h // factor, w // factor), np.float32)
    lib.block_mean_int16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), h, w, factor,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return dst


def block_mean_f32(src: np.ndarray, factor: int,
                   n_threads: int = 0) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w = src.shape
    dst = np.empty((h // factor, w // factor), np.float32)
    lib.block_mean_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, factor,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return dst


def resample_bilinear_f32(src: np.ndarray, dst_h: int, dst_w: int,
                          n_threads: int = 0) -> np.ndarray:
    """Bilinear resample with longitude wrap (equirectangular maps)."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w = src.shape
    dst = np.empty((dst_h, dst_w), np.float32)
    lib.resample_bilinear_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dst_h, dst_w,
        n_threads)
    return dst
