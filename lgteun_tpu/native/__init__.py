"""ctypes bindings for the native TIFF codec / batch loader.

Compiles `tiffio.cpp` with g++ on first use (cached as `_native.so`
next to the source). Every entry point degrades gracefully: when the
toolchain or the compiled library is unavailable, callers fall back to
the pure-Python codec in `lgteun_tpu.data.tiff`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "read_tiff_native", "write_tiff_native",
           "read_batch_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tiffio.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.lg_tiff_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.lg_tiff_info.restype = ctypes.c_int
        lib.lg_tiff_read_u16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64]
        lib.lg_tiff_read_u16.restype = ctypes.c_int
        lib.lg_tiff_write_u16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.lg_tiff_write_u16.restype = ctypes.c_int
        lib.lg_tiff_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_int]
        lib.lg_tiff_read_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def read_tiff_native(path: str) -> np.ndarray | None:
    """uint16 [H,W] or [H,W,C], or None if the native path can't."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.lg_tiff_info(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c)) != 0:
        return None
    out = np.empty(h.value * w.value * c.value, np.uint16)
    if lib.lg_tiff_read_u16(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.size) != 0:
        return None
    if c.value > 1:
        return out.reshape(h.value, w.value, c.value)
    return out.reshape(h.value, w.value)


def write_tiff_native(path: str, array: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(array, np.uint16)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return lib.lg_tiff_write_u16(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, c) == 0


def read_batch_native(paths: list[str], shape_hwc: tuple[int, int, int],
                      scale: float = 0.0,
                      threads: int = 8) -> np.ndarray | None:
    """Parallel decode of equally-shaped tiles -> float32
    [N, H, W, C] (scaled by `scale` when nonzero)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    h, w, c = shape_hwc
    elems = h * w * c
    out = np.empty((n, elems), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.lg_tiff_read_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        elems, ctypes.c_float(scale), threads)
    if rc != 0:
        return None
    return out.reshape(n, h, w, c)
