"""ctypes bindings for the native C++ depth-IO library (native/depth_io.cpp).

Builds the shared library on first use if g++ is available (cached next to
the sources); every entry point degrades gracefully to the pure-Python path
when the native library can't be built or loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblsf_io.so")
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lsf_png_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.lsf_png_info.restype = ctypes.c_int
        lib.lsf_load_depth_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.lsf_load_depth_png.restype = ctypes.c_int
        lib.lsf_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.lsf_prefetcher_create.restype = ctypes.c_void_p
        lib.lsf_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16)]
        lib.lsf_prefetcher_next.restype = ctypes.c_int
        lib.lsf_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_load_depth_png(path: str) -> Optional[np.ndarray]:
    """Decode a 16-bit depth PNG via libpng; None if the native path is
    unavailable. Raises on decode errors."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.lsf_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(bd))
    if rc != 0:
        raise FileNotFoundError(f"lsf_png_info({path}) -> {rc}")
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.lsf_load_depth_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w.value, h.value,
    )
    if rc != 0:
        raise IOError(f"lsf_load_depth_png({path}) -> {rc}")
    return out


class DepthPrefetcher:
    """Ordered multi-threaded decode-ahead over a list of depth PNGs.

    Iterating yields float32 meter images; decode overlaps with consumption
    (feeding TSDF generation on device without stalling on IO).
    """

    def __init__(self, paths: List[str], width: int, height: int,
                 num_threads: int = 2, max_inflight: int = 4,
                 depth_unit_m: float = 0.001):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        self._n = len(paths)
        self._shape = (height, width)
        self._unit = depth_unit_m
        arr = (ctypes.c_char_p * self._n)(*self._paths)
        self._handle = lib.lsf_prefetcher_create(
            arr, self._n, width, height, num_threads, max_inflight
        )
        self._consumed = 0

    def __iter__(self):
        return self

    def __len__(self) -> int:
        return self._n

    def __next__(self) -> np.ndarray:
        if self._handle is None or self._consumed >= self._n:
            raise StopIteration
        out = np.empty(self._shape, np.uint16)
        rc = self._lib.lsf_prefetcher_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        )
        if rc == -100:
            raise StopIteration
        if rc != 0:
            raise IOError(f"prefetch decode failed with {rc}")
        self._consumed += 1
        return out.astype(np.float32) * self._unit

    def close(self):
        if self._handle is not None:
            self._lib.lsf_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
