"""Depth image IO (SURVEY.md §2.2): 16-bit depth PNGs (millimeters) → meters.

Pure-Python path uses cv2/PIL; a native C++ fast path (libpng + threaded
prefetch, ``levelsetfusion_tpu/native``) is used automatically when built —
see ``io.native_loader``.
"""

from __future__ import annotations

import os

import numpy as np

DEPTH_UNIT_M = 0.001  # Kinect-style: 16-bit PNG values are millimeters.


def load_depth_png(path: str | os.PathLike, depth_unit_m: float = DEPTH_UNIT_M) -> np.ndarray:
    """Load a 16-bit depth PNG as float32 meters (0 stays 0 = invalid)."""
    try:
        from levelsetfusion_tpu.io.native_loader import native_load_depth_png

        arr = native_load_depth_png(os.fspath(path))
        if arr is not None:
            return arr.astype(np.float32) * depth_unit_m
    except Exception:
        pass
    import cv2

    arr = cv2.imread(os.fspath(path), cv2.IMREAD_UNCHANGED)
    if arr is None:
        raise FileNotFoundError(path)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.float32) * depth_unit_m


def save_depth_png(path: str | os.PathLike, depth_m: np.ndarray, depth_unit_m: float = DEPTH_UNIT_M) -> None:
    """Save float32 meters as a 16-bit depth PNG."""
    import cv2

    mm = np.clip(np.round(depth_m / depth_unit_m), 0, 65535).astype(np.uint16)
    if not cv2.imwrite(os.fspath(path), mm):
        raise IOError(f"failed to write {path}")
