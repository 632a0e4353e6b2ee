"""Tests for the native C++ depth-IO path (decode parity vs cv2 + ordered
threaded prefetch)."""

import os

import numpy as np
import pytest

from levelsetfusion_tpu.io import depth
from levelsetfusion_tpu.io.native_loader import (
    DepthPrefetcher,
    native_available,
    native_load_depth_png,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native IO library not buildable here"
)


def _write_pngs(tmp_path, n=6, w=32, h=24):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        d = (rng.uniform(0.2, 2.0, (h, w)) * (i + 1) / n).astype(np.float32)
        d[0, 0] = 0.0  # invalid pixel survives round trip
        p = str(tmp_path / f"depth_{i:06d}.png")
        depth.save_depth_png(p, d)
        paths.append(p)
    return paths


def test_native_decode_matches_cv2(tmp_path):
    import cv2

    paths = _write_pngs(tmp_path, n=2)
    native = native_load_depth_png(paths[0])
    ref = cv2.imread(paths[0], cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(native, ref)
    assert native.dtype == np.uint16


def test_load_depth_png_uses_native_and_scales(tmp_path):
    paths = _write_pngs(tmp_path, n=1)
    m = depth.load_depth_png(paths[0])
    assert m.dtype == np.float32
    assert m[0, 0] == 0.0
    assert 0.0 < m[5, 5] < 3.0


def test_prefetcher_order_and_values(tmp_path):
    import cv2

    paths = _write_pngs(tmp_path, n=6)
    pf = DepthPrefetcher(paths, width=32, height=24, num_threads=3, max_inflight=2)
    frames = list(pf)
    pf.close()
    assert len(frames) == 6
    for i, f in enumerate(frames):
        ref = cv2.imread(paths[i], cv2.IMREAD_UNCHANGED).astype(np.float32) * 0.001
        np.testing.assert_allclose(f, ref, atol=1e-7)


def test_prefetcher_missing_file_errors(tmp_path):
    paths = _write_pngs(tmp_path, n=2)
    paths.append(str(tmp_path / "missing.png"))
    pf = DepthPrefetcher(paths, width=32, height=24)
    next(pf)
    next(pf)
    with pytest.raises(IOError):
        next(pf)
    pf.close()
