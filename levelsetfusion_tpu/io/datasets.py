"""Dataset registry (SURVEY.md §2.2): predefined experiment inputs.

The reference ships a registry of predefined datasets (Snoopy depth-frame
pairs/sequences + synthetic cases) that experiment drivers select by name.
Rebuilt here as a small factory:

- synthetic entries are generated on the fly (``io.synthetic``);
- disk-backed entries ("snoopy-style") read 16-bit depth PNG directories with
  an intrinsics file, via ``io.depth`` (native C++ fast path when built).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, List

import numpy as np

from levelsetfusion_tpu.core.camera import PinholeCamera
from levelsetfusion_tpu.io import synthetic
from levelsetfusion_tpu.io.depth import load_depth_png


@dataclasses.dataclass
class SequenceDataset:
    """A depth sequence + camera, the unit every experiment driver consumes."""

    name: str
    camera: PinholeCamera
    frames: List[np.ndarray] = dataclasses.field(default_factory=list)
    _paths: List[str] | None = None

    def __len__(self) -> int:
        return len(self.frames) if self.frames else len(self._paths or [])

    def frame(self, t: int) -> np.ndarray:
        if self.frames:
            return self.frames[t]
        return load_depth_png(self._paths[t])

    def frame_source(self, start: int = 0):
        """Sized iterable of frames from ``start``, for ``fuse_sequence``.

        Disk-backed sequences return a native ``DepthPrefetcher`` when the
        C++ decoder is built — frames t+1.. decode on background threads
        while the device solves frame t (the ingest/solve overlap of
        SURVEY §2's PP-analogue row). Falls back to lazy per-frame Python
        decode, then to the in-memory list.
        """
        if self._paths:
            paths = self._paths[start:]
            from levelsetfusion_tpu.io import native_loader

            if native_loader.native_available() and paths:
                probe = load_depth_png(paths[0])
                return native_loader.DepthPrefetcher(
                    paths, width=probe.shape[1], height=probe.shape[0]
                )
            return _LazyFrames(paths)
        return self.frames[start:]


class _LazyFrames:
    """Pure-Python fallback frame source: sized, ordered, decode-on-demand."""

    def __init__(self, paths):
        self._paths = paths

    def __len__(self):
        return len(self._paths)

    def __iter__(self):
        for p in self._paths:
            yield load_depth_png(p)


_REGISTRY: Dict[str, Callable[..., SequenceDataset]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def names() -> List[str]:
    return sorted(_REGISTRY)


def get(name: str, **kw) -> SequenceDataset:
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; available: {names()}")
    return _REGISTRY[name](**kw)


@register("synthetic_blob_pair")
def _blob_pair(width: int = 64, height: int = 64, **kw) -> SequenceDataset:
    canonical, live, cam = synthetic.blob_pair_3d(width, height, **kw)
    return SequenceDataset("synthetic_blob_pair", cam, [canonical, live])


@register("synthetic_snoopy")
def _snoopy(num_frames: int = 8, width: int = 64, height: int = 64, **kw) -> SequenceDataset:
    seq = synthetic.snoopy_style_sequence_3d(num_frames, width, height, **kw)
    return SequenceDataset("synthetic_snoopy", seq.camera, list(seq.frames))


@register("depth_directory")
def _depth_dir(path: str = "", pattern: str = "depth_{:06d}.png", **kw) -> SequenceDataset:
    """Snoopy-style on-disk sequence: depth PNGs + ``intrinsics.json``
    holding {fx, fy, cx, cy, width, height}."""
    with open(os.path.join(path, "intrinsics.json")) as f:
        intr = json.load(f)
    cam = PinholeCamera(
        fx=intr["fx"], fy=intr["fy"], cx=intr["cx"], cy=intr["cy"],
        image_width=intr["width"], image_height=intr["height"],
    )
    paths = []
    t = 0
    while True:
        p = os.path.join(path, pattern.format(t))
        if not os.path.exists(p):
            break
        paths.append(p)
        t += 1
    ds = SequenceDataset(f"depth_directory:{path}", cam, [])
    ds._paths = paths
    return ds
