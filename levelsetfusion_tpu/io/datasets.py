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


def load_snoopy_calib(path: str) -> dict:
    """Parse a Snoopy/KillingFusion-style text ``calib`` file into
    {fx, fy, cx, cy[, width, height]} (SURVEY §2.2 [MED]: the reference's
    real-data datasets carry per-dataset text calibration, not JSON).

    Two layouts are accepted, covering the common variants:

    - key-value lines: ``fx 570.3`` / ``fy: 570.3`` / ``ImageSize 640 480``
      (keys case-insensitive; ``cx``/``cy`` aka ``px``/``py``);
    - a whitespace 3×3 intrinsic matrix (first 9 bare floats found):
      K[0,0]=fx, K[1,1]=fy, K[0,2]=cx, K[1,2]=cy.
    """
    keys: dict = {}
    floats: list = []
    with open(path) as f:
        for line in f:
            tokens = line.replace(":", " ").replace(",", " ").split()
            if not tokens:
                continue
            head = tokens[0].lower()
            vals = []
            for t in tokens[1:]:
                try:
                    vals.append(float(t))
                except ValueError:
                    pass
            if head in ("fx", "fy", "cx", "cy", "px", "py") and vals:
                keys[{"px": "cx", "py": "cy"}.get(head, head)] = vals[0]
            elif head in ("imagesize", "image_size", "size") and len(vals) >= 2:
                keys["width"], keys["height"] = int(vals[0]), int(vals[1])
            elif head in ("width", "height") and vals:
                keys[head] = int(vals[0])
            else:
                # Bare numeric row (matrix layout) — all-or-nothing so a
                # partially-numeric line ('1.0 scale', trailing comments)
                # cannot leak stray values into the 3x3 parse.
                try:
                    row = [float(t) for t in tokens]
                except ValueError:
                    continue
                floats.extend(row)
    if not {"fx", "fy", "cx", "cy"} <= set(keys):
        if len(floats) < 9:
            raise ValueError(
                f"{path}: no fx/fy/cx/cy keys and no 3x3 matrix found"
            )
        k = floats[:9]
        keys.setdefault("fx", k[0])
        keys.setdefault("fy", k[4])
        keys.setdefault("cx", k[2])
        keys.setdefault("cy", k[5])
    return keys


_CALIB_CANDIDATES = (
    "intrinsics.json",
    "snoopy_calib.txt",
    "calibration.txt",
    "calib.txt",
)


@register("depth_directory")
def _depth_dir(path: str = "", pattern: str = "depth_{:06d}.png",
               calib: str | None = None, **kw) -> SequenceDataset:
    """Snoopy-style on-disk sequence: depth PNGs + calibration — either
    ``intrinsics.json`` ({fx, fy, cx, cy, width, height}) or a text calib
    file (``load_snoopy_calib``), auto-detected unless ``calib`` names
    one. Image size falls back to the first depth frame's shape when the
    calibration omits it."""
    if calib is None:
        for cand in _CALIB_CANDIDATES:
            if os.path.exists(os.path.join(path, cand)):
                calib = cand
                break
        else:
            raise FileNotFoundError(
                f"no calibration file in {path!r} (looked for "
                f"{', '.join(_CALIB_CANDIDATES)})"
            )
    calib_path = os.path.join(path, calib)
    if calib.endswith(".json"):
        with open(calib_path) as f:
            intr = json.load(f)
    else:
        intr = load_snoopy_calib(calib_path)
    if "width" not in intr or "height" not in intr:
        probe_path = os.path.join(path, pattern.format(0))
        probe = load_depth_png(probe_path)
        intr.setdefault("height", probe.shape[0])
        intr.setdefault("width", probe.shape[1])
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
