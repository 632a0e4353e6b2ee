"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference; here:
jax.profiler traces + a simple roofline estimate for solver iterations).

On this container's remote-TPU backend ``block_until_ready`` is a no-op, so
``device_time`` syncs by fetching a scalar — use it for all timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

# v5e single-chip peaks (approx): f32 VPU and HBM bandwidth.
V5E_HBM_GBPS = 820.0
V5E_F32_TFLOPS = 49.0  # MXU f32 equiv; VPU-only workloads are lower


def sync(x) -> float:
    """Force completion of ``x`` (scalar fetch; block_until_ready is broken
    on the axon backend)."""
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def device_time(fn: Callable, *args, repeats: int = 5) -> float:
    """Min wall time of ``fn(*args)`` with warmup and forced sync."""
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solver_roofline(shape, seconds_per_iter: float, dim: int = 3) -> Dict[str, float]:
    """Rough roofline for one solver iteration at the given field shape.

    Bytes model (f32): per iteration the fused program touches ~
    (resample reads + warp + gradients + stencils + updates) ≈ 30
    field-sized arrays for the full energy.
    """
    voxels = 1
    for s in shape:
        voxels *= s
    bytes_touched = 30 * voxels * 4
    mem_bound_s = bytes_touched / (V5E_HBM_GBPS * 1e9)
    return {
        "voxels": float(voxels),
        "seconds_per_iter": seconds_per_iter,
        "voxel_updates_per_s": voxels / seconds_per_iter,
        "memory_bound_seconds": mem_bound_s,
        "fraction_of_memory_roofline": mem_bound_s / seconds_per_iter,
    }
