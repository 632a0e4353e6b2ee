"""Multi-resolution pyramids and warp prolongation (SURVEY.md §2.10).

The hierarchical optimizer builds power-of-two pyramids of the canonical and
live TSDF fields (coarse levels via 2× block-mean downsampling, the
reference's EWA-aware alternative is available by regenerating coarse levels
directly from depth with ``ops.tsdf`` EWA methods on a coarsened grid), and
prolongates the solved warp from a coarse level to the next finer one
(multi-linear ×2 upsampling; displacement values are doubled because warps
are stored in voxel units and the voxel size halves).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def downsample2x_mean(field: jnp.ndarray) -> jnp.ndarray:
    """2× block-mean downsample of a scalar field (2D or 3D)."""
    d = field.ndim
    if any(s % 2 for s in field.shape):
        raise ValueError(f"shape {field.shape} not divisible by 2")
    shape = []
    for s in field.shape:
        shape.extend([s // 2, 2])
    out = field.reshape(shape)
    # Mean over the interleaved block axes (1, 3, 5, ...).
    return out.mean(axis=tuple(range(1, 2 * d, 2)))


def build_pyramid(field: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Pyramid [coarsest, ..., finest] with ``levels`` entries."""
    pyr = [field]
    for _ in range(levels - 1):
        pyr.append(downsample2x_mean(pyr[-1]))
    return pyr[::-1]


def prolongate_warp(warp: jnp.ndarray, target_shape=None) -> jnp.ndarray:
    """Upsample a warp field ``(*spatial, D)`` to 2× resolution.

    Multi-linear interpolation of each component, values doubled (voxel-unit
    displacements on a grid with half the voxel size).
    """
    spatial = warp.shape[:-1]
    d = warp.shape[-1]
    if target_shape is None:
        target_shape = tuple(2 * s for s in spatial)
    up = jax.image.resize(warp, tuple(target_shape) + (d,), method="linear")
    return up * 2.0
