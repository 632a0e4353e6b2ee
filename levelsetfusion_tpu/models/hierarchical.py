"""Hierarchical coarse-to-fine warp solver (SURVEY.md §2.10, §3.2).

Builds power-of-two pyramids of the canonical and live TSDF fields, solves
the warp at the coarsest level, then prolongates (×2 upsample, displacement
doubled) as the warm start for each finer level. The per-level solve is the
jitted ``solve_single_level`` while-loop; the level loop itself is a static
Python loop (level count and shapes are static), so the whole thing still
traces into per-level compiled programs with no host-device sync beyond
telemetry retrieval.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp

from levelsetfusion_tpu.models.params import HierarchicalParams
from levelsetfusion_tpu.models.single_level import SolveResult, solve_single_level
from levelsetfusion_tpu.ops import pyramid


class HierarchicalResult(NamedTuple):
    warp: jnp.ndarray  # finest-level warp
    level_results: List[SolveResult]  # [coarsest, ..., finest]
    # Sharded solves only (parallel.hierarchical): per-level live halo
    # actually used — an int for levels that ran voxel-block sharded, None
    # for levels that ran replicated (exact single-device semantics, no
    # halo contract). The displacement-contract guard checks each level
    # against ITS halo, not the config's flat ``live_halo`` (the driver
    # sizes fine-level halos adaptively from the measured coarse motion).
    # None (default) on single-device solves, where no contract applies.
    level_halos: tuple | None = None


def build_pyramid_from_depth(
    depth,
    camera,
    grid,
    levels: int,
    narrow_band_width_voxels: int = 20,
    coarse_method=None,
):
    """EWA-aware pyramid (SURVEY.md §2.10 [MED]): instead of block-mean
    downsampling the fine TSDF, coarse levels are regenerated directly from
    the depth image on coarsened grids with EWA sampling — the footprint of a
    coarse voxel in the image is integrated rather than aliased.

    Returns ([coarsest, ..., finest] fields, matching GridSpecs).
    """
    from levelsetfusion_tpu.ops.tsdf import (
        GenerationMethod,
        generate_tsdf_2d,
        generate_tsdf_3d,
    )

    if coarse_method is None:
        coarse_method = GenerationMethod.EWA_IMAGE
    gen = generate_tsdf_2d if grid.dim == 2 else generate_tsdf_3d
    fields, grids = [], []
    g = grid
    for level in range(levels):
        method = GenerationMethod.BASIC if level == 0 else coarse_method
        fields.append(
            gen(
                depth,
                camera,
                g,
                narrow_band_width_voxels=narrow_band_width_voxels,
                method=method,
            )
        )
        grids.append(g)
        if level + 1 < levels:
            # Halve the band width in voxels as voxels double in size, so the
            # metric truncation distance is preserved across levels.
            narrow_band_width_voxels = max(narrow_band_width_voxels // 2, 2)
            g = g.coarsened(2)
    return fields[::-1], grids[::-1]


def solve_hierarchical(
    canonical: jnp.ndarray,
    live: jnp.ndarray,
    params: HierarchicalParams = HierarchicalParams(),
    initial_warp: jnp.ndarray | None = None,
) -> HierarchicalResult:
    """Coarse-to-fine warp solve.

    ``initial_warp`` (finest resolution) is downsampled to the coarsest level
    if given — used by warm-started multi-frame fusion.
    """
    canon_pyr = pyramid.build_pyramid(canonical, params.levels)
    live_pyr = pyramid.build_pyramid(live, params.levels)

    warp = None
    if initial_warp is not None:
        warp = initial_warp
        for _ in range(params.levels - 1):
            # Downsample warp: block-mean per component, displacement halved.
            warp = (
                jnp.stack(
                    [
                        pyramid.downsample2x_mean(warp[..., c])
                        for c in range(warp.shape[-1])
                    ],
                    axis=-1,
                )
                * 0.5
            )

    return _solve_over_pyramids(canon_pyr, live_pyr, params, warp)


def _solve_over_pyramids(canon_pyr, live_pyr, params, warp=None) -> HierarchicalResult:
    results: List[SolveResult] = []
    for level in range(params.levels):
        canon_l, live_l = canon_pyr[level], live_pyr[level]
        res = solve_single_level(canon_l, live_l, params.base, initial_warp=warp)
        results.append(res)
        if level + 1 < params.levels:
            warp = pyramid.prolongate_warp(
                res.warp, target_shape=canon_pyr[level + 1].shape
            )
        else:
            warp = res.warp

    return HierarchicalResult(warp=warp, level_results=results)


def solve_hierarchical_from_depth(
    canonical_depth,
    live_depth,
    camera,
    grid,
    params: HierarchicalParams = HierarchicalParams(),
    narrow_band_width_voxels: int = 20,
    coarse_method=None,
) -> HierarchicalResult:
    """Hierarchical solve with EWA depth-regenerated pyramids (§2.10)."""
    canon_pyr, _ = build_pyramid_from_depth(
        canonical_depth, camera, grid, params.levels,
        narrow_band_width_voxels, coarse_method,
    )
    live_pyr, _ = build_pyramid_from_depth(
        live_depth, camera, grid, params.levels,
        narrow_band_width_voxels, coarse_method,
    )
    return _solve_over_pyramids(canon_pyr, live_pyr, params)
