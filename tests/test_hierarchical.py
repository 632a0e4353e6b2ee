"""Tests for the hierarchical coarse-to-fine solver (BASELINE config 2)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.models import (
    HierarchicalParams,
    SolverParams,
    solve_hierarchical,
    solve_single_level,
)
from levelsetfusion_tpu.ops.interpolation import warp_field
from tests.test_single_level import make_pair_fields


def _err_ratio(canonical, live, warp):
    warped = np.asarray(warp_field(live, warp))
    before = np.abs(np.asarray(live) - np.asarray(canonical)).sum()
    after = np.abs(warped - np.asarray(canonical)).sum()
    return after / before


def test_hierarchical_improves_alignment_on_large_motion():
    # 8 px bump shift (~12 voxels) — too large for flat single-level GD in
    # a comparable iteration budget.
    canonical, live, _ = make_pair_fields(live_shift_px=8.0, shape=(96, 64), offset=(-48, 75))
    params = HierarchicalParams(
        levels=3,
        base=SolverParams(
            max_iterations=60,
            learning_rate=1.0,
            convergence_threshold=1e-3,
            sobolev_smoothing=True,
        ),
    )
    res = solve_hierarchical(canonical, live, params)
    assert res.warp.shape == canonical.shape + (2,)
    assert len(res.level_results) == 3
    ratio_h = _err_ratio(canonical, live, res.warp)

    single = solve_single_level(
        canonical, live,
        SolverParams(max_iterations=180, learning_rate=1.0, convergence_threshold=1e-3),
    )
    ratio_s = _err_ratio(canonical, live, single.warp)
    assert ratio_h < 0.6, ratio_h
    assert ratio_h < ratio_s, (ratio_h, ratio_s)


def test_level_shapes_and_telemetry():
    canonical, live, _ = make_pair_fields(shape=(64, 32), offset=(-32, 85))
    params = HierarchicalParams(
        levels=2,
        base=SolverParams(max_iterations=25, learning_rate=1.0),
    )
    res = solve_hierarchical(canonical, live, params)
    assert res.level_results[0].warp.shape == (32, 16, 2)
    assert res.level_results[1].warp.shape == (64, 32, 2)
    for lr in res.level_results:
        assert lr.telemetry.data_energy.shape == (25,)


def test_initial_warp_passthrough():
    canonical, live, _ = make_pair_fields(shape=(64, 32), offset=(-32, 85))
    params = HierarchicalParams(levels=2, base=SolverParams(max_iterations=25, learning_rate=1.0))
    res1 = solve_hierarchical(canonical, live, params)
    res2 = solve_hierarchical(canonical, live, params, initial_warp=res1.warp)
    assert _err_ratio(canonical, live, res2.warp) <= _err_ratio(canonical, live, res1.warp) * 1.1


def test_hierarchical_from_depth_ewa_pyramid():
    """EWA depth-regenerated pyramid path (SURVEY.md §2.10) solves config-2
    style problems end-to-end."""
    import jax.numpy as jnp
    from levelsetfusion_tpu.core.grid import GridSpec
    from levelsetfusion_tpu.io import synthetic
    from levelsetfusion_tpu.models.hierarchical import (
        build_pyramid_from_depth,
        solve_hierarchical_from_depth,
    )
    from levelsetfusion_tpu.ops.tsdf import generate_tsdf_2d

    pair = synthetic.bump_wall_pair_2d(
        width=128, bump_height=0.04, bump_radius_px=20.0, live_shift_px=6.0
    )
    grid = GridSpec(shape=(96, 64), voxel_size=0.004, offset=(-48, 75))

    pyr, grids = build_pyramid_from_depth(
        jnp.asarray(pair.canonical_depth), pair.camera, grid, levels=3
    )
    assert [p.shape for p in pyr] == [(24, 16), (48, 32), (96, 64)]
    assert grids[0].voxel_size == 0.016
    # Coarse fields are genuinely in-band TSDFs, not all-truncated.
    assert float((abs(pyr[0]) < 1).mean()) > 0.1

    params = HierarchicalParams(
        levels=3,
        base=SolverParams(max_iterations=40, learning_rate=1.0,
                          convergence_threshold=1e-3, sobolev_smoothing=True),
    )
    res = solve_hierarchical_from_depth(
        jnp.asarray(pair.canonical_depth), jnp.asarray(pair.live_depth),
        pair.camera, grid, params,
    )
    canonical = generate_tsdf_2d(jnp.asarray(pair.canonical_depth), pair.camera, grid)
    live = generate_tsdf_2d(jnp.asarray(pair.live_depth), pair.camera, grid)
    assert _err_ratio(canonical, live, res.warp) < 0.6
