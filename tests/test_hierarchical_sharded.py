"""Sharded hierarchical solve: parity vs the single-device hierarchical
solver, and the large-motion case the flat sharded solver's halo contract
cannot absorb (VERDICT r2 missing #2)."""

import numpy as np
import jax
import jax.numpy as jnp

from levelsetfusion_tpu.models.hierarchical import solve_hierarchical
from levelsetfusion_tpu.models.params import HierarchicalParams, SolverParams
from levelsetfusion_tpu.parallel import make_mesh
from levelsetfusion_tpu.parallel.hierarchical import solve_hierarchical_sharded
from tests.test_single_level import make_pair_fields


def _sphere_pair_3d(shape=(64, 64, 64), shift=10.0, radius=16.0, band=8.0):
    idx = [np.arange(s, dtype=np.float32) for s in shape]
    x, y, z = np.meshgrid(*idx, indexing="ij")
    c = [s / 2.0 for s in shape]
    r = np.sqrt((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
    canonical = np.clip((r - radius) / band, -1, 1).astype(np.float32)
    r2 = np.sqrt((x - c[0] - shift) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2)
    live = np.clip((r2 - radius) / band, -1, 1).astype(np.float32)
    return jnp.asarray(canonical), jnp.asarray(live)


def test_hierarchical_sharded_parity_2d():
    """Small-motion 2D pair: sharded == single device through all levels
    (coarsest level here is too small to shard → replicated fallback path
    is exercised too)."""
    canonical, live, _ = make_pair_fields()
    params = HierarchicalParams(
        levels=3,
        base=SolverParams(
            max_iterations=20, convergence_threshold=0.0,
            sobolev_smoothing=True, learning_rate=0.5,
        ),
    )
    ref = solve_hierarchical(canonical, live, params)
    mesh = make_mesh(4)
    sh = solve_hierarchical_sharded(canonical, live, params, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sh.warp), np.asarray(ref.warp), atol=2e-5, rtol=1e-4
    )
    for lvl, (a, b) in enumerate(zip(ref.level_results, sh.level_results)):
        assert int(a.iterations) == int(b.iterations), lvl
        n = int(a.iterations)
        np.testing.assert_allclose(
            np.asarray(b.telemetry.data_energy)[:n],
            np.asarray(a.telemetry.data_energy)[:n],
            atol=1e-4, rtol=2e-4, err_msg=f"level {lvl}",
        )


def test_hierarchical_sharded_large_motion():
    """10-voxel motion over 4 devices with 16-row blocks: the flat sharded
    solver's default contract (live_halo=8 → 6 rows) cannot absorb it; the
    hierarchical driver sizes the fine-level halo from the measured coarse
    displacement and stays in parity with the single-device hierarchical
    solve."""
    canonical, live = _sphere_pair_3d(shift=10.0)
    params = HierarchicalParams(
        levels=3,
        base=SolverParams(
            max_iterations=40, convergence_threshold=0.0,
            sobolev_smoothing=True, learning_rate=0.5,
            smoothing_term_weight=0.1,
        ),
    )
    ref = solve_hierarchical(canonical, live, params)
    # The converged warp really does exceed the default flat contract.
    max_ux = float(jnp.max(jnp.abs(ref.warp[..., 0])))
    assert max_ux > 6.0, max_ux

    mesh = make_mesh(4)
    sh = solve_hierarchical_sharded(canonical, live, params, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sh.warp), np.asarray(ref.warp), atol=5e-5, rtol=1e-4
    )
    # The finest level genuinely ran sharded (not the replicated fallback).
    finest = sh.level_results[-1]
    assert finest.warp.sharding.spec[0] == "x", finest.warp.sharding


def test_hierarchical_sharded_warm_start():
    canonical, live, _ = make_pair_fields()
    params = HierarchicalParams(
        levels=2,
        base=SolverParams(max_iterations=10, convergence_threshold=0.0),
    )
    w0 = jnp.ones(canonical.shape + (2,), canonical.dtype) * 0.25
    ref = solve_hierarchical(canonical, live, params, initial_warp=w0)
    sh = solve_hierarchical_sharded(
        canonical, live, params, mesh=make_mesh(4), initial_warp=w0
    )
    np.testing.assert_allclose(
        np.asarray(sh.warp), np.asarray(ref.warp), atol=2e-5, rtol=1e-4
    )


def test_hierarchical_sharded_2d_mesh_matches_single(rng):
    """Coarse-to-fine on the 2D voxel-block mesh (round 4): small-motion
    case where every shardable level runs as 2D blocks — parity vs the
    single-device hierarchical solve."""
    import numpy as np
    import jax.numpy as jnp

    from levelsetfusion_tpu.models import HierarchicalParams, SolverParams
    from levelsetfusion_tpu.models.hierarchical import solve_hierarchical
    from levelsetfusion_tpu.parallel.hierarchical import (
        solve_hierarchical_sharded,
    )
    from levelsetfusion_tpu.parallel.mesh import make_mesh_2d

    shape = (32, 32, 16)
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.4))
    live = jnp.asarray(np.tanh(np.roll(base, 1, axis=0) * 0.4))
    hp = HierarchicalParams(
        levels=2,
        base=SolverParams(max_iterations=8, convergence_threshold=0.0,
                          learning_rate=0.3),
    )
    mesh = make_mesh_2d((2, 2))
    res = solve_hierarchical_sharded(
        canonical, live, hp, mesh=mesh, mesh_axes=("x", "y"),
        min_live_halo=4,
    )
    ref = solve_hierarchical(canonical, live, hp)
    np.testing.assert_allclose(
        np.asarray(res.warp), np.asarray(ref.warp), rtol=2e-5, atol=2e-5
    )
    # Both levels shardable at this size/motion → integer halos recorded.
    assert res.level_halos is not None
    assert res.level_halos[-1] is not None
