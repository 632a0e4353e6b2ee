"""End-to-end tests for the single-level warp solver (BASELINE config 1:
2D depth pair → TSDF → plain GD warp solve)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.core.grid import GridSpec
from levelsetfusion_tpu.io import synthetic
from levelsetfusion_tpu.models import SolverParams, solve_single_level
from levelsetfusion_tpu.models.params import SmoothingMode
from levelsetfusion_tpu.ops.tsdf import generate_tsdf_2d


def make_pair_fields(live_shift_px=4.0, shape=(96, 48), offset=(-48, 85), vs=0.004):
    pair = synthetic.bump_wall_pair_2d(
        width=128, bump_height=0.04, bump_radius_px=20.0, live_shift_px=live_shift_px
    )
    grid = GridSpec(shape=shape, voxel_size=vs, offset=offset)
    canonical = generate_tsdf_2d(jnp.asarray(pair.canonical_depth), pair.camera, grid)
    live = generate_tsdf_2d(jnp.asarray(pair.live_depth), pair.camera, grid)
    return canonical, live, grid


def test_identical_fields_converge_immediately():
    canonical, _, _ = make_pair_fields()
    res = solve_single_level(canonical, canonical, SolverParams(max_iterations=50))
    assert int(res.iterations) <= 2
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.warp), 0.0, atol=1e-4)


def test_energy_decreases_and_alignment_improves():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(max_iterations=200, convergence_threshold=1e-3, learning_rate=1.0)
    res = solve_single_level(canonical, live, params)
    n = int(res.iterations)
    assert n > 5
    e = np.asarray(res.telemetry.data_energy)[:n]
    assert e[-1] < 0.5 * e[0], (e[0], e[-1])
    # Monotone-ish decrease: no iteration increases energy by >5%.
    assert (e[1:] <= e[:-1] * 1.05).all()

    # Warped live is closer to canonical than unwarped live.
    from levelsetfusion_tpu.ops.interpolation import warp_field

    warped = np.asarray(warp_field(live, res.warp))
    err_before = np.abs(np.asarray(live) - np.asarray(canonical)).sum()
    err_after = np.abs(warped - np.asarray(canonical)).sum()
    assert err_after < 0.6 * err_before


def test_telemetry_schema():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(max_iterations=20, learning_rate=1.0)
    res = solve_single_level(canonical, live, params)
    t = res.telemetry
    for arr in [t.data_energy, t.smoothing_energy, t.level_set_energy,
                t.max_warp_update, t.mean_warp_update]:
        assert arr.shape == (20,)
    n = int(res.iterations)
    assert (np.asarray(t.max_warp_update)[:n] > 0).all()
    assert (np.asarray(t.mean_warp_update)[:n] <= np.asarray(t.max_warp_update)[:n]).all()
    # Level-set disabled by default -> zero energies.
    np.testing.assert_allclose(np.asarray(t.level_set_energy), 0.0)


def test_killing_mode_and_level_set_run():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(
        max_iterations=30,
        learning_rate=1.0,
        smoothing_mode=SmoothingMode.KILLING,
        level_set_term_weight=0.1,
    )
    res = solve_single_level(canonical, live, params)
    n = int(res.iterations)
    e = np.asarray(res.telemetry.data_energy)[:n]
    assert e[-1] < e[0]
    assert np.asarray(res.telemetry.smoothing_energy)[:n].sum() > 0


def test_sobolev_smoothing_produces_smoother_warp():
    canonical, live, _ = make_pair_fields()
    base = SolverParams(max_iterations=40, learning_rate=1.0, smoothing_term_weight=0.0)
    plain = solve_single_level(canonical, live, base)
    sob = solve_single_level(canonical, live, base.replace(sobolev_smoothing=True))

    def roughness(w):
        w = np.asarray(w)
        return np.abs(np.diff(w, axis=0)).sum() + np.abs(np.diff(w, axis=1)).sum()

    assert roughness(sob.warp) < roughness(plain.warp)


def test_warm_start_converges_faster():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(max_iterations=200, convergence_threshold=2e-3, learning_rate=1.0)
    cold = solve_single_level(canonical, live, params)
    warm = solve_single_level(canonical, live, params, initial_warp=cold.warp)
    assert int(warm.iterations) < int(cold.iterations)


def test_adaptive_learning_rate_survives_large_rate():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(
        max_iterations=60, learning_rate=4.0, adaptive_learning_rate=True
    )
    res = solve_single_level(canonical, live, params)
    assert np.isfinite(np.asarray(res.telemetry.data_energy)).all()
    assert np.isfinite(np.asarray(res.warp)).all()
