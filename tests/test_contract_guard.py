"""Displacement-contract guards (VERDICT r2 weak #3): the solvers report
per-axis max |u|, and check_displacement_contract detects violations of the
Pallas-clamp and sharded-halo limits."""

import numpy as np
import jax.numpy as jnp
import pytest

from levelsetfusion_tpu.models import SolverParams, solve_single_level
from levelsetfusion_tpu.parallel import make_mesh, solve_single_level_sharded
from levelsetfusion_tpu.utils.debug import (
    DisplacementContractError,
    check_displacement_contract,
)
from tests.test_single_level import make_pair_fields


def test_max_abs_displacement_reported():
    canonical, live, _ = make_pair_fields()
    w0 = jnp.zeros(canonical.shape + (2,), canonical.dtype)
    w0 = w0.at[10, 10, 0].set(3.5).at[20, 20, 1].set(-1.25)
    params = SolverParams(max_iterations=1, convergence_threshold=0.0)
    res = solve_single_level(canonical, live, params, initial_warp=w0)
    md = np.asarray(res.max_abs_displacement)
    # Running max includes the warm start (what the first resample read).
    assert md[0] >= 3.5 and md[1] >= 1.25, md


def test_guard_detects_pallas_clamp_violation():
    canonical, live, _ = make_pair_fields()
    w0 = jnp.zeros(canonical.shape + (2,), canonical.dtype)
    w0 = w0.at[10, 10, 0].set(5.0)
    params = SolverParams(max_iterations=1, convergence_threshold=0.0)
    res = solve_single_level(canonical, live, params, initial_warp=w0)
    v = check_displacement_contract(res, pallas_max_displacement=2)
    assert len(v) == 1 and "pallas_max_displacement" in v[0]
    assert not check_displacement_contract(res, pallas_max_displacement=8)
    with pytest.raises(DisplacementContractError):
        check_displacement_contract(
            res, pallas_max_displacement=2, error=True
        )


def test_guard_detects_sharded_halo_violation():
    canonical, live, _ = make_pair_fields()
    w0 = jnp.zeros(canonical.shape + (2,), canonical.dtype)
    w0 = w0.at[40, 10, 0].set(7.0)  # exceeds live_halo=8 → limit 6
    params = SolverParams(max_iterations=1, convergence_threshold=0.0)
    res = solve_single_level_sharded(
        canonical, live, params, mesh=make_mesh(4), live_halo=8,
        initial_warp=w0,
    )
    md = np.asarray(res.max_abs_displacement)
    assert md[0] >= 7.0, md
    v = check_displacement_contract(res, live_halo=8)
    assert len(v) == 1 and "live_halo" in v[0]
    assert not check_displacement_contract(res, live_halo=16)


def test_sharded_max_disp_matches_single_device():
    canonical, live, _ = make_pair_fields()
    params = SolverParams(max_iterations=15, convergence_threshold=0.0)
    ref = solve_single_level(canonical, live, params)
    sh = solve_single_level_sharded(
        canonical, live, params, mesh=make_mesh(4)
    )
    np.testing.assert_allclose(
        np.asarray(sh.max_abs_displacement),
        np.asarray(ref.max_abs_displacement),
        atol=1e-6,
    )
