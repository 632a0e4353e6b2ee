"""Numerics sanitizers (SURVEY.md §5 aux: the XLA analogue of the
reference-survey's race-detection row)."""

import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfusion_tpu.models.params import SolverParams
from levelsetfusion_tpu.models.single_level import solve_single_level
from levelsetfusion_tpu.utils.debug import (
    NonFiniteError,
    nan_checks,
    tap_finite,
    validate_solve,
)


def test_validate_solve_passes_on_healthy_run(rng):
    base = rng.standard_normal((8, 8)).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.3))
    live = jnp.asarray(np.tanh(np.roll(base, 1, 0) * 0.3))
    res = solve_single_level(
        canonical, live, SolverParams(max_iterations=5, learning_rate=0.3)
    )
    validate_solve(res)


def test_validate_solve_names_blowup_iteration(rng):
    base = rng.standard_normal((8, 8)).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.3))
    live = jnp.asarray(np.tanh(np.roll(base, 1, 0) * 0.3))
    # Absurd learning rate: explicit GD on the smoothing term diverges.
    res = solve_single_level(
        canonical, live,
        SolverParams(max_iterations=40, learning_rate=1e6,
                     convergence_threshold=0.0),
    )
    with pytest.raises(NonFiniteError):
        validate_solve(res)


def test_nan_checks_context_restores_flag():
    import jax

    before = jax.config.jax_debug_nans
    with nan_checks():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_tap_finite_passthrough():
    import jax

    @jax.jit
    def f(x):
        return tap_finite(x * 2.0, "probe")

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4))), 2.0)
