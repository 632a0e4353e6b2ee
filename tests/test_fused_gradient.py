"""Parity tests for the fused gradient+update Pallas kernel.

The kernel must reproduce, to float tolerance, the pure-jnp assembly
(ops/gradient.py term math + ops/sobolev.py filtering + the solver's update
step) including all global-edge rows — the same direct-vs-kernel parity
culture as the resample tests (SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfusion_tpu.ops import sobolev as sobolev_ops
from levelsetfusion_tpu.ops import terms
from levelsetfusion_tpu.ops.derivatives import gradient
from levelsetfusion_tpu.ops.pallas.fused_gradient import (
    FusedStats,
    fused_gradient_update,
    sobolev_taps,
)


def _golden(warped, canonical, warp, rate, *, w_data, w_smooth, w_ls,
            killing, gamma, band_union, kernel):
    """jnp reference: gradient assembly from an already-warped field."""
    wg = gradient(warped)
    g_data, e_data = terms.data_term(
        warped, canonical, wg, band_union_only=band_union
    )
    total = w_data * g_data
    e_data = w_data * e_data
    e_smooth = jnp.zeros(())
    if w_smooth:
        if killing:
            g_s, e_smooth = terms.killing_term(warp, gamma)
        else:
            g_s, e_smooth = terms.tikhonov_term(warp)
        total = total + w_smooth * g_s
        e_smooth = w_smooth * e_smooth
    e_ls = jnp.zeros(())
    if w_ls:
        g_ls, e_ls = terms.level_set_term(
            warped, wg, canonical, band_union_only=band_union
        )
        total = total + w_ls * g_ls
        e_ls = w_ls * e_ls
    if kernel is not None:
        total = sobolev_ops.convolve_with_sobolev_kernel(
            total, kernel, num_spatial_dims=3
        )
    upd = -rate * total
    new_warp = warp + upd
    ul = jnp.sqrt(jnp.sum(upd * upd, axis=-1))
    return new_warp, FusedStats(
        data_energy=e_data,
        smoothing_energy=e_smooth,
        level_set_energy=e_ls,
        sum_update=jnp.sum(ul),
        max_update=jnp.max(ul),
    )


def _fields(shape, rng, warp_scale=0.8):
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = np.tanh(base * 0.4)
    live = np.tanh(np.roll(base, 1, axis=0) * 0.4)
    warp = (rng.standard_normal(shape + (3,)) * warp_scale).astype(np.float32)
    return jnp.asarray(canonical), jnp.asarray(live), jnp.asarray(warp)


CASES = [
    # (w_smooth, w_ls, killing, sobolev, band_union)
    (0.2, 0.0, False, False, True),
    (0.2, 0.1, True, False, True),
    (0.1, 0.1, True, True, True),
    (0.2, 0.1, False, True, False),
    (0.0, 0.0, False, False, True),
]


@pytest.mark.parametrize("w_smooth,w_ls,killing,sobolev,band_union", CASES)
def test_fused_matches_golden(rng, w_smooth, w_ls, killing, sobolev, band_union):
    shape = (16, 16, 128)
    canonical, warped, warp = _fields(shape, rng)
    rate = jnp.float32(0.3)
    kernel = (
        jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
        if sobolev
        else None
    )
    taps = sobolev_taps(7, 0.1) if sobolev else ()

    ref_warp, ref_stats = _golden(
        warped, canonical, warp, rate,
        w_data=1.0, w_smooth=w_smooth, w_ls=w_ls, killing=killing,
        gamma=0.1, band_union=band_union, kernel=kernel,
    )
    got_warp, got_stats = fused_gradient_update(
        warped, canonical, jnp.moveaxis(warp, -1, 0), rate,
        w_data=1.0, w_smooth=w_smooth, w_ls=w_ls, killing=killing,
        gamma=0.1, band_union=band_union, taps=taps, interpret=True,
    )
    got_warp = jnp.moveaxis(got_warp, 0, -1)
    np.testing.assert_allclose(got_warp, ref_warp, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        got_stats.data_energy, ref_stats.data_energy, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_stats.smoothing_energy, ref_stats.smoothing_energy, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_stats.level_set_energy, ref_stats.level_set_energy, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_stats.sum_update, ref_stats.sum_update, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_stats.max_update, ref_stats.max_update, rtol=1e-4, atol=1e-7
    )


def test_fused_multi_chunk_and_multislab(rng):
    """x spans several chunks and z spans two lane slabs."""
    shape = (24, 8, 256)
    canonical, warped, warp = _fields(shape, rng)
    rate = jnp.float32(0.2)
    taps = sobolev_taps(7, 0.1)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))

    ref_warp, _ = _golden(
        warped, canonical, warp, rate,
        w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
        band_union=True, kernel=kernel,
    )
    got_warp, _ = fused_gradient_update(
        warped, canonical, jnp.moveaxis(warp, -1, 0), rate,
        w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
        band_union=True, taps=taps, interpret=True,
    )
    np.testing.assert_allclose(
        jnp.moveaxis(got_warp, 0, -1), ref_warp, rtol=2e-5, atol=2e-5
    )


def test_solver_with_fused_kernel_matches_golden(rng):
    """End-to-end: solve_single_level with use_pallas_gradient (interpret)
    equals the pure-jnp solver — warp, telemetry, iteration count."""
    from levelsetfusion_tpu.models.params import SmoothingMode, SolverParams
    from levelsetfusion_tpu.models.single_level import solve_single_level

    shape = (16, 16, 128)
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.4))
    live = jnp.asarray(np.tanh(np.roll(base, 1, axis=0) * 0.4))

    common = dict(
        max_iterations=6,
        learning_rate=0.3,
        smoothing_term_weight=0.1,
        smoothing_mode=SmoothingMode.KILLING,
        level_set_term_weight=0.1,
        sobolev_smoothing=True,
        adaptive_learning_rate=True,
        convergence_threshold=0.0,
    )
    ref = solve_single_level(canonical, live, SolverParams(**common))
    got = solve_single_level(
        canonical, live,
        SolverParams(
            **common, use_pallas_gradient=True, pallas_interpret=True
        ),
    )
    assert int(got.iterations) == int(ref.iterations)
    np.testing.assert_allclose(got.warp, ref.warp, rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(
        got.telemetry.data_energy, ref.telemetry.data_energy, rtol=2e-4
    )
    np.testing.assert_allclose(
        got.telemetry.max_warp_update,
        ref.telemetry.max_warp_update,
        rtol=2e-4, atol=1e-8,
    )
