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
        max_abs_u=jnp.max(
            jnp.abs(new_warp), axis=tuple(range(new_warp.ndim - 1))
        ),
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
    np.testing.assert_allclose(
        got_stats.max_abs_u, ref_stats.max_abs_u, rtol=1e-4, atol=1e-7
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


@pytest.mark.parametrize("w_smooth,w_ls,killing,sobolev,band_union", CASES)
def test_tiled_matches_golden(rng, w_smooth, w_ls, killing, sobolev,
                              band_union):
    """The y-tiled manual-DMA kernel == golden, with a grid that actually
    tiles both axes (tile_override forces multiple x and y blocks)."""
    shape = (16, 32, 128)
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
        force_tiled=True, tile_override=(4, 8),
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
        got_stats.max_update, ref_stats.max_update, rtol=1e-4, atol=1e-7
    )


@pytest.mark.parametrize("kernel_kind", ["whole", "tiled", "tiled_reuse"])
@pytest.mark.parametrize("shard", [0, 1, 2])  # global-first, middle, last
def test_sharded_block_windows_match_golden(rng, kernel_kind, shard):
    """Per-shard invocation (halo rows + x_lo/x_len + traced x_offset) must
    reproduce the corresponding window of the full-volume golden — with
    GARBAGE in the out-of-domain halo rows, proving the global-edge masks
    never read them."""
    X, Y, Z = 24, 16, 128
    h = 5  # Sobolev halo
    nblk = X // 3  # 3 shards of 8 rows
    canonical, warped, warp = _fields((X, Y, Z), rng)
    rate = jnp.float32(0.25)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
    taps = sobolev_taps(7, 0.1)
    kw = dict(w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
              band_union=True)

    ref_warp, _ = _golden(warped, canonical, warp, rate, kernel=kernel, **kw)

    lo = shard * nblk
    hi = lo + nblk

    def block_ext(a, fill):
        """Rows [lo-h, hi+h) with out-of-domain rows = garbage fill."""
        pad = np.full((h,) + a.shape[1:], fill, a.dtype)
        ext = np.concatenate([pad, np.asarray(a), pad], axis=0)
        return jnp.asarray(ext[lo : hi + 2 * h])  # ext index = global + h

    w_ext = block_ext(warped, 7.7)
    c_ext = block_ext(canonical, -3.3)
    u_ext = block_ext(warp, 9.9)

    got, _ = fused_gradient_update(
        w_ext, c_ext, jnp.moveaxis(u_ext, -1, 0), rate,
        taps=taps, interpret=True,
        x_offset=lo - h, x_global=X, x_lo=h, x_len=nblk,
        force_tiled=(kernel_kind == "tiled"),
        force_tiled_reuse=(kernel_kind == "tiled_reuse"),
        tile_override=(
            (4, 8) if kernel_kind == "tiled"
            else (8, 8) if kernel_kind == "tiled_reuse"
            else None
        ),
        **kw,
    )
    np.testing.assert_allclose(
        jnp.moveaxis(got, 0, -1), ref_warp[lo:hi], rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("yshard", [0, 1])
def test_2d_sharded_block_windows_match_golden(rng, yshard):
    """Tiled kernel with BOTH x and y halo windows (the 2D-mesh voxel-block
    case): per-block output == the golden's window, garbage halos masked."""
    X, Y, Z = 16, 32, 128
    hx, hy = 5, 8
    canonical, warped, warp = _fields((X, Y, Z), rng)
    rate = jnp.float32(0.25)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
    taps = sobolev_taps(7, 0.1)
    kw = dict(w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
              band_union=True)
    ref_warp, _ = _golden(warped, canonical, warp, rate, kernel=kernel, **kw)

    xlo_g, xhi_g = 8, 16  # x block rows [8, 16)
    ylo_g = yshard * 16
    yhi_g = ylo_g + 16

    def block_ext(a, fill):
        pad_x = np.full((hx,) + a.shape[1:], fill, a.dtype)
        ext = np.concatenate([pad_x, np.asarray(a), pad_x], axis=0)
        pad_y = np.full(
            (ext.shape[0], hy) + a.shape[2:], fill, a.dtype
        )
        ext = np.concatenate([pad_y, ext, pad_y], axis=1)
        return jnp.asarray(
            ext[xlo_g : xhi_g + 2 * hx, ylo_g : yhi_g + 2 * hy]
        )

    w_ext = block_ext(warped, 7.7)
    c_ext = block_ext(canonical, -3.3)
    u_ext = block_ext(warp, 9.9)

    got, _ = fused_gradient_update(
        w_ext, c_ext, jnp.moveaxis(u_ext, -1, 0), rate,
        taps=taps, interpret=True,
        x_offset=xlo_g - hx, x_global=X, x_lo=hx, x_len=xhi_g - xlo_g,
        y_offset=ylo_g - hy, y_global=Y, y_lo=hy, y_len=yhi_g - ylo_g,
        tile_override=(4, 8),
        **kw,
    )
    np.testing.assert_allclose(
        jnp.moveaxis(got, 0, -1),
        ref_warp[xlo_g:xhi_g, ylo_g:yhi_g],
        rtol=2e-5, atol=2e-5,
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


@pytest.mark.parametrize("w_smooth,w_ls,killing,sobolev,band_union", CASES)
def test_tiled_reuse_matches_golden(rng, w_smooth, w_ls, killing, sobolev,
                                    band_union):
    """The tiled term-row-reuse lowering == golden, with a grid that tiles
    both axes (x ring crosses multiple blocks, skewed edge steps fire)."""
    if not sobolev:
        pytest.skip("row reuse exists only for the Sobolev path")
    shape = (16, 32, 128)
    canonical, warped, warp = _fields(shape, rng)
    rate = jnp.float32(0.3)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
    taps = sobolev_taps(7, 0.1)

    ref_warp, ref_stats = _golden(
        warped, canonical, warp, rate,
        w_data=1.0, w_smooth=w_smooth, w_ls=w_ls, killing=killing,
        gamma=0.1, band_union=band_union, kernel=kernel,
    )
    got_warp, got_stats = fused_gradient_update(
        warped, canonical, jnp.moveaxis(warp, -1, 0), rate,
        w_data=1.0, w_smooth=w_smooth, w_ls=w_ls, killing=killing,
        gamma=0.1, band_union=band_union, taps=taps, interpret=True,
        force_tiled_reuse=True, tile_override=(8, 8),
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
        got_stats.max_update, ref_stats.max_update, rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        got_stats.max_abs_u, ref_stats.max_abs_u, rtol=1e-4, atol=1e-7
    )


def test_global_edge_ghost_values_ignored():
    """The kernel's x_offset/x_global masks synthesize the one-sided edge
    conventions internally, so ghost VALUES beyond the global domain edges
    must not affect the interior output — the invariance the sharded
    solver's overlap structure relies on (the warped-ghost exchange uses an
    arbitrary fill at global edges)."""
    import numpy as np
    import jax.numpy as jnp
    from levelsetfusion_tpu.ops.pallas.fused_gradient import (
        fused_gradient_update,
        sobolev_taps,
    )

    rng = np.random.default_rng(0)
    hx, n_local, y, z = 5, 16, 16, 128
    xt = n_local + 2 * hx
    warped = jnp.asarray(
        np.tanh(rng.standard_normal((xt, y, z)).astype(np.float32) * 0.3)
    )
    canon = jnp.asarray(
        np.tanh(rng.standard_normal((xt, y, z)).astype(np.float32) * 0.3)
    )
    warp = jnp.asarray(
        rng.standard_normal((3, xt, y, z)).astype(np.float32) * 0.1
    )
    kw = dict(
        w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
        band_union=True, taps=sobolev_taps(7, 0.1), interpret=True,
        x_global=n_local, x_lo=hx, x_len=n_local, x_offset=-hx,
    )
    out1, st1 = fused_gradient_update(warped, canon, warp, 0.1, **kw)
    garbled_warped = warped.at[:hx].set(123.0).at[-hx:].set(-77.0)
    garbled_warp = warp.at[:, :hx].set(55.0).at[:, -hx:].set(-55.0)
    out2, st2 = fused_gradient_update(
        garbled_warped, canon, garbled_warp, 0.1, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out1[:, hx:hx + n_local]),
        np.asarray(out2[:, hx:hx + n_local]),
    )
    for a, b in zip(st1, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
