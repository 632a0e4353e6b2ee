"""Distributed warp solve over TRUE voxel blocks: spatial axes 0 and 1
sharded over a 2D device mesh (SURVEY.md §2 parallelism table — "voxel
blocks", not slabs; the ≥80% scaling north_star needs block counts that
scale past ``shape[0] / min_halo``).

Same semantics as ``models.single_level.solve_single_level`` — the parity
tests assert it to float tolerance — with the 1D solver's halo machinery
applied along BOTH sharded axes:

- The **live** field is exchanged once per solve with a wide halo along
  axis 0 then axis 1; the sequential exchange fills the corner ghosts with
  the diagonal neighbor's data (the axis-1 exchange forwards the axis-0
  ghosts it just received).
- Per iteration the **warp** exchanges 2 ghost slices per sharded axis
  (4 ``ppermute``s), and the Sobolev filter exchanges kernel-radius ghosts
  per sharded axis. All np.gradient/Laplacian edge conventions are
  reproduced exactly at global boundaries via ``parallel.halo``'s
  axis-parametric primitives; stencil compositions (Hessian, ∇(∇·u)) track
  ghost margins per axis explicitly (the ``crop`` bookkeeping below).
- Termination and telemetry reduce over BOTH mesh axes (``psum``/``pmax``
  with a tuple of axis names) — global max-warp-update semantics identical
  to the single-device solver.

Both per-shard Pallas fast paths engage when supported (same displacement
contract as the 1D solver — stay within ``live_halo - 2`` of a block
face):

- **Warp resample**: the block's x window rides the kernel's existing
  ``x_start`` machinery (shared ``prepare_block_resample``), and the
  y-sharded axis needs NO new windowing — the kernel resamples the FULL
  y-extended block under an identity y mapping (the warp is zero-padded
  over the ghost columns) and the extra columns are cropped after; the
  only cost is a few percent of redundant compute.
- **Fused gradient+Sobolev+update**: the y-tiled kernel's ``y_lo/y_len``
  output window consumes a block extended by hx rows in x and 8 columns
  in y (sublane-aligned; the gradient only reaches 5 deep, so the outer 3
  ghost columns may hold garbage), with per-shard ``x_offset/y_offset``
  global coordinates driving the edge-convention masks. One x + one y
  warp halo exchange per iteration feeds resample + one kernel call.

Golden jnp paths otherwise; all variants parity-tested vs the
single-device solver in tests/test_parallel2d.py.

Reference anchor: BASELINE config 5; SURVEY.md §5 long-context row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from levelsetfusion_tpu.models.params import SolverParams
from levelsetfusion_tpu.models.single_level import SolveResult, SolveTelemetry
from levelsetfusion_tpu.ops import sobolev as sobolev_ops
from levelsetfusion_tpu.ops.derivatives import _diff_axis, _second_diff_axis
from levelsetfusion_tpu.ops.gradient import SmoothingMode
from levelsetfusion_tpu.ops.interpolation import sample_at
from levelsetfusion_tpu.ops.terms import TRUNCATION_EPS
from levelsetfusion_tpu.parallel.halo import (
    convolve_zero_edges,
    d_edge_fixed,
    halo_exchange,
    pmax_axis,
    psum_axis,
    second_diff,
)
from levelsetfusion_tpu.parallel.sharded import prepare_block_resample


def fused_block2d_supported(
    params: SolverParams, canonical, n0: int, n1: int, live_halo: int
) -> bool:
    """Static gate for the per-shard fused gradient+update kernel on the 2D
    mesh: the y-tiled kernel's ``y_lo``/``y_len`` window machinery consumes
    a block extended by the stencil+filter halo in x (hx) and exactly 8
    columns in y (the kernel's sublane-aligned y_lo rule; the gradient only
    reaches 5 deep, so the outer 3 ghost columns may hold garbage)."""
    if not (params.use_pallas_gradient and canonical.ndim == 3):
        return False
    if live_halo < 8:
        return False
    from levelsetfusion_tpu.ops.pallas.fused_gradient import fused_supported

    from levelsetfusion_tpu.ops.pallas.resample import k3

    hx = params.stencil_halo
    # The per-shard resample must produce hx exact ghost rows on BOTH
    # sharded axes — gate on the larger per-axis clamp.
    kk = max(k3(params.pallas_max_displacement)[:2])
    if params.use_pallas_resample and live_halo < kk + hx + 1:
        return False
    return fused_supported(
        (n0 + 2 * hx, n1 + 16, canonical.shape[2]),
        interpret=params.pallas_interpret,
        sobolev=params.sobolev_smoothing,
        x_lo=hx,
        x_len=n0,
        y_lo=8,
        y_len=n1,
        sobolev_radius=params.sobolev_radius or 3,
    )


def pallas_block2d_supported(
    params: SolverParams, canonical, live_halo: int, n1: int
) -> bool:
    """Static gate for the 2D-mesh per-shard Pallas resample: 3D volume,
    lane-width z, sublane-aligned y extents, and a live halo wide enough
    for the kernel's clamp window plus the 2 stencil ghosts."""
    from levelsetfusion_tpu.ops.pallas.resample import (
        pallas_resample_supported,
    )

    from levelsetfusion_tpu.ops.pallas.resample import k3

    kk = max(k3(params.pallas_max_displacement)[:2])
    return (
        params.use_pallas_resample
        and canonical.ndim == 3
        and live_halo >= kk + 3
        and (n1 + 2 * live_halo) % 8 == 0
        and pallas_resample_supported(canonical, params.pallas_interpret)
    )


def block2d_fast_paths(params: SolverParams, canonical, live_halo: int,
                       nd0: int, nd1: int) -> tuple:
    """(use_fused, use_pallas_resample) exactly as
    ``solve_single_level_sharded2d`` gates them (single source of truth for
    fusion's displacement-contract k_used derivation)."""
    n0 = canonical.shape[0] // nd0
    n1 = canonical.shape[1] // nd1
    lh = min(live_halo, n0, n1)
    use_fused = fused_block2d_supported(params, canonical, n0, n1, lh)
    # Round 5: the fused path resamples the INTERIOR only (ghost=0 — the
    # warped ghost shells arrive from the neighbors' interiors), so the
    # live halo only has to cover pallas_block2d_supported's clamp window;
    # the old kk + stencil_halo + 1 requirement applied to the retired
    # ghost=hx resample.
    use_pallas = pallas_block2d_supported(params, canonical, lh, n1)
    return use_fused, use_pallas


def _crop(a, g0, g1):
    """Strip ``g0``/``g1`` ghost slices from each side of axes 0/1."""
    sl = [slice(None)] * a.ndim
    if g0:
        sl[0] = slice(g0, -g0)
    if g1:
        sl[1] = slice(g1, -g1)
    return a[tuple(sl)]


def _replicate_global_ghosts(x_ext, halo, axis_name, num_devices, axis):
    """Overwrite out-of-domain ghost slices with the global edge slice."""
    idx = lax.axis_index(axis_name)
    m = x_ext.shape[axis]
    shape = [1] * x_ext.ndim
    shape[axis] = m
    rows = lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    start = lax.dynamic_slice_in_dim(x_ext, halo, 1, axis=axis)
    end = lax.dynamic_slice_in_dim(x_ext, m - halo - 1, 1, axis=axis)
    x_ext = jnp.where((idx == 0) & (rows < halo), start, x_ext)
    x_ext = jnp.where(
        (idx == num_devices - 1) & (rows >= m - halo), end, x_ext
    )
    return x_ext


def _band_mask(canonical, warped):
    return (jnp.abs(canonical) < 1.0 - TRUNCATION_EPS) | (
        jnp.abs(warped) < 1.0 - TRUNCATION_EPS
    )


@partial(
    jax.jit,
    static_argnames=("params", "mesh", "axis_names", "live_halo"),
)
def solve_single_level_sharded2d(
    canonical: jnp.ndarray,
    live: jnp.ndarray,
    params: SolverParams = SolverParams(),
    *,
    mesh: Mesh,
    axis_names: tuple = ("x", "y"),
    live_halo: int = 8,
    initial_warp: jnp.ndarray | None = None,
) -> SolveResult:
    """2D voxel-block twin of ``solve_single_level`` (see module docstring)."""
    an0, an1 = axis_names
    nd0, nd1 = mesh.shape[an0], mesh.shape[an1]
    if canonical.ndim < 3:
        raise ValueError(
            "2D-mesh block sharding applies to 3D+ volumes; 2D experiments "
            "fit one device (use the 1D sharded solver if needed)"
        )
    if canonical.shape[0] % nd0 or canonical.shape[1] % nd1:
        raise ValueError(
            f"axes 0/1 {canonical.shape[:2]} must divide over mesh {nd0}x{nd1}"
        )
    n0 = canonical.shape[0] // nd0
    n1 = canonical.shape[1] // nd1
    live_halo = min(live_halo, n0, n1)
    min_halo = 3 if params.sobolev_smoothing else 2
    if n0 < min_halo or n1 < min_halo:
        raise ValueError(
            f"local block {n0}x{n1} too small for stencil halos"
        )
    d = canonical.ndim
    if initial_warp is None:
        initial_warp = jnp.zeros(canonical.shape + (d,), canonical.dtype)

    kernel = (
        jnp.asarray(
            sobolev_ops.generate_1d_sobolev_kernel(
                params.sobolev_kernel_size, params.sobolev_strength
            )
        )
        if params.sobolev_smoothing
        else None
    )
    n_iter = params.max_iterations
    num_voxels = float(canonical.size)
    names = (an0, an1)

    def exch2(x, width, fill):
        """Sequential both-axis halo exchange (fills corners correctly)."""
        x = halo_exchange(x, width, an0, nd0, fill=fill, axis=0)
        return halo_exchange(x, width, an1, nd1, fill=fill, axis=1)

    def block_gradient(canon_blk, live_ext, warp, prepared=None,
                       reduce_energies=True):
        idx0 = lax.axis_index(an0)
        idx1 = lax.axis_index(an1)
        start0 = idx0 * n0
        start1 = idx1 * n1

        # ---- warped live on block + 2 ghosts per sharded axis ------------
        warp_ext = exch2(warp, 2, "replicate")
        if prepared is not None:
            # Pallas path: x window via x_start (as the 1D solver); full
            # y-extended extent under identity y mapping, ghosts cropped.
            from levelsetfusion_tpu.ops.pallas.resample import (
                pick_y_block,
                warp_field_pallas_prepared,
            )

            from levelsetfusion_tpu.ops.pallas.resample import k3

            k_full = params.pallas_max_displacement
            if isinstance(k_full, list):
                k_full = tuple(k_full)
            kx = k3(k_full)[0]
            stacked, flags, xe = prepared
            hd = live_halo - 2
            warp_cm = jnp.moveaxis(warp_ext, -1, 0)
            warp_cm = jnp.pad(
                warp_cm,
                ((0, 0), (0, xe - (n0 + 4)),
                 (hd, stacked.shape[2] - warp_cm.shape[2] - hd), (0, 0)),
            )
            we_full = warp_field_pallas_prepared(
                stacked,
                warp_cm,
                k_full,
                y_block=pick_y_block(warp_cm.shape[1:]),
                interpret=params.pallas_interpret,
                skip_flags=flags,
                x_start=kx,
                component_major=True,
            )
            we = we_full[: n0 + 4, hd : hd + n1 + 4]
        else:
            shape_ext = (n0 + 4, n1 + 4) + canon_blk.shape[2:]
            pos0 = (
                start0 - 2 + lax.broadcasted_iota(jnp.int32, shape_ext, 0)
            ).astype(warp.dtype)
            pos1 = (
                start1 - 2 + lax.broadcasted_iota(jnp.int32, shape_ext, 1)
            ).astype(warp.dtype)
            coords = [
                pos0 - (start0 - live_halo) + warp_ext[..., 0],
                pos1 - (start1 - live_halo) + warp_ext[..., 1],
            ]
            for ax in range(2, d):
                ident = lax.broadcasted_iota(
                    jnp.int32, shape_ext, ax
                ).astype(warp.dtype)
                coords.append(ident + warp_ext[..., ax])
            we = sample_at(live_ext, jnp.stack(coords, axis=-1))
        we = _replicate_global_ghosts(we, 2, an0, nd0, axis=0)
        we = _replicate_global_ghosts(we, 2, an1, nd1, axis=1)
        warped = _crop(we, 2, 2)

        # ---- data term ----------------------------------------------------
        # g_i on ghost margins for the Hessian composition; margins per axis
        # tracked explicitly: (a0, a1) = ghost slices remaining.
        g0_e = d_edge_fixed(we, 2, an0, nd0, axis=0)  # (1, 2)
        g1_e = d_edge_fixed(we, 2, an1, nd1, axis=1)  # (2, 1)
        g2_e = _diff_axis(we, 2)  # (2, 2)
        warped_grad = jnp.stack(
            [_crop(g0_e, 1, 2), _crop(g1_e, 2, 1), _crop(g2_e, 2, 2)],
            axis=-1,
        )

        diff = warped - canon_blk
        if params.band_union_only:
            diff = jnp.where(_band_mask(canon_blk, warped), diff, 0.0)
        total = params.data_term_weight * (diff[..., None] * warped_grad)
        e_data = params.data_term_weight * 0.5 * jnp.sum(diff * diff)

        # ---- smoothing term -------------------------------------------------
        if params.smoothing_term_weight != 0.0:
            u = [warp_ext[..., c] for c in range(d)]
            lap_parts = []
            jac_cols = []
            for c in range(d):
                l0 = second_diff(_crop(u[c], 1, 2), axis=0)
                l1 = second_diff(_crop(u[c], 2, 1), axis=1)
                lc = l0 + l1
                for ax in range(2, d):
                    lc = lc + _second_diff_axis(_crop(u[c], 2, 2), ax)
                lap_parts.append(lc)
                jc = [
                    _crop(d_edge_fixed(u[c], 2, an0, nd0, axis=0), 1, 2),
                    _crop(d_edge_fixed(u[c], 2, an1, nd1, axis=1), 2, 1),
                ] + [
                    _diff_axis(_crop(u[c], 2, 2), ax) for ax in range(2, d)
                ]
                jac_cols.append(jnp.stack(jc, axis=-1))
            lap = jnp.stack(lap_parts, axis=-1)
            jac = jnp.stack(jac_cols, axis=-2)  # (*local, c, ax)

            if params.smoothing_mode is SmoothingMode.TIKHONOV:
                g_smooth = -lap
                e_smooth = 0.5 * jnp.sum(jac * jac)
            else:
                gamma = params.rigidity_enforcement_factor
                div_e = (
                    _crop(d_edge_fixed(u[0], 2, an0, nd0, axis=0), 0, 1)
                    + _crop(d_edge_fixed(u[1], 2, an1, nd1, axis=1), 1, 0)
                )  # ghosts (1, 1)
                for ax in range(2, d):
                    div_e = div_e + _diff_axis(_crop(u[ax], 1, 1), ax)
                gdiv = jnp.stack(
                    [
                        _crop(d_edge_fixed(div_e, 1, an0, nd0, axis=0), 0, 1),
                        _crop(d_edge_fixed(div_e, 1, an1, nd1, axis=1), 1, 0),
                    ]
                    + [_diff_axis(_crop(div_e, 1, 1), ax) for ax in range(2, d)],
                    axis=-1,
                )
                g_smooth = -(1.0 + gamma) * lap - gdiv
                sym = jac + jnp.swapaxes(jac, -1, -2)
                e_smooth = 0.5 * (
                    0.5 * jnp.sum(sym * sym) + gamma * jnp.sum(jac * jac)
                )
            total = total + params.smoothing_term_weight * g_smooth
            e_smooth = params.smoothing_term_weight * e_smooth
        else:
            e_smooth = jnp.zeros((), canon_blk.dtype)

        # ---- level-set term ---------------------------------------------------
        if params.level_set_term_weight != 0.0:
            # H[i][j] = d_j(g_i); margins: g0_e (1,2), g1_e (2,1), g2_e (2,2).
            h_rows = [
                jnp.stack(
                    [
                        _crop(d_edge_fixed(g0_e, 1, an0, nd0, axis=0), 0, 2),
                        _crop(d_edge_fixed(g0_e, 2, an1, nd1, axis=1), 1, 1),
                        _crop(_diff_axis(g0_e, 2), 1, 2),
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        _crop(d_edge_fixed(g1_e, 2, an0, nd0, axis=0), 1, 1),
                        _crop(d_edge_fixed(g1_e, 1, an1, nd1, axis=1), 2, 0),
                        _crop(_diff_axis(g1_e, 2), 2, 1),
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        _crop(d_edge_fixed(g2_e, 2, an0, nd0, axis=0), 1, 2),
                        _crop(d_edge_fixed(g2_e, 2, an1, nd1, axis=1), 2, 1),
                        _crop(_diff_axis(g2_e, 2), 2, 2),
                    ],
                    axis=-1,
                ),
            ]
            hess = jnp.stack(h_rows, axis=-2)  # (*local, i, j)

            g = warped_grad
            norm = jnp.sqrt(jnp.sum(g * g, axis=-1))
            scale = (norm - 1.0) / (norm + 1e-5)
            if params.band_union_only:
                mask = _band_mask(canon_blk, warped)
                scale = jnp.where(mask, scale, 0.0)
                e_terms = jnp.where(mask, (norm - 1.0) ** 2, 0.0)
            else:
                e_terms = (norm - 1.0) ** 2
            g_ls = scale[..., None] * jnp.einsum("...ij,...j->...i", hess, g)
            total = total + params.level_set_term_weight * g_ls
            e_ls = params.level_set_term_weight * 0.5 * jnp.sum(e_terms)
        else:
            e_ls = jnp.zeros((), canon_blk.dtype)

        # ---- Sobolev filtering ------------------------------------------------
        if kernel is not None:
            total = convolve_zero_edges(total, kernel, an0, nd0, axis=0)
            total = convolve_zero_edges(total, kernel, an1, nd1, axis=1)
            for ax in range(2, d):
                total = sobolev_ops._convolve_axis(total, kernel, ax)

        if not reduce_energies:
            return total, (e_data, e_smooth, e_ls)
        energies = (
            lax.psum(e_data, names),
            lax.psum(e_smooth, names),
            lax.psum(e_ls, names),
        )
        return total, energies

    use_fused, use_pallas = block2d_fast_paths(
        params, canonical, live_halo, nd0, nd1
    )
    hx = params.stencil_halo
    # The fused path resamples the interior only (ghost=0): the warped
    # ghost shells come from the neighbors' interiors via two sequential
    # 1-scalar-channel exchanges (corner-correct), so the warp ghost
    # exchange has no consumer before the stencil kernel and can overlap
    # the resample's compute — same structure as the 1D solver.
    ghost = 0 if use_fused else 2
    k_int = max(1, params.termination_check_interval)
    n_rounds = -(-n_iter // k_int)
    n_iter = n_rounds * k_int
    taps = ()
    if use_fused and params.sobolev_smoothing:
        from levelsetfusion_tpu.ops.pallas.fused_gradient import sobolev_taps

        taps = sobolev_taps(
            params.sobolev_kernel_size, params.sobolev_strength
        )
    x_gl, y_gl = canonical.shape[0], canonical.shape[1]

    def run(canon_blk, live_blk, warp0_blk):
        live_ext = exch2(live_blk, live_halo, "truncation")
        prepared = None
        if use_pallas:
            # x-axis prep is identical to the 1D solver's; the full
            # y-extended extent passes through untouched.
            prepared = prepare_block_resample(
                live_ext, params, live_halo, n0, ghost
            )
        canon_ext = None
        x_off = y_off = None
        if use_fused:
            ce = halo_exchange(
                canon_blk, hx, an0, nd0, fill="truncation", axis=0
            )
            canon_ext = halo_exchange(
                ce, 8, an1, nd1, fill="truncation", axis=1
            )
            x_off = lax.axis_index(an0) * n0 - hx
            y_off = lax.axis_index(an1) * n1 - 8

        def _resample_interior(w_cm):
            """Warped live on the (n0, n1) interior from the LOCAL
            component-major warp — no ghost dependence."""
            if prepared is not None:
                from levelsetfusion_tpu.ops.pallas.resample import (
                    k3,
                    pick_y_block,
                    warp_field_pallas_prepared,
                )

                k_full = params.pallas_max_displacement
                if isinstance(k_full, list):
                    k_full = tuple(k_full)
                kx = k3(k_full)[0]
                stacked, flags, xe = prepared
                hd = live_halo
                wk = jnp.pad(
                    w_cm,
                    ((0, 0), (0, xe - n0),
                     (hd, stacked.shape[2] - w_cm.shape[2] - hd), (0, 0)),
                )
                out = warp_field_pallas_prepared(
                    stacked, wk, k_full,
                    y_block=pick_y_block(wk.shape[1:]),
                    interpret=params.pallas_interpret,
                    skip_flags=flags, x_start=kx, component_major=True,
                )
                return out[:n0, hd : hd + n1]
            shape_ext = (n0, n1) + canon_blk.shape[2:]
            i0 = lax.broadcasted_iota(jnp.int32, shape_ext, 0).astype(
                w_cm.dtype
            )
            i1 = lax.broadcasted_iota(jnp.int32, shape_ext, 1).astype(
                w_cm.dtype
            )
            coords = [
                i0 + live_halo + w_cm[0],
                i1 + live_halo + w_cm[1],
            ]
            for ax in range(2, d):
                ident = lax.broadcasted_iota(
                    jnp.int32, shape_ext, ax
                ).astype(w_cm.dtype)
                coords.append(ident + w_cm[ax])
            return sample_at(live_ext, jnp.stack(coords, axis=-1))

        def _fused_step2d(warp_cm, rate):
            """Overlap structure (see the 1D solver): warp ghosts first
            (no consumer before the kernel), interior resample from the
            local warp, then the warped ghost shells from the neighbors'
            interiors (sequential x-then-y exchange fills corners with the
            diagonal neighbor; global-edge fill is arbitrary — the
            kernel's offset/extent masks ignore ghost values there, an
            invariance asserted by tests/test_fused_gradient.py)."""
            from levelsetfusion_tpu.ops.gradient import SmoothingMode as SM
            from levelsetfusion_tpu.ops.pallas.fused_gradient import (
                fused_gradient_update,
            )

            w = halo_exchange(
                warp_cm, hx, an0, nd0, fill="replicate", axis=1
            )
            w = halo_exchange(w, 8, an1, nd1, fill="replicate", axis=2)
            warped_loc = _resample_interior(warp_cm)
            we = halo_exchange(
                warped_loc, hx, an0, nd0, fill="truncation", axis=0
            )
            warped_ext = halo_exchange(
                we, 8, an1, nd1, fill="truncation", axis=1
            )
            return fused_gradient_update(
                warped_ext, canon_ext, w, rate,
                w_data=params.data_term_weight,
                w_smooth=params.smoothing_term_weight,
                w_ls=params.level_set_term_weight,
                killing=params.smoothing_mode is SM.KILLING,
                gamma=params.rigidity_enforcement_factor,
                band_union=params.band_union_only,
                taps=taps,
                interpret=params.pallas_interpret,
                x_offset=x_off, x_global=x_gl, x_lo=hx, x_len=n0,
                y_offset=y_off, y_global=y_gl, y_lo=8, y_len=n1,
            )

        from levelsetfusion_tpu.models.single_level import _axis_max_abs

        zeros = jnp.zeros((n_iter,), canon_blk.dtype)
        warp0 = jnp.moveaxis(warp0_blk, -1, 0) if use_fused else warp0_blk
        init = (
            warp0,
            jnp.zeros((), jnp.int32),
            jnp.full((), jnp.inf, canon_blk.dtype),
            jnp.asarray(params.learning_rate, canon_blk.dtype),
            jnp.full((), jnp.inf, canon_blk.dtype),
            SolveTelemetry(zeros, zeros, zeros, zeros, zeros),
            # Fused path: per-axis max |u'| rides the kernel stats; seed
            # with the warm start (jnp path reduces per iteration below).
            (
                _axis_max_abs(warp0, use_fused)
                if use_fused
                else jnp.zeros((d,), canon_blk.dtype)
            ),
        )

        def cond(state):
            _, it, max_up, _, _, _, _ = state
            return (it < n_iter) & (max_up >= params.convergence_threshold)

        def _pmax2(x):
            return pmax_axis(pmax_axis(x, an0, nd0), an1, nd1)

        def _psum2(x):
            return psum_axis(psum_axis(x, an0, nd0), an1, nd1)

        def one_iteration(j, carry):
            """One iteration with NO reduction collectives (telemetry gets
            local values, reduced exactly once after the loop)."""
            warp, it, rate, tel, max_disp, _ = carry
            if use_fused:
                new_warp, stats = _fused_step2d(warp, rate)
                max_disp = jnp.maximum(max_disp, stats.max_abs_u)
                e_data = stats.data_energy
                e_smooth = stats.smoothing_energy
                e_ls = stats.level_set_energy
                max_up_l = stats.max_update
                sum_up_l = stats.sum_update
            else:
                max_disp = jnp.maximum(
                    max_disp, _axis_max_abs(warp, use_fused)
                )
                grad, (e_data, e_smooth, e_ls) = block_gradient(
                    canon_blk, live_ext, warp, prepared,
                    reduce_energies=False,
                )
                update = -rate * grad
                new_warp = warp + update
                ulen = jnp.sqrt(jnp.sum(update * update, axis=-1))
                max_up_l = jnp.max(ulen)
                sum_up_l = jnp.sum(ulen)

            tel = SolveTelemetry(
                data_energy=tel.data_energy.at[it].set(e_data),
                smoothing_energy=tel.smoothing_energy.at[it].set(e_smooth),
                level_set_energy=tel.level_set_energy.at[it].set(e_ls),
                max_warp_update=tel.max_warp_update.at[it].set(max_up_l),
                mean_warp_update=tel.mean_warp_update.at[it].set(sum_up_l),
            )
            locals_ = (e_data + e_smooth + e_ls, max_up_l)
            return (new_warp, it + 1, rate, tel, max_disp, locals_)

        def round_body(state):
            warp, it, _, rate, prev_e, tel, max_disp = state
            zero = jnp.zeros((), canon_blk.dtype)
            warp, it, rate, tel, max_disp, (e_loc, max_up_l) = lax.fori_loop(
                0, k_int, one_iteration,
                (warp, it, rate, tel, max_disp, (zero, zero)),
            )
            max_up = _pmax2(max_up_l)
            if params.adaptive_learning_rate:
                energy = _psum2(e_loc)
                rate = jnp.where(energy > prev_e, rate * 0.5, rate)
            else:
                energy = e_loc
            return (warp, it, max_up, rate, energy, tel, max_disp)

        warp, it, max_up, _, _, tel, max_disp = lax.while_loop(
            cond, round_body, init
        )
        from levelsetfusion_tpu.models.single_level import _axis_max_abs

        max_disp = _pmax2(
            jnp.maximum(max_disp, _axis_max_abs(warp, use_fused))
        )
        tel = SolveTelemetry(
            data_energy=_psum2(tel.data_energy),
            smoothing_energy=_psum2(tel.smoothing_energy),
            level_set_energy=_psum2(tel.level_set_energy),
            max_warp_update=_pmax2(tel.max_warp_update),
            mean_warp_update=_psum2(tel.mean_warp_update) / num_voxels,
        )
        if use_fused:
            warp = jnp.moveaxis(warp, 0, -1)
        return warp, it, max_up < params.convergence_threshold, tel, max_disp

    spec = P(an0, an1)
    rep = P()
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(
            spec,
            rep,
            rep,
            SolveTelemetry(rep, rep, rep, rep, rep),
            rep,
        ),
        check_vma=False,
    )
    warp, iterations, converged, telemetry, max_disp = fn(
        canonical, live, initial_warp
    )
    return SolveResult(
        warp=warp, iterations=iterations, converged=converged,
        telemetry=telemetry, max_abs_displacement=max_disp,
    )


def blend2d_resample_supported(params: SolverParams, live, live_halo: int,
                               n0: int, n1: int) -> bool:
    """Gate for the 2D-mesh per-shard blend resample (ghost=0: the fusion
    blend needs no ghost output rows, so the halo only has to cover the
    clamp window + 1 trilinear read)."""
    from levelsetfusion_tpu.ops.pallas.resample import (
        k3,
        pallas_resample_supported,
    )

    if not (params.use_pallas_resample and live.ndim == 3):
        return False
    kk = max(k3(params.pallas_max_displacement)[:2])
    return (
        live_halo >= kk + 1
        and (n1 + 2 * live_halo) % 8 == 0
        and pallas_resample_supported(live, params.pallas_interpret)
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "axis_names", "live_halo", "params"),
)
def warp_field_sharded2d(
    live: jnp.ndarray,
    warp: jnp.ndarray,
    *,
    mesh: Mesh,
    axis_names: tuple = ("x", "y"),
    live_halo: int = 8,
    params: SolverParams | None = None,
) -> jnp.ndarray:
    """Resample ``live`` at ``x + warp(x)`` with both arrays sharded as 2D
    voxel blocks — the fusion blend's gather done with one two-axis halo
    exchange (corner-correct sequential ppermute) instead of the
    partitioner-chosen all-gather (VERDICT r4 weak #3: the XLA general
    gather costs ~192 ms/frame at 128³ and would dominate 2D-mesh fusion).

    Contract: per-voxel displacements beyond ``live_halo − 1`` on either
    sharded axis read the +1 truncation fill (the fusion driver sizes the
    halo from the frame's measured max |u| and falls back to the exact
    GSPMD gather when a one-block halo cannot cover it). When ``params``
    enables the Pallas resample and the shape supports it, the gather runs
    the per-shard kernel under an identity y-window (ghost columns carry
    zero warp, cropped after).
    """
    an0, an1 = axis_names
    nd0, nd1 = mesh.shape[an0], mesh.shape[an1]
    if live.shape[0] % nd0 or live.shape[1] % nd1:
        raise ValueError(
            f"axes 0/1 {live.shape[:2]} must divide over mesh {nd0}x{nd1}"
        )
    n0 = live.shape[0] // nd0
    n1 = live.shape[1] // nd1
    lh = min(live_halo, n0, n1)
    d = live.ndim
    use_pallas = params is not None and blend2d_resample_supported(
        params, live, lh, n0, n1
    )

    def run(live_blk, warp_blk):
        live_ext = halo_exchange(
            live_blk, lh, an0, nd0, fill="truncation", axis=0
        )
        live_ext = halo_exchange(
            live_ext, lh, an1, nd1, fill="truncation", axis=1
        )
        if use_pallas:
            from levelsetfusion_tpu.ops.pallas.resample import (
                k3,
                pick_y_block,
                warp_field_pallas_prepared,
            )

            k_full = params.pallas_max_displacement
            if isinstance(k_full, list):
                k_full = tuple(k_full)
            kx = k3(k_full)[0]
            prepared = prepare_block_resample(live_ext, params, lh, n0, 0)
            stacked, flags, xe = prepared
            w_cm = jnp.moveaxis(warp_blk, -1, 0)
            wk = jnp.pad(
                w_cm,
                ((0, 0), (0, xe - n0),
                 (lh, stacked.shape[2] - w_cm.shape[2] - lh), (0, 0)),
            )
            out = warp_field_pallas_prepared(
                stacked, wk, k_full,
                y_block=pick_y_block(wk.shape[1:]),
                interpret=params.pallas_interpret,
                skip_flags=flags, x_start=kx, component_major=True,
            )
            return out[:n0, lh : lh + n1]
        shape = live_blk.shape
        i0 = lax.broadcasted_iota(jnp.int32, shape, 0).astype(
            warp_blk.dtype
        )
        i1 = lax.broadcasted_iota(jnp.int32, shape, 1).astype(
            warp_blk.dtype
        )
        coords = [i0 + lh + warp_blk[..., 0], i1 + lh + warp_blk[..., 1]]
        for ax in range(2, d):
            ident = lax.broadcasted_iota(jnp.int32, shape, ax).astype(
                warp_blk.dtype
            )
            coords.append(ident + warp_blk[..., ax])
        return sample_at(live_ext, jnp.stack(coords, axis=-1))

    spec = P(an0, an1)
    fn = shard_map(
        run, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(live, warp)
