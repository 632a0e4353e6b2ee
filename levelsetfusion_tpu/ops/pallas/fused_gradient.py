"""Fused gradient+update Pallas TPU kernels (BASELINE north_star: "per-voxel
Python gradient assembly -> fused vectorized data+smoothing+level-set
gradient kernel").

One kernel consumes ``(warped, canonical, warp, rate)`` and produces the
*updated* warp plus per-term energies and warp-update statistics — the entire
stencil half of a solver iteration (everything after the resample) in a
single VMEM-resident pass:

    g     = w_data·∇E_data + w_smooth·∇E_smooth + w_ls·∇E_ls
    g     = Sobolev(g)                        (optional, separable 7-tap)
    u'    = u − rate·g
    stats = (E_data, E_smooth, E_ls, Σ‖δu‖, max‖δu‖)

Why a kernel: XLA runs these stencils as ~30 separate HBM round trips
(measured 0.52 ms/iteration at 128³, ~4× over the HBM roofline); fused, the
traffic is just the live inputs + the updated warp (~64 MB at 128³).

Two lowering strategies share one math implementation (``_make_derivs`` /
``_assemble_terms`` / ``_conv_x_staged`` / ``_conv_lane``):

1. ``_fused_kernel`` — **whole-volume**: the five inputs sit whole in VMEM
   (one DMA per pass) and a 1D x grid carves clamped leading-dim windows
   (vreg speed). Fastest; caps at ~128³-class volumes (5·X·Y·Z·4 B resident).
2. ``_fused_kernel_tiled`` — **y-tiled**: inputs stay in HBM (``ANY``); a
   2D (x, y) grid manually DMAs overlapping (xw, yw, Z) windows into
   double-buffered VMEM scratch (the copy for step k+1 is issued before step
   k's compute, hiding the DMA). This is the config-5 per-shard path:
   ``fused_supported((64 + 2h, 512, 512))`` holds here.

Design notes (the measured TPU rules that shape the code):

- **Whole-array VMEM inputs + in-kernel windows** (kernel 1). Per-grid-step
  ``pl.Element`` halo windows cost ~105 µs of fixed DMA overhead each
  (measured: 3 inputs × 4 steps ≈ 1.26 ms — 4× the actual math); manual
  double-buffered ``make_async_copy`` (kernel 2) avoids that fixed cost.
- **No XLA pre-padding.** Edge handling is mask-based (one-sided
  difference forms at global edges), so the inputs are consumed as-is —
  padding cost ~83 MB/iteration of pure HBM traffic in the padded design.
- **Few scalar→vector mixes per block.** Any vector op mixing in a
  dynamic scalar costs ~7.6 µs (KERNEL_NOTES.md). Global-row vectors and
  their end-anchored twins are built once per axis; every edge mask is
  then vector-vs-constant.
- **np.gradient / Laplacian edge conventions** (the framework's pinned
  numerics, ops/derivatives.py) are reproduced with masked selects; the
  one-sided forms compose correctly in-register (Hessian, ∇(∇·u)) without
  ghost rows.
- **Axis shifts**: x (leading dim) / y (sublane) / z (lane) neighbor access
  is ``jnp.roll`` with static shifts; wrap garbage lands outside the
  validity slack (h rows each side) or is masked (Sobolev convs).
- **Warp is component-major** ``(3, x, y, z)`` in and out — a trailing
  3-channel dim lane-pads 3→128 in VMEM (42× DMA inflation, measured).
- **Scalars ride scalar-prefetch**; energies/stats accumulate in an SMEM
  output across the (sequential) grid steps.
- **DMA window alignment**: y window offsets are kept multiples of 8
  (sublane) by using an 8-row y halo; x offsets ride the leading dim
  (arbitrary); z is always full-width.

Sharded use (parallel/sharded.py, parallel/schur.py, parallel/sharded2d.py):
inputs carry halo rows, ``x_lo``/``x_len`` (and ``y_lo``/``y_len``) select
the block interior, ``x_offset``/``y_offset`` give input row 0's global
coordinate (traced — they differ per shard under shard_map), and the
global-edge masks fire only at mesh ends. Contract: ``x_lo == 0`` or
``x_lo >= h`` with ``h`` trailing halo rows; ``y_lo == 0`` or a multiple of
8 that is >= 8, with 8 trailing halo rows. ``conv_local_x`` switches the
Sobolev x-conv's zero boundary from the global domain edge to the block
interior edge — the Schur solver's block-local filtering convention.

Parity: tests/test_fused_gradient.py asserts interpret-mode equality of both
kernels with the pure-jnp assembly (ops/gradient.py + ops/sobolev.py + the
update step) to float tolerance, including all global-edge rows.

Reference anchor: SURVEY.md §2.4–§2.7, §3.1 hot loop #2 (file:line citations
into /root/reference are impossible — the mount is empty; see SURVEY.md §0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TRUNC_EPS = 1e-5  # terms.TRUNCATION_EPS
_LS_EPS = 1e-5
_YH = 8  # y halo of the tiled kernel: >= max stencil radius 5, sublane-sized


class FusedStats(NamedTuple):
    data_energy: jnp.ndarray
    smoothing_energy: jnp.ndarray
    level_set_energy: jnp.ndarray
    sum_update: jnp.ndarray
    max_update: jnp.ndarray
    # Per-component max |u'| of the UPDATED warp over the output window —
    # the displacement-contract observable, computed in-kernel (the data is
    # already in VMEM; the solver loops previously paid three whole-warp
    # HBM reductions per iteration for this).
    max_abs_u: jnp.ndarray  # (3,)


def _roll(a, s, axis):
    """value[i] = a[i + s] along ``axis`` (wraps; wrap rows land outside the
    validity slack or are masked)."""
    return jnp.roll(a, -s, axis=axis)


def _make_derivs(is0, isn, y_first, y_last, z_first, z_last):
    """np.gradient-convention first derivatives + replicated-edge Laplacian.

    The edge predicates are *global-coordinate* masks (vectors broadcast over
    the window); one-sided forms at global edges never touch the wrapped
    operand, so the stencils compose (Hessian, ∇(∇·u)) without ghost rows.
    Shared by the whole-volume and y-tiled kernels — the masks differ, the
    math must not.
    """

    def d0(a):
        p, m = _roll(a, 1, 0), _roll(a, -1, 0)
        return jnp.where(is0, p - a, jnp.where(isn, a - m, 0.5 * (p - m)))

    def d1(a):
        p, m = _roll(a, 1, 1), _roll(a, -1, 1)
        return jnp.where(y_first, p - a, jnp.where(y_last, a - m, 0.5 * (p - m)))

    def d2(a):
        p, m = _roll(a, 1, 2), _roll(a, -1, 2)
        return jnp.where(z_first, p - a, jnp.where(z_last, a - m, 0.5 * (p - m)))

    def lap3(a):
        """1-(-2)-1 per axis with replicated edges: ghost == edge row, so the
        edge value is (neighbor − self)."""
        p, m = _roll(a, 1, 0), _roll(a, -1, 0)
        out = jnp.where(is0, p - a, jnp.where(isn, m - a, p + m - 2.0 * a))
        p, m = _roll(a, 1, 1), _roll(a, -1, 1)
        out = out + jnp.where(y_first, p - a, jnp.where(y_last, m - a, p + m - 2.0 * a))
        p, m = _roll(a, 1, 2), _roll(a, -1, 2)
        out = out + jnp.where(z_first, p - a, jnp.where(z_last, m - a, p + m - 2.0 * a))
        return out

    return (d0, d1, d2), lap3


def _assemble_terms(
    w, c, u, dd, lap3, isum, *,
    w_data, w_smooth, w_ls, killing, gamma, band_union,
):
    """Data + smoothing + level-set gradients and (interior-masked) energies.

    Pure in-register math on an already-windowed (xw, Y', Z) view; identical
    between the whole-volume and y-tiled kernels.  Energy squares accumulate
    into arrays first (one masked reduction each — a broadcast select with a
    leading-dim predicate costs ~14 µs, so ``isum`` calls are rationed).
    Returns ``(total[3], e_data, e_smooth, e_ls)``.
    """
    d0, d1, d2 = dd

    # --- data term ---------------------------------------------------------
    g_w = [d0(w), d1(w), d2(w)]  # ∇Φ_w, np.gradient convention
    diff = w - c
    if band_union:
        mask = (jnp.abs(c) < 1.0 - _TRUNC_EPS) | (jnp.abs(w) < 1.0 - _TRUNC_EPS)
        diff = jnp.where(mask, diff, 0.0)
    total = [w_data * diff * g_w[k] for k in range(3)]

    # --- smoothing term ----------------------------------------------------
    e_smooth = jnp.zeros((), jnp.float32)
    if w_smooth != 0.0:
        # Jacobian J[c][d] = d_d(u_c), consumed PAIRWISE so at most two
        # derivative arrays are live at a time (materializing all 9 at once
        # spilled scoped VMEM and cost ~0.6 ms/call at 128³ — measured,
        # experiments/fused_ablation.py). The symmetric-part energy uses
        # ‖J+Jᵀ‖² = 2‖J‖² + 2·Σ_ij J_ij·J_ji instead of 9 explicit squares.
        diag = [dd[k](u[k]) for k in range(3)]
        sq_jac = diag[0] * diag[0] + diag[1] * diag[1] + diag[2] * diag[2]
        cross = sq_jac  # Σ_ij J_ij·J_ji starts with the diagonal squares
        for ci, di in ((0, 1), (0, 2), (1, 2)):
            a = dd[di](u[ci])
            b = dd[ci](u[di])
            sq_jac = sq_jac + a * a + b * b
            if killing:
                cross = cross + 2.0 * (a * b)
        if killing:
            div = diag[0] + diag[1] + diag[2]
            gdiv = [d0(div), d1(div), d2(div)]
            for k in range(3):
                total[k] = total[k] + w_smooth * (
                    -(1.0 + gamma) * lap3(u[k]) - gdiv[k]
                )
            # ½·isum(sq_sym) = isum(sq_jac) + isum(cross), folded into one
            # masked reduction.
            e_smooth = w_smooth * 0.5 * isum(
                (1.0 + gamma) * sq_jac + cross
            )
        else:
            for k in range(3):
                total[k] = total[k] + w_smooth * (-lap3(u[k]))
            e_smooth = w_smooth * 0.5 * isum(sq_jac)

    # --- level-set term ----------------------------------------------------
    e_ls = jnp.zeros((), jnp.float32)
    if w_ls != 0.0:
        norm = jnp.sqrt(g_w[0] * g_w[0] + g_w[1] * g_w[1] + g_w[2] * g_w[2])
        scale = (norm - 1.0) / (norm + _LS_EPS)
        if band_union:
            scale = jnp.where(mask, scale, 0.0)
            e_terms = jnp.where(mask, (norm - 1.0) ** 2, 0.0)
        else:
            e_terms = (norm - 1.0) ** 2
        for gi in range(3):
            # Row gi of the Hessian dotted with ∇Φ_w: Σ_j d_j(g_gi)·g_j.
            hg = jnp.zeros_like(w)
            for j in range(3):
                hg = hg + dd[j](g_w[gi]) * g_w[j]
            total[gi] = total[gi] + w_ls * scale * hg
        e_ls = w_ls * 0.5 * isum(e_terms)

    e_data = w_data * 0.5 * isum(diff * diff)
    return total, e_data, e_smooth, e_ls


def _conv_x_staged(a, conv_ref, xw, taps, row_valid=None, need_mask=None):
    """Separable x-conv via physical zero borders in a VMEM scratch + static
    leading-dim slices: no selects (a broadcast select with an (xw,1,1)
    predicate costs ~14 µs — measured — and leading-dim slices of refs are
    vreg-speed). The clamped window makes window edge == array edge exactly
    when the zero padding must be visible (first/last block of an unsharded
    volume), so the border is exact there and unread everywhere else (conv
    reads stay in the validity slack).

    ``row_valid``/``need_mask``: for sharded blocks whose window contains
    rows outside the conv's zero boundary (global-edge halo fill, or — under
    ``conv_local_x`` — the halo itself), re-stage those rows as zeros. The
    masked write runs under ``pl.when(need_mask)`` so interior blocks pay
    nothing.
    """
    k = len(taps)
    r = k // 2
    conv_ref[:r] = jnp.zeros((r,) + a.shape[1:], a.dtype)
    conv_ref[r : r + xw] = a
    conv_ref[r + xw :] = jnp.zeros((r,) + a.shape[1:], a.dtype)
    if row_valid is not None:

        @pl.when(need_mask)
        def _():
            conv_ref[r : r + xw] = jnp.where(row_valid, a, 0.0)

    out = None
    for t in range(k):
        term = taps[k - 1 - t] * conv_ref[t : t + xw]
        out = term if out is None else out + term
    return out


def _conv_lane(a, axis, vec, vec_end, taps):
    """y/z separable conv with zero padding at *global* edges via masked
    sublane/lane rolls: (1,Y,1)/(1,1,Z) predicates vectorize cheaply (unlike
    leading-dim ones). ``vec`` holds global coordinates along ``axis`` and
    ``vec_end`` their end-anchored twin (0 at the global last slice), so
    every mask is a vector-vs-constant compare and windowed kernels mask
    out-of-domain reads."""
    r = len(taps) // 2
    out = taps[r] * a
    for s in range(1, r + 1):
        ok_p = vec_end <= -s  # read row's global coord <= global last
        ok_m = vec >= s  # read row's global coord >= 0
        out = out + taps[r - s] * jnp.where(ok_p, _roll(a, s, axis), 0.0)
        out = out + taps[r + s] * jnp.where(ok_m, _roll(a, -s, axis), 0.0)
    return out


def _fused_kernel(
    meta_ref,  # scalar-prefetch int32 (4,): [x_offset, xg-1, y_offset, yg-1]
    rate_ref,  # scalar-prefetch f32  (1,): learning rate
    warped_ref,  # (XL, Y, Z)  warped-live, whole array in VMEM
    canon_ref,  # (XL, Y, Z)  canonical, whole array in VMEM
    warp_ref,  # (3, XL, Y, Z) component-major warp, whole array in VMEM
    out_ref,  # (3, xb, Y, Z) updated warp for this block
    stats_ref,  # SMEM (8,) accumulated across grid steps
    scratch_ref,  # VMEM (xw, Y, Z) staging for the interior output slice
    conv_ref=None,  # VMEM (xw+2r, Y, Z) zero-bordered x-conv staging (taps)
    *,
    xb: int,
    h: int,
    x_lo: int,
    x_len: int,
    w_data: float,
    w_smooth: float,
    w_ls: float,
    killing: bool,
    gamma: float,
    band_union: bool,
    taps: tuple,
    conv_local_x: bool = False,
):
    i = pl.program_id(0)
    xl = warped_ref.shape[0]
    xw = min(xb + 2 * h, xl)
    ysz = warped_ref.shape[1]
    zsz = warped_ref.shape[2]

    # Clamped window: off ∈ [0, xl − xw]; this block's output rows sit at
    # window rows [sl_start, sl_start + xb).
    off = jnp.clip(x_lo + i * xb - h, 0, xl - xw)
    sl_start = x_lo + i * xb - off

    # --- global row coordinates: the few scalar→vector mixes in the body ---
    rows = jax.lax.broadcasted_iota(jnp.int32, (xw, 1, 1), 0)
    brow = rows + off  # input-array row of each window row
    grow = brow + meta_ref[0]  # global row of each window row
    gend = grow - meta_ref[1]  # 0 at the global last row
    is0 = grow == 0
    isn = gend == 0
    # This block's output rows as a window mask (Mosaic cannot lower
    # dynamic_slice on values, so interior reductions are masked instead).
    msk = (rows >= sl_start) & (rows < sl_start + xb)

    def isum(a):
        return jnp.sum(jnp.where(msk, a, 0.0))

    yv = jax.lax.broadcasted_iota(jnp.int32, (1, ysz, 1), 1)
    zv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, zsz), 2)
    y_first, y_last = yv == 0, yv == ysz - 1
    z_first, z_last = zv == 0, zv == zsz - 1

    dd, lap3 = _make_derivs(is0, isn, y_first, y_last, z_first, z_last)

    w = warped_ref[pl.ds(off, xw)]
    c = canon_ref[pl.ds(off, xw)]
    u = [warp_ref[k, pl.ds(off, xw)] for k in range(3)]

    total, e_data, e_smooth, e_ls = _assemble_terms(
        w, c, u, dd, lap3, isum,
        w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
        killing=killing, gamma=gamma, band_union=band_union,
    )

    # --- Sobolev filter (separable, zero padding at global/block edges) ----
    if taps:
        if conv_local_x:
            # Block-local zero boundary (Schur): rows outside the block
            # interior are zeroed before the x-conv.
            row_valid = (brow >= x_lo) & (brow < x_lo + x_len)
            need_mask = (off < x_lo) | (off + xw > x_lo + x_len)
        else:
            # Global zero boundary: only fires when the window contains
            # out-of-domain halo rows (global-edge shards).
            row_valid = (grow >= 0) & (gend <= 0)
            need_mask = (off + meta_ref[0] < 0) | (
                off + meta_ref[0] + xw - 1 > meta_ref[1]
            )
        yve = yv - (ysz - 1)
        zve = zv - (zsz - 1)
        for kk in range(3):
            a = _conv_x_staged(
                total[kk], conv_ref, xw, taps, row_valid, need_mask
            )
            a = _conv_lane(a, 1, yv, yve, taps)
            total[kk] = _conv_lane(a, 2, zv, zve, taps)

    # --- update + stats -----------------------------------------------------
    # The interior output slice goes value → scratch ref → dynamic ref slice
    # (Mosaic lowers pl.ds on refs but not dynamic_slice on values).
    neg_rate = -rate_ref[0]
    upd = [neg_rate * total[k] for k in range(3)]
    mxu = []
    for k in range(3):
        new_u = u[k] + upd[k]
        scratch_ref[:] = new_u
        out_ref[k] = scratch_ref[pl.ds(sl_start, xb)]
        mxu.append(jnp.max(jnp.where(msk, jnp.abs(new_u), 0.0)))
    ul = jnp.sqrt(upd[0] * upd[0] + upd[1] * upd[1] + upd[2] * upd[2])
    ul = jnp.where(msk, ul, 0.0)
    sum_ul = jnp.sum(ul)
    max_ul = jnp.max(ul)

    # SMEM accumulation across the sequential grid.
    first = i == 0
    stats_ref[0] = jnp.where(first, e_data, stats_ref[0] + e_data)
    stats_ref[1] = jnp.where(first, e_smooth, stats_ref[1] + e_smooth)
    stats_ref[2] = jnp.where(first, e_ls, stats_ref[2] + e_ls)
    stats_ref[3] = jnp.where(first, sum_ul, stats_ref[3] + sum_ul)
    stats_ref[4] = jnp.where(first, max_ul, jnp.maximum(stats_ref[4], max_ul))
    for k in range(3):
        stats_ref[5 + k] = jnp.where(
            first, mxu[k], jnp.maximum(stats_ref[5 + k], mxu[k])
        )


def _fused_kernel_tiled(
    meta_ref,  # scalar-prefetch int32 (4,): [x_offset, xg-1, y_offset, yg-1]
    rate_ref,  # scalar-prefetch f32  (1,)
    warped_hbm,  # (XL, YL, Z) in HBM/ANY
    canon_hbm,  # (XL, YL, Z) in HBM/ANY
    warp_hbm,  # (3, XL, YL, Z) in HBM/ANY
    out_ref,  # (3, xb, yb, Z) updated-warp block
    stats_ref,  # SMEM (8,)
    wbuf,  # VMEM (2, xw, yw, Z) double-buffered warped window
    cbuf,  # VMEM (2, xw, yw, Z) canonical window
    ubuf,  # VMEM (2, 3, xw, yw, Z) warp window
    stage_ref,  # VMEM (xw, yw, Z) output staging
    sems,  # DMA semaphores (2, 5)
    conv_ref=None,  # VMEM (xw+2r, yw, Z), present iff taps
    *,
    xb: int,
    yb: int,
    h: int,
    x_lo: int,
    x_len: int,
    y_lo: int,
    w_data: float,
    w_smooth: float,
    w_ls: float,
    killing: bool,
    gamma: float,
    band_union: bool,
    taps: tuple,
    conv_local_x: bool = False,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ny = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ny
    k_lin = i * ny + j

    xl, yl, zsz = warped_hbm.shape
    xw = min(xb + 2 * h, xl)
    yw = min(yb + 2 * _YH, yl)

    def offs(lin):
        ii = lin // ny
        jj = lin - ii * ny
        ox = jnp.clip(x_lo + ii * xb - h, 0, xl - xw)
        # y_lo, yb, _YH, yl, yw are all multiples of 8 (gated in
        # fused_supported), so oy is too — but Mosaic cannot prove it
        # through the clip; the hint keeps the sublane-dim slices legal.
        oy = pl.multiple_of(
            jnp.clip(y_lo + jj * yb - _YH, 0, yl - yw), 8
        )
        return ox, oy

    def dmas(lin, slot):
        ox, oy = offs(lin)
        ds = [
            pltpu.make_async_copy(
                warped_hbm.at[pl.ds(ox, xw), pl.ds(oy, yw), :],
                wbuf.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                canon_hbm.at[pl.ds(ox, xw), pl.ds(oy, yw), :],
                cbuf.at[slot], sems.at[slot, 1],
            ),
        ]
        for c in range(3):
            ds.append(
                pltpu.make_async_copy(
                    warp_hbm.at[c, pl.ds(ox, xw), pl.ds(oy, yw), :],
                    ubuf.at[slot, c], sems.at[slot, 2 + c],
                )
            )
        return ds

    slot = jax.lax.rem(k_lin, 2)

    @pl.when(k_lin == 0)
    def _():
        for dma in dmas(k_lin, slot):
            dma.start()

    # Issue the next window's copies before this step's compute (the DMA for
    # step k was issued at step k-1): the copy rides under the math.
    @pl.when(k_lin + 1 < nsteps)
    def _():
        for dma in dmas(k_lin + 1, jax.lax.rem(k_lin + 1, 2)):
            dma.start()

    for dma in dmas(k_lin, slot):
        dma.wait()

    ox, oy = offs(k_lin)
    slx = x_lo + i * xb - ox
    sly = pl.multiple_of(y_lo + j * yb - oy, 8)

    # --- coordinate vectors (few scalar→vector mixes, see module doc) ------
    rows = jax.lax.broadcasted_iota(jnp.int32, (xw, 1, 1), 0)
    brow = rows + ox
    grow = brow + meta_ref[0]
    gend = grow - meta_ref[1]
    is0 = grow == 0
    isn = gend == 0
    yrows = jax.lax.broadcasted_iota(jnp.int32, (1, yw, 1), 1)
    gy = yrows + (oy + meta_ref[2])
    gy_end = gy - meta_ref[3]
    y_first = gy == 0
    y_last = gy_end == 0
    zv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, zsz), 2)
    z_first, z_last = zv == 0, zv == zsz - 1
    zve = zv - (zsz - 1)

    msk = (
        (rows >= slx) & (rows < slx + xb) & (yrows >= sly) & (yrows < sly + yb)
    )

    def isum(a):
        return jnp.sum(jnp.where(msk, a, 0.0))

    dd, lap3 = _make_derivs(is0, isn, y_first, y_last, z_first, z_last)

    w = wbuf[slot]
    c = cbuf[slot]
    u = [ubuf[slot, cc] for cc in range(3)]

    total, e_data, e_smooth, e_ls = _assemble_terms(
        w, c, u, dd, lap3, isum,
        w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
        killing=killing, gamma=gamma, band_union=band_union,
    )

    if taps:
        if conv_local_x:
            row_valid = (brow >= x_lo) & (brow < x_lo + x_len)
            need_mask = (ox < x_lo) | (ox + xw > x_lo + x_len)
        else:
            row_valid = (grow >= 0) & (gend <= 0)
            need_mask = (ox + meta_ref[0] < 0) | (
                ox + meta_ref[0] + xw - 1 > meta_ref[1]
            )
        for kk in range(3):
            a = _conv_x_staged(
                total[kk], conv_ref, xw, taps, row_valid, need_mask
            )
            a = _conv_lane(a, 1, gy, gy_end, taps)
            total[kk] = _conv_lane(a, 2, zv, zve, taps)

    neg_rate = -rate_ref[0]
    upd = [neg_rate * total[k] for k in range(3)]
    mxu = []
    for k in range(3):
        new_u = u[k] + upd[k]
        stage_ref[:] = new_u
        out_ref[k] = stage_ref[pl.ds(slx, xb), pl.ds(sly, yb), :]
        mxu.append(jnp.max(jnp.where(msk, jnp.abs(new_u), 0.0)))
    ul = jnp.sqrt(upd[0] * upd[0] + upd[1] * upd[1] + upd[2] * upd[2])
    ul = jnp.where(msk, ul, 0.0)
    sum_ul = jnp.sum(ul)
    max_ul = jnp.max(ul)

    first = k_lin == 0
    stats_ref[0] = jnp.where(first, e_data, stats_ref[0] + e_data)
    stats_ref[1] = jnp.where(first, e_smooth, stats_ref[1] + e_smooth)
    stats_ref[2] = jnp.where(first, e_ls, stats_ref[2] + e_ls)
    stats_ref[3] = jnp.where(first, sum_ul, stats_ref[3] + sum_ul)
    stats_ref[4] = jnp.where(first, max_ul, jnp.maximum(stats_ref[4], max_ul))
    for k in range(3):
        stats_ref[5 + k] = jnp.where(
            first, mxu[k], jnp.maximum(stats_ref[5 + k], mxu[k])
        )


def _fused_kernel_reuse(
    meta_ref,  # scalar-prefetch int32 (4,): [x_offset, xg-1, y_offset, yg-1]
    rate_ref,  # scalar-prefetch f32  (1,)
    warped_ref,  # (XL, Y, Z)  whole array in VMEM
    canon_ref,  # (XL, Y, Z)
    warp_ref,  # (3, XL, Y, Z)
    out_ref,  # (3, xb, Y, Z) updated warp for block i-2 (skewed)
    stats_ref,  # SMEM (8,)
    stage_ref,  # VMEM (xw', Y, Z) term staging (window extent)
    ring_ref,  # VMEM (3, 3*xb, Y, Z) persistent term-row ring
    conv_ref,  # VMEM (xb + 2r, Y, Z) x-conv input staging
    *,
    xb: int,
    x_lo: int,
    x_len: int,
    w_data: float,
    w_smooth: float,
    w_ls: float,
    killing: bool,
    gamma: float,
    band_union: bool,
    taps: tuple,
    conv_local_x: bool = False,
):
    """Whole-volume kernel with Sobolev TERM-ROW REUSE (VERDICT r3 weak #4).

    The plain kernel computes terms on ``xb + 2h`` window rows per step and
    keeps only ``xb`` — at xb=16, h=5 that is 1.63× redundant term/conv
    compute. Here term x-blocks are OUTPUT-ALIGNED (block ``b`` covers
    input rows ``[x_lo + b·xb, x_lo + (b+1)·xb)``) and each is computed
    exactly once into a persistent 3-block VMEM ring. The grid runs
    ``n + 2`` skewed steps:

      step 0      computes the LEFT EDGE TAIL — the ``r`` term rows below
                  the first output block (halo rows, or exact zeros past
                  the conv boundary), with *static* window offsets;
      step i      (1 ≤ i ≤ n) computes term block ``i−1``;
      step n+1    computes the RIGHT edge tail (``r`` rows above the last
                  output block, static offsets);
      steps i ≥ 2 ALSO output block ``j = i−2``: its x-conv reads ring
                  rows ``[o_j − r, o_j + xb + r)`` = last ``r`` of block
                  ``j−1`` + block ``j`` + first ``r`` of block ``j+1`` —
                  all already in the ring.

    Conv zero boundaries are baked into the ring at write time, so the
    conv is borderless static slices. Exactness contract unchanged —
    parity-tested against the jnp assembly like the other two lowerings.
    Requires ``taps`` and ``xb ≥ 2r``.
    """
    i = pl.program_id(0)
    xl = warped_ref.shape[0]
    ysz = warped_ref.shape[1]
    zsz = warped_ref.shape[2]
    r = len(taps) // 2
    xw = min(xb + 4, xl)  # term block + stencil radius 2 each side
    kt = len(taps)

    # ---- window anchor ------------------------------------------------------
    # Interior steps: block b = i−1 starts at t0 = x_lo + (i−1)·xb ≥ 0.
    # Edge steps use STATIC anchors so every slice offset stays legal:
    # step 0 anchors at the r rows below x_lo, step n+1 at the r rows above
    # x_lo + x_len.  (Python ints — resolved at trace time.)
    t0_i = x_lo + (i - 1) * xb
    off_lo = max(0, min(x_lo - r - 2, xl - xw))
    ts_lo = min(max(x_lo - r - off_lo, 0), xw - r)
    t0_hi = x_lo + x_len
    off_hi = max(0, min(t0_hi - 2, xl - xw))
    ts_hi = min(max(t0_hi - off_hi, 0), xw - r)
    n_blocks = x_len // xb
    is_lo = i == 0
    is_hi = i == n_blocks + 1
    edge = is_lo | is_hi
    off = jnp.where(
        is_lo, off_lo,
        jnp.where(is_hi, off_hi, jnp.clip(t0_i - 2, 0, xl - xw)),
    )
    ts = t0_i - off  # interior steps only; ∈ [0, xw − xb] there

    rows = jax.lax.broadcasted_iota(jnp.int32, (xw, 1, 1), 0)
    brow = rows + off
    grow = brow + meta_ref[0]
    gend = grow - meta_ref[1]
    is0 = grow == 0
    isn = gend == 0
    # Energies: interior rows only; each lies in exactly one interior term
    # block, and the edge steps contribute nothing (mask empty there).
    msk = (
        (rows >= ts) & (rows < ts + xb)
        & (brow >= x_lo) & (brow < x_lo + x_len)
        & jnp.logical_not(edge)
    )

    def isum(a):
        return jnp.sum(jnp.where(msk, a, 0.0))

    yv = jax.lax.broadcasted_iota(jnp.int32, (1, ysz, 1), 1)
    zv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, zsz), 2)
    gy = yv + meta_ref[2]
    gy_end = gy - meta_ref[3]
    y_first, y_last = gy == 0, gy_end == 0
    z_first, z_last = zv == 0, zv == zsz - 1
    zve = zv - (zsz - 1)

    dd, lap3 = _make_derivs(is0, isn, y_first, y_last, z_first, z_last)

    w = warped_ref[pl.ds(off, xw)]
    c = canon_ref[pl.ds(off, xw)]
    u = [warp_ref[k, pl.ds(off, xw)] for k in range(3)]

    total, e_data, e_smooth, e_ls = _assemble_terms(
        w, c, u, dd, lap3, isum,
        w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
        killing=killing, gamma=gamma, band_union=band_union,
    )

    # ---- ring write ---------------------------------------------------------
    # Block b lives at slot rem(b's compute step, 3)·xb.  Conv-boundary
    # zeros are stored, not masked at read: rows past the global domain
    # (or, under conv_local_x, past the block interior) write 0.
    slot = jax.lax.rem(i, 3) * xb

    @pl.when(jnp.logical_not(edge))
    def _():
        if conv_local_x:
            lo_b, hi_b = x_lo, x_lo + x_len - 1
            need = (t0_i < lo_b) | (t0_i + xb - 1 > hi_b)
            vrow = (brow >= lo_b) & (brow <= hi_b)
        else:
            need = (t0_i + meta_ref[0] < 0) | (
                t0_i + xb - 1 + meta_ref[0] > meta_ref[1]
            )
            vrow = (grow >= 0) & (gend <= 0)
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, pl.ds(slot, xb)] = stage_ref[pl.ds(ts, xb)]

        @pl.when(need)
        def _():
            for k in range(3):
                stage_ref[:] = jnp.where(vrow, total[k], 0.0)
                ring_ref[k, pl.ds(slot, xb)] = stage_ref[pl.ds(ts, xb)]

    # Edge tails: r rows each, masked by the rows' own global coordinates
    # (mask vectors are independent of the possibly-clamped load window, so
    # fully-out-of-domain tails store zeros regardless of window content).
    @pl.when(is_lo)
    def _():
        tail = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        trow = tail + (x_lo - r)  # input-row coords of the tail rows
        if conv_local_x:
            vtail = jnp.zeros((r, 1, 1), jnp.bool_)  # below block interior
        else:
            tg = trow + meta_ref[0]
            vtail = (tg >= 0) & (tg <= meta_ref[1])
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, xb - r : xb] = jnp.where(
                vtail, stage_ref[ts_lo : ts_lo + r], 0.0
            )

    @pl.when(is_hi)
    def _():
        tail = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        trow = tail + t0_hi
        if conv_local_x:
            vtail = jnp.zeros((r, 1, 1), jnp.bool_)  # above block interior
        else:
            tg = trow + meta_ref[0]
            vtail = (tg >= 0) & (tg <= meta_ref[1])
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, pl.ds(slot, r)] = jnp.where(
                vtail, stage_ref[ts_hi : ts_hi + r], 0.0
            )

    # ---- output phase: block j = i−2 ---------------------------------------
    @pl.when(i > 1)
    def _():
        j = i - 2
        o_j = x_lo + j * xb
        # Block b was computed at step b+1 → slot rem(b+1, 3).
        slot_l = jax.lax.rem(i - 2, 3) * xb  # block j−1 (or the edge tail)
        slot_m = jax.lax.rem(i - 1, 3) * xb  # block j
        neg_rate = -rate_ref[0]
        upds = []
        for k in range(3):
            conv_ref[:r] = ring_ref[k, pl.ds(slot_l + xb - r, r)]
            conv_ref[r : r + xb] = ring_ref[k, pl.ds(slot_m, xb)]
            conv_ref[r + xb :] = ring_ref[k, pl.ds(slot, r)]
            a = None
            for t in range(kt):
                term = taps[kt - 1 - t] * conv_ref[t : t + xb]
                a = term if a is None else a + term
            a = _conv_lane(a, 1, gy, gy_end, taps)
            a = _conv_lane(a, 2, zv, zve, taps)
            upd = neg_rate * a
            upds.append(upd)
            new_u = warp_ref[k, pl.ds(o_j, xb)] + upd
            out_ref[k] = new_u
            mxu = jnp.max(jnp.abs(new_u))  # output rows are all interior
            stats_ref[5 + k] = jnp.where(
                i == 2, mxu, jnp.maximum(stats_ref[5 + k], mxu)
            )
        ul = jnp.sqrt(
            upds[0] * upds[0] + upds[1] * upds[1] + upds[2] * upds[2]
        )
        sum_ul = jnp.sum(ul)
        max_ul = jnp.max(ul)
        first_out = i == 2
        stats_ref[3] = jnp.where(first_out, sum_ul, stats_ref[3] + sum_ul)
        stats_ref[4] = jnp.where(
            first_out, max_ul, jnp.maximum(stats_ref[4], max_ul)
        )

    first = i == 0
    stats_ref[0] = jnp.where(first, e_data, stats_ref[0] + e_data)
    stats_ref[1] = jnp.where(first, e_smooth, stats_ref[1] + e_smooth)
    stats_ref[2] = jnp.where(first, e_ls, stats_ref[2] + e_ls)


def _fused_kernel_tiled_reuse(
    meta_ref,  # scalar-prefetch int32 (4,): [x_offset, xg-1, y_offset, yg-1]
    rate_ref,  # scalar-prefetch f32  (1,)
    warped_hbm,  # (XL, YL, Z) in HBM/ANY
    canon_hbm,  # (XL, YL, Z)
    warp_hbm,  # (3, XL, YL, Z)
    out_ref,  # (3, xb, yb, Z) updated-warp block (skewed: block i-2)
    stats_ref,  # SMEM (8,)
    wbuf,  # VMEM (2, xwp, yw, Z) double-buffered warped window
    cbuf,  # VMEM (2, xwp, yw, Z)
    ubuf,  # VMEM (3, 3, xwp, yw, Z) TRIPLE-buffered warp window: the
    #   output phase reads the PREVIOUS step's window while the NEXT
    #   step's copy is already in flight — three live slots.
    stage_ref,  # VMEM (xwp, yw, Z) term staging (reused for output slicing)
    ring_ref,  # VMEM (3, 3*xb, yw, Z) persistent term-row ring
    conv_ref,  # VMEM (xb + 2r, yw, Z) x-conv input staging
    sems,  # DMA semaphores (2, 5)
    *,
    xb: int,
    yb: int,
    x_lo: int,
    x_len: int,
    y_lo: int,
    w_data: float,
    w_smooth: float,
    w_ls: float,
    killing: bool,
    gamma: float,
    band_union: bool,
    taps: tuple,
    conv_local_x: bool = False,
):
    """Y-tiled kernel with the same term-row-reuse skew as
    ``_fused_kernel_reuse``, for blocks too big for VMEM-resident inputs
    (the config-5 per-shard path). Grid is (y blocks, x steps) — x INNER so
    the x-ring stays valid within each y row; the window/output compute
    redundancy drops from (xb+2h)(yb+2·8)/(xb·yb) ≈ 2.44 at (16,32) to
    (xb+4)(yb+16)/(xb·yb) ≈ 1.88, and the x-conv reads ring rows instead
    of a zero-bordered restage. The output block's warp rows (needed for
    the update u' = u − rate·g) are exactly the rows the PREVIOUS step's
    term window loaded — block i−2's compute window at step i−1 — and the
    double buffer still holds that window, so no extra DMA is needed. DMA
    offsets: x rides the leading dim (arbitrary); y offsets are
    sublane-aligned as in ``_fused_kernel_tiled``.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    nx = pl.num_programs(1)  # x_len // xb + 2 (two edge steps)
    k_lin = j * nx + i

    xl, yl, zsz = warped_hbm.shape
    r = len(taps) // 2
    kt = len(taps)
    xwp = min(xb + 4, xl)
    yw = min(yb + 2 * _YH, yl)
    n_blocks = x_len // xb
    off_lo = max(0, min(x_lo - r - 2, xl - xwp))
    ts_lo = min(max(x_lo - r - off_lo, 0), xwp - r)
    t0_hi = x_lo + x_len
    off_hi = max(0, min(t0_hi - 2, xl - xwp))
    ts_hi = min(max(t0_hi - off_hi, 0), xwp - r)

    def xoff(ii):
        t0 = x_lo + (ii - 1) * xb
        return jnp.where(
            ii == 0,
            off_lo,
            jnp.where(
                ii == nx - 1, off_hi, jnp.clip(t0 - 2, 0, xl - xwp)
            ),
        )

    def yoff(jj):
        return pl.multiple_of(
            jnp.clip(y_lo + jj * yb - _YH, 0, yl - yw), 8
        )

    def dmas(lin):
        jj = lin // nx
        ii = lin - jj * nx
        ox = xoff(ii)
        oy = yoff(jj)
        s2 = jax.lax.rem(lin, 2)  # w/c buffer + semaphore slot
        s3 = jax.lax.rem(lin, 3)  # warp buffer slot (triple)
        ds = [
            pltpu.make_async_copy(
                warped_hbm.at[pl.ds(ox, xwp), pl.ds(oy, yw), :],
                wbuf.at[s2], sems.at[s2, 0],
            ),
            pltpu.make_async_copy(
                canon_hbm.at[pl.ds(ox, xwp), pl.ds(oy, yw), :],
                cbuf.at[s2], sems.at[s2, 1],
            ),
        ]
        for c in range(3):
            ds.append(
                pltpu.make_async_copy(
                    warp_hbm.at[c, pl.ds(ox, xwp), pl.ds(oy, yw), :],
                    ubuf.at[s3, c], sems.at[s2, 2 + c],
                )
            )
        return ds

    slot = jax.lax.rem(k_lin, 2)
    slot3 = jax.lax.rem(k_lin, 3)

    @pl.when(k_lin == 0)
    def _():
        for dma in dmas(k_lin):
            dma.start()

    # Prefetch next step's windows under this step's compute; this step's
    # own copies were issued last step.
    @pl.when(k_lin + 1 < pl.num_programs(0) * nx)
    def _():
        for dma in dmas(k_lin + 1):
            dma.start()

    for dma in dmas(k_lin):
        dma.wait()

    ox = xoff(i)
    oy = yoff(j)
    sly = pl.multiple_of(y_lo + j * yb - oy, 8)
    t0_i = x_lo + (i - 1) * xb
    is_lo = i == 0
    is_hi = i == nx - 1
    edge = is_lo | is_hi
    ts = t0_i - ox

    rows = jax.lax.broadcasted_iota(jnp.int32, (xwp, 1, 1), 0)
    brow = rows + ox
    grow = brow + meta_ref[0]
    gend = grow - meta_ref[1]
    is0 = grow == 0
    isn = gend == 0
    yrows = jax.lax.broadcasted_iota(jnp.int32, (1, yw, 1), 1)
    gy = yrows + (oy + meta_ref[2])
    gy_end = gy - meta_ref[3]
    y_first = gy == 0
    y_last = gy_end == 0
    zv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, zsz), 2)
    z_first, z_last = zv == 0, zv == zsz - 1
    zve = zv - (zsz - 1)

    msk = (
        (rows >= ts) & (rows < ts + xb)
        & (brow >= x_lo) & (brow < x_lo + x_len)
        & jnp.logical_not(edge)
        & (yrows >= sly) & (yrows < sly + yb)
    )

    def isum(a):
        return jnp.sum(jnp.where(msk, a, 0.0))

    dd, lap3 = _make_derivs(is0, isn, y_first, y_last, z_first, z_last)

    w = wbuf[slot]
    c = cbuf[slot]
    u = [ubuf[slot3, cc] for cc in range(3)]

    total, e_data, e_smooth, e_ls = _assemble_terms(
        w, c, u, dd, lap3, isum,
        w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
        killing=killing, gamma=gamma, band_union=band_union,
    )

    # ---- ring write (see _fused_kernel_reuse) -------------------------------
    slot_r = jax.lax.rem(i, 3) * xb

    @pl.when(jnp.logical_not(edge))
    def _():
        if conv_local_x:
            lo_b, hi_b = x_lo, x_lo + x_len - 1
            need = (t0_i < lo_b) | (t0_i + xb - 1 > hi_b)
            vrow = (brow >= lo_b) & (brow <= hi_b)
        else:
            need = (t0_i + meta_ref[0] < 0) | (
                t0_i + xb - 1 + meta_ref[0] > meta_ref[1]
            )
            vrow = (grow >= 0) & (gend <= 0)
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, pl.ds(slot_r, xb)] = stage_ref[pl.ds(ts, xb)]

        @pl.when(need)
        def _():
            for k in range(3):
                stage_ref[:] = jnp.where(vrow, total[k], 0.0)
                ring_ref[k, pl.ds(slot_r, xb)] = stage_ref[pl.ds(ts, xb)]

    @pl.when(is_lo)
    def _():
        tail = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        trow = tail + (x_lo - r)
        if conv_local_x:
            vtail = jnp.zeros((r, 1, 1), jnp.bool_)
        else:
            tg = trow + meta_ref[0]
            vtail = (tg >= 0) & (tg <= meta_ref[1])
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, xb - r : xb] = jnp.where(
                vtail, stage_ref[ts_lo : ts_lo + r], 0.0
            )

    @pl.when(is_hi)
    def _():
        tail = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        trow = tail + t0_hi
        if conv_local_x:
            vtail = jnp.zeros((r, 1, 1), jnp.bool_)
        else:
            tg = trow + meta_ref[0]
            vtail = (tg >= 0) & (tg <= meta_ref[1])
        for k in range(3):
            stage_ref[:] = total[k]
            ring_ref[k, pl.ds(slot_r, r)] = jnp.where(
                vtail, stage_ref[ts_hi : ts_hi + r], 0.0
            )

    # ---- output phase: block i−2 of this y row ------------------------------
    @pl.when(i > 1)
    def _():
        slot_l = jax.lax.rem(i - 2, 3) * xb
        slot_m = jax.lax.rem(i - 1, 3) * xb
        # The output block's warp rows: the previous step's term window
        # (retained by the triple buffer; the in-flight prefetch writes
        # slot (k+1) mod 3 ≠ (k−1) mod 3) was anchored for exactly this
        # block — its first output row sits at window row ts_prev.
        prev = jax.lax.rem(k_lin - 1, 3)
        t0_prev = x_lo + (i - 2) * xb
        ts_prev = t0_prev - xoff(i - 1)
        neg_rate = -rate_ref[0]
        ul2 = None
        for k in range(3):
            conv_ref[:r] = ring_ref[k, pl.ds(slot_l + xb - r, r)]
            conv_ref[r : r + xb] = ring_ref[k, pl.ds(slot_m, xb)]
            conv_ref[r + xb :] = ring_ref[k, pl.ds(slot_r, r)]
            a = None
            for t in range(kt):
                term = taps[kt - 1 - t] * conv_ref[t : t + xb]
                a = term if a is None else a + term
            a = _conv_lane(a, 1, gy, gy_end, taps)
            a = _conv_lane(a, 2, zv, zve, taps)
            stage_ref[: xb] = neg_rate * a
            upd = stage_ref[pl.ds(0, xb), pl.ds(sly, yb), :]
            u_out = ubuf[prev, k, pl.ds(ts_prev, xb), pl.ds(sly, yb), :]
            new_u = u_out + upd
            out_ref[k] = new_u
            mxu = jnp.max(jnp.abs(new_u))
            stats_ref[5 + k] = jnp.where(
                k_lin == 2, mxu, jnp.maximum(stats_ref[5 + k], mxu)
            )
            sq = upd * upd
            ul2 = sq if ul2 is None else ul2 + sq
        ul = jnp.sqrt(ul2)
        sum_ul = jnp.sum(ul)
        max_ul = jnp.max(ul)
        first_out = k_lin == 2
        stats_ref[3] = jnp.where(first_out, sum_ul, stats_ref[3] + sum_ul)
        stats_ref[4] = jnp.where(
            first_out, max_ul, jnp.maximum(stats_ref[4], max_ul)
        )

    first = k_lin == 0
    stats_ref[0] = jnp.where(first, e_data, stats_ref[0] + e_data)
    stats_ref[1] = jnp.where(first, e_smooth, stats_ref[1] + e_smooth)
    stats_ref[2] = jnp.where(first, e_ls, stats_ref[2] + e_ls)


_RING_SLOTS = 3


def _pick_xb_reuse(x_len: int, x_total: int, y: int, z: int, r: int) -> int:
    """Largest x block for the row-reuse whole-volume kernel: temporaries
    now scale with xb+4 (not xb+2h), plus the 3-block term ring."""
    row = y * z * 4
    budget = _VMEM_BUDGET - _input_bytes(x_total, y, z)
    for cand in (64, 32, 16, 8):
        if x_len % cand or cand < 2 * r:
            continue
        vmem = (
            _TEMP_ROWSETS * (cand + 4) * row  # straight-line temporaries
            + 3 * _RING_SLOTS * cand * row  # term ring (3 components)
            + (cand + 4) * row  # stage
            + (cand + 2 * r) * row  # conv staging
            + 3 * cand * row  # output block
        )
        if vmem <= budget:
            return cand
    raise ValueError(
        f"shape ({x_total},{y},{z}) does not fit the reuse kernel's VMEM plan"
    )


_VMEM_BUDGET = 100 * 1024 * 1024
# Mosaic scoped-VMEM stack per window row of straight-line temporaries,
# measured: a 74-row full-energy window needed ~118 MB → ~25 row-sets.
_TEMP_ROWSETS = 25


def _input_bytes(x: int, y: int, z: int) -> int:
    """VMEM held by the 5 whole-array resident inputs (warped, canon, 3·warp)."""
    return 5 * x * y * z * 4


def _pick_xb(x_len: int, x_total: int, y: int, z: int, h: int) -> int:
    """Largest x compute chunk whose temporaries fit beside the inputs
    (whole-volume kernel)."""
    row = y * z * 4
    budget = _VMEM_BUDGET - _input_bytes(x_total, y, z)
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if x_len % cand:
            continue
        if (min(cand + 2 * h, x_total)) * row * _TEMP_ROWSETS <= budget:
            return cand
    raise ValueError(
        f"shape ({x_total},{y},{z}) does not fit the fused kernel's VMEM plan"
    )


def _pick_tiles(
    x_len: int, xl: int, y_len: int, yl: int, z: int, h: int, r: int
):
    """(xb, yb) for the y-tiled kernel: the fewest grid steps whose windows,
    double buffers, and straight-line temporaries fit the VMEM budget."""
    if r > _YH - 2:
        raise ValueError(
            f"Sobolev radius {r} exceeds the tiled kernel's y halo budget "
            f"(_YH - 2 = {_YH - 2})"
        )
    best = None
    for yb in (256, 128, 64, 32, 16, 8):
        if y_len % yb:
            continue
        yw = min(yb + 2 * _YH, yl)
        for xb in (16, 8, 4, 2, 1):
            if x_len % xb:
                continue
            xw = min(xb + 2 * h, xl)
            plane = yw * z * 4
            vmem = (
                _TEMP_ROWSETS * xw * plane  # straight-line temporaries
                + 2 * 5 * xw * plane  # double-buffered input windows
                + 2 * 3 * xb * yb * z * 4  # pipelined output block
                + xw * plane  # output staging
                + (xw + 2 * r) * plane * (1 if r else 0)  # conv staging
            )
            if vmem > _VMEM_BUDGET:
                continue
            steps = (x_len // xb) * (y_len // yb)
            key = (steps, -xb * yb)
            if best is None or key < best[0]:
                best = (key, xb, yb)
    if best is None:
        raise ValueError(
            f"block ({x_len}/{xl}, {y_len}/{yl}, {z}) does not fit the "
            "y-tiled fused kernel's VMEM plan"
        )
    return best[1], best[2]


def _pick_tiles_reuse(
    x_len: int, xl: int, y_len: int, yl: int, z: int, r: int
):
    """(xb, yb) for the tiled term-row-reuse kernel: temporaries scale with
    xb+4 (not xb+2h) and the ring/staging join the budget."""
    if r > _YH - 2:
        raise ValueError(
            f"Sobolev radius {r} exceeds the tiled kernel's y halo budget "
            f"(_YH - 2 = {_YH - 2})"
        )
    best = None
    for yb in (128, 64, 32, 16, 8):
        if y_len % yb:
            continue
        yw = min(yb + 2 * _YH, yl)
        plane = yw * z * 4
        for xb in (32, 16, 8):
            if x_len % xb or xb < 2 * r:
                continue
            xwp = min(xb + 4, xl)
            vmem = (
                _TEMP_ROWSETS * xwp * plane  # straight-line temporaries
                + 2 * 2 * xwp * plane  # double-buffered warped/canon
                + 3 * 3 * xwp * plane  # triple-buffered warp windows
                + 2 * 3 * xb * yb * z * 4  # pipelined output block
                + xwp * plane  # stage
                + 3 * _RING_SLOTS * xb * plane  # term ring
                + (xb + 2 * r) * plane  # conv staging
            )
            if vmem > _VMEM_BUDGET:
                continue
            steps = (x_len // xb + 2) * (y_len // yb)
            key = (steps, -xb * yb)
            if best is None or key < best[0]:
                best = (key, xb, yb)
    if best is None:
        raise ValueError(
            f"block ({x_len}/{xl}, {y_len}/{yl}, {z}) does not fit the "
            "tiled reuse kernel's VMEM plan"
        )
    return best[1], best[2]


def _shape_ok(shape) -> bool:
    if len(shape) != 3:
        return False
    x, y, z = shape
    return not (z % _LANE or y % 8 or x < 1)


def fused_supported(
    shape,
    interpret: bool = False,
    sobolev: bool = True,
    x_lo: int = 0,
    x_len: int | None = None,
    y_lo: int = 0,
    y_len: int | None = None,
    conv_local: bool = False,
    sobolev_radius: int = 3,
) -> bool:
    """Shape gate for ``fused_gradient_update``: 3D, lane-width z,
    sublane-tiled y, and a feasible VMEM plan (whole-volume or y-tiled).

    ``sobolev_radius`` must be the ACTUAL filter radius the caller will run
    (``params.sobolev_kernel_size // 2``) so the VMEM-plan feasibility
    answer matches the lowering the kernel picks (ADVICE r4: a hardcoded
    radius made the gate diverge from the lowering for non-default sizes).
    """
    if not (interpret or jax.devices()[0].platform == "tpu"):
        return False
    if not _shape_ok(shape):
        return False
    x, y, z = shape
    if x_len is None:
        x_len = x - x_lo
    if y_len is None:
        y_len = y - y_lo
    h = 2 if (not sobolev or conv_local) else 2 + sobolev_radius
    if x_lo and (x_lo < h or x < x_lo + x_len):
        return False
    if y_lo and (y_lo < _YH or y_lo % 8 or y < y_lo + y_len):
        return False
    r = sobolev_radius if sobolev else 0
    if y_lo == 0 and y_len == y:
        try:
            _pick_xb(x_len, x, y, z, h)
            return True
        except ValueError:
            pass
        if r:
            try:
                _pick_xb_reuse(x_len, x, y, z, r)
                return True
            except ValueError:
                pass
    try:
        _pick_tiles(x_len, x, y_len, y, z, h, r)
        return True
    except ValueError:
        pass
    if r:
        try:
            _pick_tiles_reuse(x_len, x, y_len, y, z, r)
            return True
        except ValueError:
            pass
    return False


@functools.partial(
    jax.jit,
    static_argnames=(
        "w_data", "w_smooth", "w_ls", "killing", "gamma", "band_union",
        "taps", "interpret", "x_global", "x_lo", "x_len",
        "y_global", "y_lo", "y_len", "conv_local_x", "force_tiled",
        "tile_override", "row_reuse", "force_tiled_reuse",
    ),
)
def fused_gradient_update(
    warped: jnp.ndarray,
    canonical: jnp.ndarray,
    warp_cm: jnp.ndarray,
    rate: jnp.ndarray,
    *,
    w_data: float = 1.0,
    w_smooth: float = 0.2,
    w_ls: float = 0.0,
    killing: bool = False,
    gamma: float = 0.1,
    band_union: bool = True,
    taps: tuple = (),
    interpret: bool = False,
    x_offset=0,
    x_global: int | None = None,
    x_lo: int = 0,
    x_len: int | None = None,
    y_offset=0,
    y_global: int | None = None,
    y_lo: int = 0,
    y_len: int | None = None,
    conv_local_x: bool = False,
    force_tiled: bool = False,
    tile_override: tuple | None = None,
    row_reuse: bool = True,
    force_tiled_reuse: bool = False,
):
    """One fused solver step after the resample: returns ``(new_warp_cm,
    FusedStats)``.

    Args:
      warped: warped-live field ``(XL, YL, Z)`` (may include halo rows).
      canonical: canonical field, same shape.
      warp_cm: component-major warp ``(3, XL, YL, Z)``.
      rate: traced scalar learning rate.
      taps: Sobolev kernel taps as a static tuple of floats; empty = no filter.
      x_offset / y_offset: global coordinate of input row/col 0 (traced —
        per-shard values under shard_map; negative for leading halo rows).
      x_global / y_global: global extents (default: the input extents).
      x_lo / x_len, y_lo / y_len: the output window within the input rows —
        the update is computed for input rows [x_lo, x_lo + x_len) ×
        [y_lo, y_lo + y_len) (a shard's interior). ``x_lo`` must be 0 or
        >= the stencil+filter halo (5 with Sobolev, else 2); ``y_lo`` must
        be 0 or a multiple of 8 that is >= 8.
      conv_local_x: zero the Sobolev x-conv at the block-interior boundary
        instead of the global domain edge (Schur block-local filtering).

    Energies are weighted (matching ops/gradient.py's telemetry convention)
    and reduced over the output window only.
    """
    xt, yt, z = warped.shape
    assert warp_cm.shape == (3, xt, yt, z), warp_cm.shape
    if x_len is None:
        x_len = xt - x_lo
    if y_len is None:
        y_len = yt - y_lo
    xg = xt if x_global is None else x_global
    yg = yt if y_global is None else y_global
    # Under conv_local_x the Sobolev x-conv reads only block-interior rows
    # (everything beyond is zeroed), so the x halo need drops back to the
    # stencil radius 2 — the Schur solver's 2-ghost-row contract.
    r = len(taps) // 2 if taps else 0
    h = 2 if (not taps or conv_local_x) else 2 + r

    meta = jnp.stack([
        jnp.asarray(x_offset, jnp.int32),
        jnp.asarray(xg - 1, jnp.int32),
        jnp.asarray(y_offset, jnp.int32),
        jnp.asarray(yg - 1, jnp.int32),
    ])
    rate_arr = jnp.asarray(rate, jnp.float32).reshape((1,))

    whole = False
    reuse = False
    if not (force_tiled or force_tiled_reuse) and y_lo == 0 and y_len == yt:
        # Prefer the term-row-reuse lowering when the Sobolev filter is on:
        # same exactness contract, no halo-row recompute (~38% less term +
        # conv work at xb=16).
        if taps and row_reuse:
            try:
                xb = _pick_xb_reuse(x_len, xt, yt, z, r)
                whole = reuse = True
            except ValueError:
                pass
        if not whole:
            try:
                xb = _pick_xb(x_len, xt, yt, z, h)
                whole = True
            except ValueError:
                pass

    if reuse:
        kern = functools.partial(
            _fused_kernel_reuse,
            xb=xb, x_lo=x_lo, x_len=x_len,
            w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
            killing=killing, gamma=gamma, band_union=band_union, taps=taps,
            conv_local_x=conv_local_x,
        )
        grid = (x_len // xb + 2,)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec(
                (3, xb, yt, z),
                lambda i, *_: (0, jnp.maximum(i - 2, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((3, x_len, yt, z), warped.dtype),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        )
        scratch_shapes = [
            pltpu.VMEM((min(xb + 4, xt), yt, z), jnp.float32),  # stage
            pltpu.VMEM((3, _RING_SLOTS * xb, yt, z), jnp.float32),  # ring
            pltpu.VMEM((xb + 2 * r, yt, z), jnp.float32),  # conv staging
        ]
    elif whole:
        kern = functools.partial(
            _fused_kernel,
            xb=xb, h=h, x_lo=x_lo, x_len=x_len,
            w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
            killing=killing, gamma=gamma, band_union=band_union, taps=taps,
            conv_local_x=conv_local_x,
        )
        grid = (x_len // xb,)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((3, xb, yt, z), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((3, x_len, yt, z), warped.dtype),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        )
        xw = min(xb + 2 * h, xt)
        scratch_shapes = [pltpu.VMEM((xw, yt, z), jnp.float32)]
        if taps:
            scratch_shapes.append(
                pltpu.VMEM((xw + 2 * r, yt, z), jnp.float32)
            )
    else:
        tiled_reuse = False
        if force_tiled_reuse:
            xb, yb = tile_override or _pick_tiles_reuse(
                x_len, xt, y_len, yt, z, r
            )
            tiled_reuse = True
        elif taps and row_reuse and tile_override is None:
            try:
                xb, yb = _pick_tiles_reuse(x_len, xt, y_len, yt, z, r)
                tiled_reuse = True
            except ValueError:
                pass
        if not tiled_reuse:
            xb, yb = tile_override or _pick_tiles(
                x_len, xt, y_len, yt, z, h, r
            )
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_shape = (
            jax.ShapeDtypeStruct((3, x_len, y_len, z), warped.dtype),
            jax.ShapeDtypeStruct((8,), jnp.float32),
        )
        yw = min(yb + 2 * _YH, yt)
        if tiled_reuse:
            xwp = min(xb + 4, xt)
            kern = functools.partial(
                _fused_kernel_tiled_reuse,
                xb=xb, yb=yb, x_lo=x_lo, x_len=x_len, y_lo=y_lo,
                w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
                killing=killing, gamma=gamma, band_union=band_union,
                taps=taps, conv_local_x=conv_local_x,
            )
            grid = (y_len // yb, x_len // xb + 2)
            out_specs = (
                pl.BlockSpec(
                    (3, xb, yb, z),
                    lambda j, i, *_: (0, jnp.maximum(i - 2, 0), j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            )
            scratch_shapes = [
                pltpu.VMEM((2, xwp, yw, z), jnp.float32),  # warped dbuf
                pltpu.VMEM((2, xwp, yw, z), jnp.float32),  # canon dbuf
                pltpu.VMEM((3, 3, xwp, yw, z), jnp.float32),  # warp tbuf
                pltpu.VMEM((xwp, yw, z), jnp.float32),  # stage
                pltpu.VMEM(
                    (3, _RING_SLOTS * xb, yw, z), jnp.float32
                ),  # ring
                pltpu.VMEM((xb + 2 * r, yw, z), jnp.float32),  # conv
                pltpu.SemaphoreType.DMA((2, 5)),
            ]
        else:
            xw = min(xb + 2 * h, xt)
            kern = functools.partial(
                _fused_kernel_tiled,
                xb=xb, yb=yb, h=h, x_lo=x_lo, x_len=x_len, y_lo=y_lo,
                w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
                killing=killing, gamma=gamma, band_union=band_union,
                taps=taps, conv_local_x=conv_local_x,
            )
            grid = (x_len // xb, y_len // yb)
            out_specs = (
                pl.BlockSpec((3, xb, yb, z), lambda i, j, *_: (0, i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            )
            scratch_shapes = [
                pltpu.VMEM((2, xw, yw, z), jnp.float32),
                pltpu.VMEM((2, xw, yw, z), jnp.float32),
                pltpu.VMEM((2, 3, xw, yw, z), jnp.float32),
                pltpu.VMEM((xw, yw, z), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 5)),
            ]
            if taps:
                scratch_shapes.append(
                    pltpu.VMEM((xw + 2 * r, yw, z), jnp.float32)
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    new_warp, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(meta, rate_arr, warped, canonical, warp_cm)
    return new_warp, FusedStats(
        data_energy=stats[0],
        smoothing_energy=stats[1],
        level_set_energy=stats[2],
        sum_update=stats[3],
        max_update=stats[4],
        max_abs_u=stats[5:8],
    )


def sobolev_taps(size: int, strength: float) -> tuple:
    """Static tuple of Sobolev kernel taps for the fused kernel closure."""
    from levelsetfusion_tpu.ops.sobolev import generate_1d_sobolev_kernel

    return tuple(float(v) for v in np.asarray(
        generate_1d_sobolev_kernel(size, strength)
    ))
