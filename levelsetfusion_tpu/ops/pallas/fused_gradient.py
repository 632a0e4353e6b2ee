"""Fused gradient+update Pallas TPU kernel (BASELINE north_star: "per-voxel
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

Design notes (the measured TPU rules that shape the code):

- **Whole-array VMEM inputs + in-kernel windows.** Per-grid-step
  ``pl.Element`` halo windows cost ~105 µs of fixed DMA overhead each
  (measured: 3 inputs × 4 steps ≈ 1.26 ms — 4× the actual math). Instead
  the unpadded inputs sit whole in VMEM and each grid step carves an
  x window with a clamped dynamic leading-dim slice (vreg speed).
- **No XLA pre-padding.** Edge handling is mask-based (one-sided
  difference forms at global edges), so the inputs are consumed as-is —
  padding cost ~83 MB/iteration of pure HBM traffic in the padded design.
- **Exactly two scalar→vector mixes per block.** Any vector op mixing in a
  dynamic scalar costs ~7.6 µs (KERNEL_NOTES.md). The global-row vector
  ``grow`` and its end-anchored twin are built once; every edge mask is
  then vector-vs-constant.
- **np.gradient / Laplacian edge conventions** (the framework's pinned
  numerics, ops/derivatives.py) are reproduced with masked selects; the
  one-sided forms compose correctly in-register (Hessian, ∇(∇·u)) without
  ghost rows.
- **Axis shifts**: x (leading dim) / y (sublane) / z (lane) neighbor access
  is ``jnp.roll`` with static shifts; wrap garbage lands outside the
  validity slack (h rows each side) or is masked (Sobolev x-conv).
- **Warp is component-major** ``(3, x, y, z)`` in and out — a trailing
  3-channel dim lane-pads 3→128 in VMEM (42× DMA inflation, measured).
- **Scalars ride scalar-prefetch**; energies/stats accumulate in an SMEM
  output across the (sequential) grid steps.

The ``x_lo``/``x_len``/``x_offset``/``x_global`` parameters let the sharded
solver run the same kernel per voxel block: inputs carry halo rows, the
output covers the interior, and the global-edge masks fire only at mesh
ends.

Parity: tests/test_fused_gradient.py asserts interpret-mode equality with
the pure-jnp assembly (ops/gradient.py + ops/sobolev.py + the update step)
to float tolerance, including all global-edge rows.

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


class FusedStats(NamedTuple):
    data_energy: jnp.ndarray
    smoothing_energy: jnp.ndarray
    level_set_energy: jnp.ndarray
    sum_update: jnp.ndarray
    max_update: jnp.ndarray


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
    between the whole-volume and y-tiled kernels.
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
        # Jacobian J[c][d] = d_d(u_c); the diagonal doubles as the divergence.
        jac = [[dd[di](u[ci]) for di in range(3)] for ci in range(3)]
        if killing:
            div = jac[0][0] + jac[1][1] + jac[2][2]
            gdiv = [d0(div), d1(div), d2(div)]
            for k in range(3):
                total[k] = total[k] + w_smooth * (
                    -(1.0 + gamma) * lap3(u[k]) - gdiv[k]
                )
            e_sym = jnp.zeros((), jnp.float32)
            e_jac = jnp.zeros((), jnp.float32)
            for ci in range(3):
                for di in range(3):
                    s_cd = jac[ci][di] + jac[di][ci]
                    e_sym = e_sym + isum(s_cd * s_cd)
                    e_jac = e_jac + isum(jac[ci][di] * jac[ci][di])
            e_smooth = w_smooth * 0.5 * (0.5 * e_sym + gamma * e_jac)
        else:
            for k in range(3):
                total[k] = total[k] + w_smooth * (-lap3(u[k]))
            e_jac = jnp.zeros((), jnp.float32)
            for ci in range(3):
                for di in range(3):
                    e_jac = e_jac + isum(jac[ci][di] * jac[ci][di])
            e_smooth = w_smooth * 0.5 * e_jac

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


def _conv_x_staged(a, conv_ref, xw, taps):
    """Separable x-conv via physical zero borders in a VMEM scratch + static
    leading-dim slices: no selects (a broadcast select with an (xw,1,1)
    predicate costs ~14 µs — measured — and leading-dim slices of refs are
    vreg-speed). The clamped window makes window edge == global domain edge
    exactly when the zero padding must be visible (first/last block), so the
    border is exact there and unread everywhere else (conv reads stay in the
    validity slack)."""
    k = len(taps)
    r = k // 2
    conv_ref[:r] = jnp.zeros((r,) + a.shape[1:], a.dtype)
    conv_ref[r : r + xw] = a
    conv_ref[r + xw :] = jnp.zeros((r,) + a.shape[1:], a.dtype)
    out = None
    for t in range(k):
        term = taps[k - 1 - t] * conv_ref[t : t + xw]
        out = term if out is None else out + term
    return out


def _conv_lane(a, axis, vec, size, taps):
    """y/z separable conv with zero padding at *global* edges via masked
    sublane/lane rolls: (1,Y,1)/(1,1,Z) predicates vectorize cheaply (unlike
    leading-dim ones). ``vec`` holds global coordinates along ``axis`` and
    ``size`` the global extent, so windowed kernels mask pad-row reads."""
    r = len(taps) // 2
    out = taps[r] * a
    for s in range(1, r + 1):
        ok_p = vec + s <= size - 1
        ok_m = vec - s >= 0
        out = out + taps[r - s] * jnp.where(ok_p, _roll(a, s, axis), 0.0)
        out = out + taps[r + s] * jnp.where(ok_m, _roll(a, -s, axis), 0.0)
    return out


def _fused_kernel(
    meta_ref,  # scalar-prefetch int32 (2,): [x_offset, x_global_minus_1]
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
    w_data: float,
    w_smooth: float,
    w_ls: float,
    killing: bool,
    gamma: float,
    band_union: bool,
    taps: tuple,
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

    # --- global row coordinates: the only scalar→vector mixes in the body ---
    rows = jax.lax.broadcasted_iota(jnp.int32, (xw, 1, 1), 0)
    grow = rows + (off + meta_ref[0])  # global row of each window row
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

    # --- derivative helpers (ops/derivatives.py conventions, in-register).
    # One-sided forms at edges never touch the wrapped operand, so they
    # compose (Hessian, ∇(∇·u)) without ghost rows.
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

    w = warped_ref[pl.ds(off, xw)]
    c = canon_ref[pl.ds(off, xw)]
    u = [warp_ref[k, pl.ds(off, xw)] for k in range(3)]

    # --- data term -----------------------------------------------------------
    g_w = [d0(w), d1(w), d2(w)]  # ∇Φ_w, np.gradient convention
    diff = w - c
    if band_union:
        mask = (jnp.abs(c) < 1.0 - _TRUNC_EPS) | (jnp.abs(w) < 1.0 - _TRUNC_EPS)
        diff = jnp.where(mask, diff, 0.0)
    total = [w_data * diff * g_w[k] for k in range(3)]

    # --- smoothing term ------------------------------------------------------
    e_smooth = jnp.zeros((), jnp.float32)
    if w_smooth != 0.0:
        # Jacobian J[c][d] = d_d(u_c); the diagonal doubles as the divergence.
        dd = (d0, d1, d2)
        jac = [[dd[di](u[ci]) for di in range(3)] for ci in range(3)]
        if killing:
            div = jac[0][0] + jac[1][1] + jac[2][2]
            gdiv = [d0(div), d1(div), d2(div)]
            for k in range(3):
                total[k] = total[k] + w_smooth * (
                    -(1.0 + gamma) * lap3(u[k]) - gdiv[k]
                )
            e_sym = jnp.zeros((), jnp.float32)
            e_jac = jnp.zeros((), jnp.float32)
            for ci in range(3):
                for di in range(3):
                    s_cd = jac[ci][di] + jac[di][ci]
                    e_sym = e_sym + isum(s_cd * s_cd)
                    e_jac = e_jac + isum(jac[ci][di] * jac[ci][di])
            e_smooth = w_smooth * 0.5 * (0.5 * e_sym + gamma * e_jac)
        else:
            for k in range(3):
                total[k] = total[k] + w_smooth * (-lap3(u[k]))
            e_jac = jnp.zeros((), jnp.float32)
            for ci in range(3):
                for di in range(3):
                    e_jac = e_jac + isum(jac[ci][di] * jac[ci][di])
            e_smooth = w_smooth * 0.5 * e_jac

    # --- level-set term ------------------------------------------------------
    e_ls = jnp.zeros((), jnp.float32)
    if w_ls != 0.0:
        norm = jnp.sqrt(g_w[0] * g_w[0] + g_w[1] * g_w[1] + g_w[2] * g_w[2])
        scale = (norm - 1.0) / (norm + _LS_EPS)
        if band_union:
            scale = jnp.where(mask, scale, 0.0)
            e_terms = jnp.where(mask, (norm - 1.0) ** 2, 0.0)
        else:
            e_terms = (norm - 1.0) ** 2
        dd = (d0, d1, d2)
        for gi in range(3):
            # Row gi of the Hessian dotted with ∇Φ_w: Σ_j d_j(g_gi)·g_j.
            hg = jnp.zeros_like(w)
            for j in range(3):
                hg = hg + dd[j](g_w[gi]) * g_w[j]
            total[gi] = total[gi] + w_ls * scale * hg
        e_ls = w_ls * 0.5 * isum(e_terms)

    e_data = w_data * 0.5 * isum(diff * diff)

    # --- Sobolev filter (separable, zero padding at global edges) ------------
    if taps:
        k = len(taps)
        r = k // 2

        def conv_x(a):
            # Physical zero borders in a VMEM scratch + static leading-dim
            # slices: no selects (a broadcast select with an (xw,1,1)
            # predicate costs ~14 µs — measured — and leading-dim slices of
            # refs are vreg-speed). The clamped window makes window edge ==
            # global domain edge exactly when the zero padding must be
            # visible (first/last block), so the border is exact there and
            # unread everywhere else (conv reads stay in the validity slack).
            conv_ref[:r] = jnp.zeros((r,) + a.shape[1:], a.dtype)
            conv_ref[r : r + xw] = a
            conv_ref[r + xw :] = jnp.zeros((r,) + a.shape[1:], a.dtype)
            out = None
            for t in range(k):
                term = taps[k - 1 - t] * conv_ref[t : t + xw]
                out = term if out is None else out + term
            return out

        def conv_yz(a, axis, vec, size):
            # Masked sublane/lane rolls: (1,Y,1)/(1,1,Z) predicates
            # vectorize cheaply (unlike leading-dim ones).
            out = taps[r] * a
            for s in range(1, r + 1):
                ok_p = vec + s <= size - 1
                ok_m = vec - s >= 0
                out = out + taps[r - s] * jnp.where(ok_p, _roll(a, s, axis), 0.0)
                out = out + taps[r + s] * jnp.where(ok_m, _roll(a, -s, axis), 0.0)
            return out

        for kk in range(3):
            a = conv_x(total[kk])
            a = conv_yz(a, 1, yv, ysz)
            total[kk] = conv_yz(a, 2, zv, zsz)

    # --- update + stats -------------------------------------------------------
    # The interior output slice goes value → scratch ref → dynamic ref slice
    # (Mosaic lowers pl.ds on refs but not dynamic_slice on values).
    neg_rate = -rate_ref[0]
    upd = [neg_rate * total[k] for k in range(3)]
    for k in range(3):
        scratch_ref[:] = u[k] + upd[k]
        out_ref[k] = scratch_ref[pl.ds(sl_start, xb)]
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


_VMEM_BUDGET = 100 * 1024 * 1024
# Mosaic scoped-VMEM stack per window row of straight-line temporaries,
# measured: a 74-row full-energy window needed ~118 MB → ~25 row-sets.
_TEMP_ROWSETS = 25


def _input_bytes(x: int, y: int, z: int) -> int:
    """VMEM held by the 5 whole-array resident inputs (warped, canon, 3·warp)."""
    return 5 * x * y * z * 4


def _pick_xb(x_len: int, x_total: int, y: int, z: int, h: int) -> int:
    """Largest x compute chunk whose temporaries fit beside the inputs."""
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


def fused_supported(shape, interpret: bool = False, sobolev: bool = True) -> bool:
    """Shape gate: 3D, lane-width z, sublane-tiled y, VMEM-resident inputs."""
    if not (interpret or jax.devices()[0].platform == "tpu"):
        return False
    if len(shape) != 3:
        return False
    x, y, z = shape
    if z % _LANE or y % 8 or x < 1:
        return False
    h = 5 if sobolev else 2
    try:
        _pick_xb(x, x, y, z, h)
    except ValueError:
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=(
        "w_data", "w_smooth", "w_ls", "killing", "gamma", "band_union",
        "taps", "interpret", "x_offset_static", "x_global", "x_lo", "x_len",
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
    x_offset_static: int = 0,
    x_global: int | None = None,
    x_lo: int = 0,
    x_len: int | None = None,
):
    """One fused solver step after the resample: returns ``(new_warp_cm,
    FusedStats)``.

    Args:
      warped: warped-live field ``(XL, Y, Z)`` (may include halo rows).
      canonical: canonical field, same shape.
      warp_cm: component-major warp ``(3, XL, Y, Z)``.
      rate: traced scalar learning rate.
      taps: Sobolev kernel taps as a static tuple of floats; empty = no filter.
      x_offset_static: global row index of input row 0 (sharded blocks).
      x_global: global x extent (defaults to XL).
      x_lo / x_len: the output window within the input rows — the update is
        computed for input rows [x_lo, x_lo + x_len) (a shard's interior).

    Energies are weighted (matching ops/gradient.py's telemetry convention)
    and reduced over the output window only.
    """
    xt, y, z = warped.shape
    assert warp_cm.shape == (3, xt, y, z), warp_cm.shape
    if x_len is None:
        x_len = xt - x_lo
    xg = xt if x_global is None else x_global
    h = 5 if taps else 2
    xb = _pick_xb(x_len, xt, y, z, h)

    meta = jnp.array([x_offset_static, xg - 1], jnp.int32)
    rate_arr = jnp.asarray(rate, jnp.float32).reshape((1,))

    kern = functools.partial(
        _fused_kernel,
        xb=xb, h=h, x_lo=x_lo, w_data=w_data, w_smooth=w_smooth, w_ls=w_ls,
        killing=killing, gamma=gamma, band_union=band_union, taps=taps,
    )
    grid = (x_len // xb,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((3, xb, y, z), lambda i, *_: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((3, x_len, y, z), warped.dtype),
        jax.ShapeDtypeStruct((8,), jnp.float32),
    )
    xw = min(xb + 2 * h, xt)
    scratch_shapes = [pltpu.VMEM((xw, y, z), jnp.float32)]
    if taps:
        r = len(taps) // 2
        scratch_shapes.append(pltpu.VMEM((xw + 2 * r, y, z), jnp.float32))
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
    )


def sobolev_taps(size: int, strength: float) -> tuple:
    """Static tuple of Sobolev kernel taps for the fused kernel closure."""
    from levelsetfusion_tpu.ops.sobolev import generate_1d_sobolev_kernel

    return tuple(float(v) for v in np.asarray(
        generate_1d_sobolev_kernel(size, strength)
    ))
