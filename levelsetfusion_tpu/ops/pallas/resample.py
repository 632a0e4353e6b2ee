"""Pallas TPU warp-resample kernel — the pipeline's dominant cost.

Why a kernel: XLA lowers the trilinear gather ``Φ_live(x + u(x))`` to a
general TPU gather (~192 ms per 128³ resample on v5e, dispatch-floor
corrected — TPUs have no hardware gather). This kernel exploits the
problem's structure instead and measures **~12 ms** for the same resample
(v8; see KERNEL_NOTES.md for the measured design-space log).

Design (exact trilinear for per-axis displacements ``|u| ≤ K``; larger x/y
displacements are clamped — documented fast-path semantics; z is unbounded
for single-slab volumes). ``K`` may be a per-axis ``(kx, ky, kz)`` tuple
(see ``k3``): ky sets the stacked-copy count — the dominant HBM/VMEM cost
— kx the window width, kz the multi-slab gather clamp, so anisotropic
motion pays per axis instead of cubing the worst one:

- **x/y integer offsets** are enumerated over the ``(2K+2)²`` shift pairs
  with exact *tent weights* (Σ_s tent(u−s)·plane[x+s] ≡ linear
  interpolation: only the two bracketing terms per axis are nonzero and the
  weights select them). All terms are combined in the *output* frame, so
  there is no separable-warp approximation: this matches the golden op to
  float precision.
- The **y shifts are pre-materialized** as a stacked array of 2K+2 y-shifted
  copies (cheap XLA slices) so that every in-kernel access is a tile-aligned
  block — unaligned sublane access on TPU forces murderous relayouts.
- The stacked array is delivered in **x-chunked VMEM-resident blocks**
  (plain leading-dim windows that advance every ``xb`` grid steps); the
  kernel indexes x windows with *dynamic leading-dim indices*, which Mosaic
  serves at vreg speed. Per-grid-step ``pl.Element`` windows are ~105 µs of
  DMA overhead per step — measured, avoided.
- **Tent weight planes are precomputed into VMEM scratch with static
  shifts** before the pair loop. This is the load-bearing trick: any vector
  op whose operand mixes in a *dynamic scalar* derived from the loop index
  (e.g. ``tent(u − (cy − k))``) costs ~7.6 µs per op on v5e (scalar→vector
  sync), which made the naive loop 36 × 7.6 µs ≈ 70 ms of pure stall. With
  static-shift precompute + dynamic-index scratch reads the pair body costs
  ~0.6 µs.
- The **z axis** uses the VPU's per-element dynamic gather within one vreg
  (``tpu.dynamic_gather`` via ``take_along_axis``, lane width 128) with both
  interpolation corners and out-of-band +1 fill folded into per-corner
  weights — hence the fast path requires the trailing extent to equal 128.
- The x/y **clamp to ±K happens in-kernel** (static bounds), so the warp
  tensor is passed through untouched — zero XLA prep on the warp.

``warp_field_fast`` dispatches: Pallas on TPU when the shape fits, golden
jnp path otherwise. Parity: tests/test_pallas.py (interpret mode on CPU) and
the identical check compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from levelsetfusion_tpu.ops.interpolation import TRUNCATION_FILL, warp_field

# Default maximum supported x/y displacement magnitude (voxels), static.
MAX_DISPLACEMENT = 2
_LANE = 128


def k3(max_displacement):
    """Normalize the static clamp to per-axis ``(kx, ky, kz)``.

    Scalar K keeps the historical isotropic semantics. A per-axis tuple
    prices each axis separately — the y clamp sets the stacked-copy count
    (2·ky+2, the dominant HBM/VMEM term), the x clamp the window width,
    and the z clamp only the multi-slab gather reach — so anisotropic
    motion (e.g. config-4's (2.5, 1.3, 5.3)-voxel measured max) pays for
    the axes that need it instead of cubing the worst one.
    """
    if isinstance(max_displacement, (tuple, list)):
        kx, ky, kz = (int(v) for v in max_displacement)
        return kx, ky, kz
    k = int(max_displacement)
    return k, k, k


def _tent(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _resample3d_kernel(
    s_ref, warp_ref, out_ref, tx_ref, ty_ref, *, k: int, xb: int,
    flags_ref=None,
):
    """One output block = (1 x-row, yb y, 128 z). See module docstring."""
    # program_id must be read OUTSIDE pl.when (unresolvable inside the cond).
    i = pl.program_id(1)
    r = i - (i // xb) * xb  # x row within the current x-chunk window

    if flags_ref is not None:
        # Narrow-band skip: when every value this step can read is the
        # truncation fill (+1), the tent/z weights sum to 1 so the output is
        # exactly +1 — skip the pair loop (60–85% of blocks in scene-like
        # TSDF volumes are fully truncated). flags_ref is a scalar-prefetch
        # operand: the whole (y_blocks, x) array sits in SMEM.
        flag = flags_ref[pl.program_id(0), pl.program_id(1)]

        @pl.when(flag != 0)
        def _skip():
            # iota-derived fill: array constants cannot be lowered in kernels
            ones = (
                jax.lax.broadcasted_iota(jnp.int32, out_ref.shape[1:], 0) >= 0
            ).astype(out_ref.dtype)
            out_ref[0] = ones * TRUNCATION_FILL

        @pl.when(flag == 0)
        def _full():
            _resample3d_body(s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, r)

        return
    _resample3d_body(s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, r)


def _resample3d_body(s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, r):
    kx, ky, _ = k3(k)
    n_x = 2 * kx + 2
    n_y = 2 * ky + 2
    # warp arrives component-major (3, x, y, z): a trailing component dim
    # would be lane-padded 3 -> 128 in VMEM (42x window DMA inflation).
    ux = jnp.clip(warp_ref[0, 0], -float(kx), float(kx))
    uy = jnp.clip(warp_ref[1, 0], -float(ky), float(ky))
    uz = warp_ref[2, 0]
    nz = jnp.floor(uz)
    fz = uz - nz
    z0 = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + nz.astype(jnp.int32)
    z0c = jnp.clip(z0, 0, _LANE - 1)
    z1c = jnp.clip(z0 + 1, 0, _LANE - 1)
    # Corner weights with out-of-band reads (z) redirected to the +1 fill.
    w0 = jnp.where((z0 >= 0) & (z0 < _LANE), 1.0 - fz, 0.0)
    w1 = jnp.where((z0 + 1 >= 0) & (z0 + 1 < _LANE), fz, 0.0)
    # Static-shift tent planes (no dynamic scalars in vector math — the 7.6
    # µs/op scalar→vector stall; see module docstring).
    for c in range(n_x):
        tx_ref[c] = _tent(ux - (float(c) - float(kx)))
    for c in range(n_y):
        ty_ref[c] = _tent(uy - (float(c) - float(ky)))

    # Active-shift ranges: tent(u − (c − k)) is nonzero only for the two
    # shifts bracketing u, so per block only shifts in
    # [floor(min u)+k, floor(max u)+k+1] contribute — every skipped (cy, cx)
    # pair has an exactly-zero weight plane. Smooth solver warps activate
    # ~2×2 of the (2K+2)² pairs; the loop bounds are dynamic scalars, which
    # is fine (they never enter vector math).
    lo_x = jnp.floor(jnp.min(ux)).astype(jnp.int32) + kx
    hi_x = jnp.floor(jnp.max(ux)).astype(jnp.int32) + kx + 1
    lo_y = jnp.floor(jnp.min(uy)).astype(jnp.int32) + ky
    hi_y = jnp.floor(jnp.max(uy)).astype(jnp.int32) + ky + 1
    cnt_x = hi_x - lo_x + 1
    cnt_y = hi_y - lo_y + 1

    def body(t, acc):
        cy = lo_y + t // cnt_x
        cx = lo_x + (t - (t // cnt_x) * cnt_x)
        rows = s_ref[cy, r + cx]  # dynamic leading-dim indices: vreg-speed
        w = ty_ref[cy] * tx_ref[cx]
        g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
            rows, z1c, axis=1
        )
        return acc + w * g

    acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL  # tent weights sum to 1
    out_ref[0] = jax.lax.fori_loop(0, cnt_y * cnt_x, body, acc0)


def _resample3d_kernel_mz(
    s_ref, warp_ref, out_ref, tx_ref, ty_ref, *, k: int, xb: int, m: int,
    flags_ref=None,
):
    """Multi-slab z variant (z extent = m·128, m ≥ 2). Differences from the
    single-slab kernel: z displacements are **clamped to ±K** like x/y (the
    documented fast-path semantics for large volumes), and each output slab
    gathers from a ``ws``-slab window of the stacked array. The window shift
    is made STATIC per branch (zb==0 / interior / zb==m−1 via lax.cond) so no
    dynamic scalar ever enters vector math (the 7.6 µs/op stall)."""
    zb = pl.program_id(0)
    i = pl.program_id(2)
    r = i - (i // xb) * xb

    if flags_ref is not None:
        # Narrow-band skip (see the single-slab kernel); flags carry a
        # leading z-slab axis here.
        flag = flags_ref[zb, pl.program_id(1), i]

        @pl.when(flag != 0)
        def _skip():
            ones = (
                jax.lax.broadcasted_iota(jnp.int32, out_ref.shape[1:], 0) >= 0
            ).astype(out_ref.dtype)
            out_ref[0] = ones * TRUNCATION_FILL

        @pl.when(flag == 0)
        def _full():
            _resample3d_body_mz(
                s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, m, zb, r
            )

        return
    _resample3d_body_mz(s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, m, zb, r)


def _resample3d_body_mz(s_ref, warp_ref, out_ref, tx_ref, ty_ref, k, m, zb, r):
    kx, ky, kz = k3(k)
    n_x = 2 * kx + 2
    n_y = 2 * ky + 2
    ws = min(m, 3)

    ux = jnp.clip(warp_ref[0, 0], -float(kx), float(kx))
    uy = jnp.clip(warp_ref[1, 0], -float(ky), float(ky))
    uz = jnp.clip(warp_ref[2, 0], -float(kz), float(kz))
    nz = jnp.floor(uz)
    fz = uz - nz
    zrel = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + nz.astype(jnp.int32)

    for c in range(n_x):
        tx_ref[c] = _tent(ux - (float(c) - float(kx)))
    for c in range(n_y):
        ty_ref[c] = _tent(uy - (float(c) - float(ky)))

    lo_x = jnp.floor(jnp.min(ux)).astype(jnp.int32) + kx
    hi_x = jnp.floor(jnp.max(ux)).astype(jnp.int32) + kx + 1
    lo_y = jnp.floor(jnp.min(uy)).astype(jnp.int32) + ky
    hi_y = jnp.floor(jnp.max(uy)).astype(jnp.int32) + ky + 1
    cnt_x = hi_x - lo_x + 1
    cnt_y = hi_y - lo_y + 1

    def variant(shift: int, first: bool, last: bool):
        # All scalars static inside a branch. Window index of corner 0:
        z0 = zrel + shift  # static add
        z1 = z0 + 1
        # In-volume weights: global z = window z + zs·128; the only global
        # edges reachable (|uz| ≤ K) are at the first/last slab.
        ok0 = jnp.ones_like(fz, dtype=bool)
        ok1 = ok0
        if first:
            ok0 = z0 >= 0
            ok1 = z1 >= 0
        if last:
            ok0 = ok0 & (z0 < ws * _LANE)
            ok1 = ok1 & (z1 < ws * _LANE)
        w0 = jnp.where(ok0, 1.0 - fz, 0.0)
        w1 = jnp.where(ok1, fz, 0.0)
        # Slabs statically reachable from [shift − kz, shift + 127 + kz + 1].
        slabs = [
            s for s in range(ws)
            if shift - kz <= (s + 1) * _LANE - 1
            and shift + _LANE + kz >= s * _LANE
        ]

        def gather_window(rows, zi):
            val = None
            for s in slabs:
                g = jnp.take_along_axis(
                    rows[:, s * _LANE : (s + 1) * _LANE],
                    jnp.clip(zi - s * _LANE, 0, _LANE - 1),
                    axis=1,
                )
                if val is None:
                    val = g
                else:
                    val = jnp.where(zi >= s * _LANE, g, val)
            return val

        def body(t, acc):
            cy = lo_y + t // cnt_x
            cx = lo_x + (t - (t // cnt_x) * cnt_x)
            rows = s_ref[cy, r + cx]
            w = ty_ref[cy] * tx_ref[cx]
            g = w0 * gather_window(rows, z0) + w1 * gather_window(rows, z1)
            return acc + w * g

        acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
        return jax.lax.fori_loop(0, cnt_y * cnt_x, body, acc0)

    if m == 2:
        out = jax.lax.cond(
            zb == 0,
            lambda: variant(0, True, False),
            lambda: variant(_LANE, False, True),
        )
    else:
        out = jax.lax.cond(
            zb == 0,
            lambda: variant(0, True, False),
            lambda: jax.lax.cond(
                zb == m - 1,
                lambda: variant(2 * _LANE, False, True),
                lambda: variant(_LANE, False, False),
            ),
        )
    out_ref[0] = out


def _pick_block(size: int, candidates) -> int:
    for c in candidates:
        if c <= size and size % c == 0:
            return c
    return 0


# Double-buffered Element-window budget for the stacked input: leaves room
# for the other pipelined blocks + scratch inside the 128 MB v5e VMEM (the
# kernel runs with vmem_limit_bytes=110 MB; large K values — the stacked
# array has 2K+2 copies — must shrink the x chunk to fit).
_WINDOW_BUDGET = 55 * 1024 * 1024


def _chunking(x_size: int, m: int = 1, n: tuple | int | None = None,
              yb: int | None = None) -> int:
    # Multi-slab windows are ws=3 lanes wide — halve the x chunk to fit VMEM.
    cands = (128, 64, 32, 16, 8, 4, 2, 1) if m == 1 else (64, 32, 16, 8, 4, 2, 1)
    if n is not None:
        n_x, n_y = (n, n) if isinstance(n, int) else n
    if n is not None and n_x > 8:
        # Large displacement windows (Kx > 3): big x chunks are strictly
        # worse — measured at 128³/K=6, xb=32 vs xb=8 is 520 s vs 67 s of
        # Mosaic compile AND 2.97 vs 2.69 ms/iter of solve time (the wide
        # (xb+n_x−1)-row stacked windows blow up both the compiler and the
        # VMEM working set).
        cands = tuple(c for c in cands if c <= 8)
    if n is not None and yb is not None:
        ws = 1 if m == 1 else min(m, 3)
        fitting = tuple(
            c for c in cands
            if 2 * n_y * (c + n_x - 1) * yb * ws * _LANE * 4 <= _WINDOW_BUDGET
        ) or cands[-1:]
        cands = fitting
    xb = _pick_block(x_size, cands)
    if not xb:
        raise ValueError(f"x extent {x_size} has no supported chunking")
    return xb


def prepare_field(
    field: jnp.ndarray, max_displacement: int = MAX_DISPLACEMENT
) -> jnp.ndarray:
    """Build the stacked y-shifted copies the kernel consumes.

    Loop-invariant w.r.t. the warp — solvers call this ONCE per solve and
    reuse the result every iteration (the rebuild costs ~3.7 ms/iter at 128³
    otherwise; XLA does not hoist it out of ``while_loop``).
    """
    kx, ky, _ = k3(max_displacement)
    n_x = 2 * kx + 2
    n_y = 2 * ky + 2
    assert field.ndim == 3, field.shape
    x_size, y_size, z_size = field.shape
    xb = _chunking(x_size, z_size // _LANE)
    # Pad x/y by (k, k+1) with the truncation fill; padded row (i + c) along
    # x (or a y-copy shifted by c) = original row (i + c - k).
    padded = jnp.pad(
        field, ((kx, kx + 1), (ky, ky + 1), (0, 0)),
        constant_values=TRUNCATION_FILL,
    )
    # Stacked y-shifted copies: S[cy, x, y, z] = original[x - kx, y + cy - ky, z].
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(n_y)])
    # _chunking only returns divisors of x_size, so the stacked x extent
    # (x_size + n_x - 1) already covers every chunk window of size xb + n_x - 1.
    assert stacked.shape[1] == x_size + n_x - 1, (stacked.shape, x_size, xb)
    return stacked


@functools.partial(
    jax.jit,
    static_argnames=("x_size", "y_block", "max_displacement", "x_start"),
)
def compute_skip_flags(
    stacked: jnp.ndarray,
    x_size: int,
    y_block: int,
    max_displacement: int = MAX_DISPLACEMENT,
    x_start: int = 0,
) -> jnp.ndarray:
    """Narrow-band skip flags for the resample kernel.

    Single-slab (z = 128): flag[j, i] = 1 iff every value reachable from
    output block (j, i) — stacked rows i..i+2K+1, the j-th y block, all z —
    equals the truncation fill, in which case the kernel writes +1 without
    running the pair loop. Multi-slab (z = m·128 > 128): flags gain a
    leading z-slab axis, flag[zb, j, i], with reachability over that output
    slab's ws-slab gather window. Loop-invariant (depends only on the live
    field): compute once per solve.
    """
    n_x = 2 * k3(max_displacement)[0] + 2
    y_size = stacked.shape[2]
    z_size = stacked.shape[3]
    m = z_size // _LANE
    yb = min(y_block, y_size)
    # min over shift copies -> (xpad, y, z); then per y block and z slab.
    rowmin = jnp.min(stacked, axis=0)
    blockmin = jnp.min(
        rowmin.reshape(rowmin.shape[0], y_size // yb, yb, m, _LANE),
        axis=(2, 4),
    )  # (xpad, y_blocks, m)
    # sliding min over the n-row x window.
    winmin = functools.reduce(
        jnp.minimum,
        [blockmin[x_start + c : x_start + c + x_size] for c in range(n_x)]
    )  # (x, y_blocks, m)
    if m == 1:
        return (winmin[..., 0].T >= TRUNCATION_FILL - 1e-6).astype(jnp.int32)
    # Multi-slab: min over each output slab's gather window
    # [clip(zb-1, 0, m-ws), +ws).
    ws = min(m, 3)
    slabmin = jnp.stack(
        [
            jnp.min(winmin[..., min(max(zb - 1, 0), m - ws):][..., :ws], axis=-1)
            for zb in range(m)
        ]
    )  # (m, x, y_blocks)
    return (
        jnp.transpose(slabmin, (0, 2, 1)) >= TRUNCATION_FILL - 1e-6
    ).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_displacement", "y_block", "interpret", "x_start",
        "component_major",
    ),
)
def warp_field_pallas_prepared(
    stacked: jnp.ndarray,
    warp: jnp.ndarray,
    max_displacement: int = MAX_DISPLACEMENT,
    y_block: int = 64,
    interpret: bool = False,
    skip_flags: jnp.ndarray | None = None,
    x_start: int = 0,
    component_major: bool = False,
) -> jnp.ndarray:
    """Resample from a ``prepare_field`` result (3D only).

    z extent must be a multiple of 128. For z == 128 per-voxel z
    displacements are unbounded; for larger volumes (m = z/128 slabs > 1)
    z is clamped to ±K like x/y (documented fast-path semantics).

    ``x_start``: output row i samples field row ``x_start + i + ux`` — lets
    callers resample an interior x window of a wider prepared field without
    padding the warp (the sharded solver's haloed live block).

    ``component_major``: the warp is already ``(3, x, y, z)`` (the layout the
    kernel wants and the fused gradient kernel produces) — skips the
    moveaxis.
    """
    k = k3(max_displacement)
    n_x = 2 * k[0] + 2
    n_y = 2 * k[1] + 2
    if component_major:
        x_size, y_size, z_size = warp.shape[1:]
    else:
        x_size, y_size, z_size = warp.shape[:3]
    if z_size % _LANE:
        raise ValueError(f"z extent {z_size} not a multiple of {_LANE}")
    m = z_size // _LANE
    yb = min(y_block, y_size)
    if y_size % yb:
        yb = pick_y_block((x_size, y_size, z_size))  # auto: largest that divides
    if y_size % yb:
        raise ValueError(f"y extent {y_size} not divisible by y_block {yb}")
    xb = _chunking(x_size, m, (n_x, n_y), yb)
    win = xb + n_x - 1
    ws = min(m, 3)
    field_ext = stacked.shape[1] - (n_x - 1)
    if x_start + x_size > field_ext:
        raise ValueError(
            f"x window [{x_start}, {x_start + x_size}) exceeds prepared "
            f"field extent {field_ext}"
        )
    warp_cm = warp if component_major else jnp.moveaxis(warp, -1, 0)

    if m == 1:
        if skip_flags is None:
            kern = functools.partial(_resample3d_kernel, k=k, xb=xb)
        else:
            def kern(flags_ref, s_ref, warp_ref, out_ref, tx_ref, ty_ref,
                     k=k, xb=xb):
                _resample3d_kernel(
                    s_ref, warp_ref, out_ref, tx_ref, ty_ref,
                    k=k, xb=xb, flags_ref=flags_ref,
                )
        grid = (y_size // yb, x_size)  # x fastest: stacked window DMAs rarely
        s_spec = pl.BlockSpec(
            # All-Element block: x window start advances by xb every xb
            # steps (so the big window DMAs once per chunk, not per step);
            # y/lane starts stay tile-aligned as Element requires.
            (pl.Element(n_y), pl.Element(win), pl.Element(yb),
             pl.Element(_LANE)),
            lambda j, i, *_, xb=xb, yb=yb, xs=x_start: (0, (i // xb) * xb + xs, j * yb, 0),
            memory_space=pltpu.VMEM,
        )
        w_spec = pl.BlockSpec(
            (3, 1, yb, _LANE), lambda j, i, *_: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        )
        o_spec = pl.BlockSpec(
            (1, yb, _LANE), lambda j, i, *_: (i, j, 0), memory_space=pltpu.VMEM
        )
    else:
        if skip_flags is None:
            kern = functools.partial(_resample3d_kernel_mz, k=k, xb=xb, m=m)
        else:
            def kern(flags_ref, s_ref, warp_ref, out_ref, tx_ref, ty_ref,
                     k=k, xb=xb, m=m):
                _resample3d_kernel_mz(
                    s_ref, warp_ref, out_ref, tx_ref, ty_ref,
                    k=k, xb=xb, m=m, flags_ref=flags_ref,
                )
        grid = (m, y_size // yb, x_size)  # z-slab slowest
        s_spec = pl.BlockSpec(
            (pl.Element(n_y), pl.Element(win), pl.Element(yb),
             pl.Element(ws * _LANE)),
            lambda zb, j, i, *_, xb=xb, yb=yb, m=m, ws=ws, xs=x_start: (
                0,
                (i // xb) * xb + xs,
                j * yb,
                jnp.clip(zb - 1, 0, m - ws) * _LANE,
            ),
            memory_space=pltpu.VMEM,
        )
        w_spec = pl.BlockSpec(
            (3, 1, yb, _LANE), lambda zb, j, i, *_: (0, i, j, zb),
            memory_space=pltpu.VMEM,
        )
        o_spec = pl.BlockSpec(
            (1, yb, _LANE), lambda zb, j, i, *_: (i, j, zb),
            memory_space=pltpu.VMEM,
        )

    scratch = [
        pltpu.VMEM((n_x, yb, _LANE), jnp.float32),  # tent x planes
        pltpu.VMEM((n_y, yb, _LANE), jnp.float32),  # tent y planes
    ]
    out_shape = jax.ShapeDtypeStruct((x_size, y_size, z_size), stacked.dtype)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    if skip_flags is not None:
        # Scalar-prefetch grid spec: the whole flags array rides in SMEM and
        # the kernel indexes it by program ids (tiny per-block SMEM windows
        # are rejected by the TPU lowering).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[s_spec, w_spec],
            out_specs=o_spec,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=cparams,
            interpret=interpret,
        )(skip_flags, stacked, warp_cm)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[s_spec, w_spec],
        out_specs=o_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=cparams,
        interpret=interpret,
    )(stacked, warp_cm)


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "y_block", "interpret")
)
def warp_field_pallas(
    field: jnp.ndarray,
    warp: jnp.ndarray,
    max_displacement: int = MAX_DISPLACEMENT,
    y_block: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas trilinear/bilinear warp resample (see module docstring).

    Trailing spatial extent must be 128 (2D) or any multiple of 128 (3D;
    multi-slab kernel, z clamped to ±K when larger than 128). One-shot
    convenience over ``prepare_field`` + ``warp_field_pallas_prepared`` —
    solvers should prepare once per solve instead.
    """
    d = field.ndim
    if (field.shape[-1] != _LANE) if d == 2 else (field.shape[-1] % _LANE):
        raise ValueError(
            f"pallas resample needs trailing extent {_LANE} (2D) or a "
            f"multiple of it (3D), got {field.shape}"
        )
    if d == 2:
        # Treat a 2D (X, Z) field as (X, Y=1, Z) with zero y-displacement.
        field3 = field[:, None, :]
        warp3 = jnp.concatenate(
            [warp[..., :1], jnp.zeros_like(warp[..., :1]), warp[..., 1:]],
            axis=-1,
        )[:, None, :, :]
        out = warp_field_pallas(
            field3,
            warp3,
            max_displacement=max_displacement,
            y_block=1,
            interpret=interpret,
        )
        return out[:, 0, :]
    assert d == 3, field.shape
    stacked = prepare_field(field, max_displacement)
    return warp_field_pallas_prepared(
        stacked,
        warp,
        max_displacement=max_displacement,
        y_block=y_block,
        interpret=interpret,
    )


def pallas_resample_supported(field: jnp.ndarray, interpret: bool = False) -> bool:
    if not (interpret or jax.devices()[0].platform == "tpu"):
        return False
    return field.ndim in (2, 3) and (
        field.shape[-1] == _LANE
        if field.ndim == 2
        else (field.shape[-1] % _LANE == 0 and field.shape[1] % 8 == 0)
    )


def pick_y_block(shape) -> int:
    if len(shape) == 2:
        return 1
    return 64 if shape[1] % 64 == 0 else (32 if shape[1] % 32 == 0 else 8)


def warp_field_fast(
    field: jnp.ndarray,
    warp: jnp.ndarray,
    max_displacement: int = MAX_DISPLACEMENT,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel when supported (TPU, lane-width trailing dim),
    golden jnp path otherwise."""
    if pallas_resample_supported(field, interpret):
        return warp_field_pallas(
            field, warp, max_displacement, y_block=pick_y_block(field.shape),
            interpret=interpret,
        )
    return warp_field(field, warp)
