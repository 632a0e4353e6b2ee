"""Distributed warp solve with block-local inner iterations and a
Schur-complement-style reduction of the boundary (interface) unknowns —
the BASELINE north_star's mandated distributed structure ("solve the
distributed warp-field update via block-local iterations with
Schur-complement-style reduction of boundary unknowns across hosts").

Formulation
-----------

The volume is partitioned into contiguous voxel blocks along axis 0, one per
device. Write the warp unknowns as ``u = (u_I, u_Γ)``: interior unknowns per
block and the interface unknowns Γ (the two rows straddling each block cut).
One **outer step** is:

1. **Halo exchange** (1 neighbor ``ppermute`` round): each block receives 2
   fresh warp ghost rows per side — the only place neighbor state enters.
2. **Block-local inner iterations** (``T`` of them, ZERO collectives): plain
   gradient descent on the full energy restricted to the block, with the
   ghost rows *frozen* — an additive-Schwarz sweep. The Sobolev filter runs
   block-locally (zero ghosts). The resample reads the block's wide live
   halo, exchanged once per solve exactly as in ``parallel.sharded``.
3. **Interface reduction** (1 ``ppermute`` round): with the interiors held
   at their inner-iterated values (i.e. eliminated from the update system —
   the Schur reduction onto Γ), the update for each cut's row pair
   ``(u_L, u_R)`` solves the *implicit* coupled system

       (I + a·A₂) δ = d,      A₂ = [[2, −1], [−1, 2]],

   per voxel column and warp component, where ``d`` is the explicit descent
   direction ``−η·g`` each side computed locally, ``a = η·w_smooth·κ_c``
   is the smoothing operator's cut-coupling strength (κ_c = 1 for Tikhonov;
   (1+γ) + [c==0] for the damped Killing operator, whose ∇(∇·u) adds an
   extra ∂ₓₓ coupling on the x component), and A₂ is the interface block of
   the (negated) 1D second-difference operator — exactly what remains of
   the smoothing coupling across the cut after interior elimination. The
   2×2 solve is closed-form:

       δ_own = ((1+2a)·d_own + a·d_nbr) / ((1+2a)² − a²)

   Each side solves the same system redundantly from the exchanged edge
   directions, so no second round trip is needed. The explicit update the
   edge rows took in the last inner iteration is replaced by δ.
4. **Global reduction** (1 fused ``psum``/``pmax`` round): term energies and
   the max/mean warp-update statistics → outer convergence test (same
   criterion as the synchronous solver: global max per-voxel update below
   the threshold).

Fixed point
-----------

At a joint fixed point the halo exchange is a no-op and the raw gradient is
zero on every block *including* the rows adjacent to cuts (their gradient is
evaluated with the true neighbor values delivered in step 1), any linear
filter of it is zero, and δ solves (I+aA₂)δ = 0 ⇒ δ = 0 — i.e. the scheme's
fixed points are exactly the synchronous solver's stationary points. The
parity test asserts convergence to the synchronous fixed point within float
tolerance on smooth cases.

Collectives
-----------

Per outer step: 2 neighbor ppermute rounds + 1 fused psum/pmax round,
amortized over ``T`` inner iterations — vs the synchronous solver's
per-iteration warp-halo ppermute + Sobolev-halo ppermute + psum×3 + pmax.
``tests/test_schur.py`` counts the collective primitives in both solvers'
loop-body jaxprs and asserts the ≥T×/3-ish reduction; telemetry records
inner/outer iteration counts.

Why this solver is 1D (and what covers pod-scale 2D meshes)
-----------------------------------------------------------

The Schur reduction exists for the LATENCY-dominated regime: its byte
savings are secondary (halo traffic is already ≤6% of compute at
production shard sizes — parallel/scaling.py), but it cuts neighbor-
exchange ROUNDS per unit of convergence ~T×, which matters when round
latency is large relative to per-iteration compute: small shards, or a
mesh axis that crosses a DCN slice boundary (~100 µs rounds vs ICI's
~µs). On a pod slice the natural composition is therefore
**Schur along the slowest axis × sync along the fast axis**: e.g. a
(hosts, chips) mesh runs this solver's outer structure across hosts/DCN
and the 2D-mesh sync solver (parallel/sharded2d) within the slice, where
predict_efficiency already puts the sync solver >90% at per-chip blocks
≥ (32, 256, 128). A full 2D Schur (both cut families reduced) would add
a corner system coupling the four blocks at each mesh vertex through the
Killing term's mixed ∂ₓ∂_y divergence coupling; per-axis sequential
reduction (axis-0 cuts, then axis-1 cuts) preserves the fixed-point
property below — at a joint fixed point every per-axis δ solves
(I+aA₂)δ=0 ⇒ 0 — but the transient corner approximation buys nothing
while both axes ride ICI, so the composition above is the supported
production structure rather than a speculative 2D variant.

Reference anchor: BASELINE.json north_star; SURVEY.md §5 long-context row.
(file:line citations into /root/reference are impossible — empty mount.)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from levelsetfusion_tpu.models.params import SolverParams
from levelsetfusion_tpu.models.single_level import SolveResult, SolveTelemetry
from levelsetfusion_tpu.ops import sobolev as sobolev_ops
from levelsetfusion_tpu.ops.gradient import SmoothingMode
from levelsetfusion_tpu.parallel.halo import (
    halo_exchange,
    pmax_axis,
    psum_axis,
)
from levelsetfusion_tpu.parallel.sharded import (
    _block_gradient,
    pallas_block_supported,
    prepare_block_resample,
    resample_block_ext_cm,
)


def fused_schur_supported(params: SolverParams, canonical, n_local: int) -> bool:
    """Static gate for the fused gradient+update kernel in the Schur inner
    loop: the block-local Sobolev (``conv_local_x``) drops the x-halo need
    to the 2-ghost-row contract the interface reduction is built on."""
    if not (params.use_pallas_gradient and canonical.ndim == 3):
        return False
    from levelsetfusion_tpu.ops.pallas.fused_gradient import fused_supported

    return fused_supported(
        (n_local + 4, canonical.shape[1], canonical.shape[2]),
        interpret=params.pallas_interpret,
        sobolev=params.sobolev_smoothing,
        x_lo=2,
        x_len=n_local,
        conv_local=True,
        sobolev_radius=params.sobolev_radius or 3,
    )

def schur_fast_paths(params: SolverParams, canonical, live_halo: int,
                     num_devices: int) -> tuple:
    """(use_fused, use_pallas_resample) exactly as
    ``solve_single_level_schur`` gates them (single source of truth for
    contract checks — the Schur resample always produces ghost=2 rows)."""
    n_local = canonical.shape[0] // num_devices
    lh = min(live_halo, n_local)
    use_fused = fused_schur_supported(params, canonical, n_local)
    use_pallas = pallas_block_supported(params, canonical, lh)
    return use_fused, use_pallas


# Neighbor-exchange (ppermute) rounds issued per outer step, by construction.
PPERMUTE_ROUNDS_PER_OUTER = 2  # warp halo + interface directions
REDUCTION_ROUNDS_PER_OUTER = 1  # fused psum/pmax for stats + termination


class SchurTelemetry(NamedTuple):
    """Per-OUTER-step log (entries past ``outer_steps`` are 0)."""

    data_energy: jnp.ndarray
    smoothing_energy: jnp.ndarray
    level_set_energy: jnp.ndarray
    max_warp_update: jnp.ndarray
    mean_warp_update: jnp.ndarray


class SchurResult(NamedTuple):
    warp: jnp.ndarray
    outer_steps: jnp.ndarray  # scalar int32
    inner_per_outer: int
    converged: jnp.ndarray
    telemetry: SchurTelemetry
    # Per-axis running max |u| over every warp any inner iteration resampled
    # with (pmax'd across shards) — the displacement-contract observable;
    # same semantics as SolveResult.max_abs_displacement so
    # utils.debug.check_displacement_contract covers this solver too.
    max_abs_displacement: jnp.ndarray | None = None

    @property
    def iterations(self):
        """Alias: telemetry rows are per OUTER step (logger/CLI compat)."""
        return self.outer_steps


@partial(
    jax.jit,
    static_argnames=(
        "params", "mesh", "axis_name", "live_halo", "inner_iterations",
    ),
)
def solve_single_level_schur(
    canonical: jnp.ndarray,
    live: jnp.ndarray,
    params: SolverParams = SolverParams(),
    *,
    mesh: Mesh,
    axis_name: str = "x",
    live_halo: int = 8,
    inner_iterations: int = 8,
    initial_warp: jnp.ndarray | None = None,
) -> SchurResult:
    """Schur-style distributed twin of ``solve_single_level_sharded``.

    ``params.max_iterations`` is the TOTAL inner-iteration budget; the outer
    loop runs at most ``ceil(max_iterations / inner_iterations)`` steps and
    terminates early once the global max warp update of an outer step's last
    inner iteration drops below ``params.convergence_threshold``.

    Adaptive learning-rate, if enabled, adapts once per outer step (on the
    globally reduced energy) — inner iterations see a constant rate.
    """
    nd = mesh.shape[axis_name]
    if canonical.shape[0] % nd:
        raise ValueError(
            f"axis 0 ({canonical.shape[0]}) must divide over {nd} devices"
        )
    n_local = canonical.shape[0] // nd
    live_halo = min(live_halo, n_local)
    min_halo = 3 if params.sobolev_smoothing else 2
    if n_local < min_halo:
        raise ValueError(
            f"local block of {n_local} rows too small for stencil halos"
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

    t_inner = inner_iterations
    n_outer = -(-params.max_iterations // t_inner)
    num_voxels = float(canonical.size)
    use_fused, use_pallas = schur_fast_paths(
        params, canonical, live_halo, nd
    )
    taps = ()
    if use_fused and params.sobolev_smoothing:
        from levelsetfusion_tpu.ops.pallas.fused_gradient import sobolev_taps

        taps = sobolev_taps(
            params.sobolev_kernel_size, params.sobolev_strength
        )
    x_global = canonical.shape[0]

    # Interface coupling strength per warp component (see module docstring).
    gamma = params.rigidity_enforcement_factor
    if params.smoothing_mode is SmoothingMode.KILLING:
        kappa = [(1.0 + gamma) + (1.0 if c == 0 else 0.0) for c in range(d)]
    else:
        kappa = [1.0] * d
    w_s = params.smoothing_term_weight

    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]

    def run(canon_blk, live_blk, warp0_blk):
        live_ext = halo_exchange(
            live_blk, live_halo, axis_name, nd, fill="truncation"
        )
        prepared = None
        if use_pallas:
            prepared = prepare_block_resample(
                live_ext, params, live_halo, n_local
            )
        idx = lax.axis_index(axis_name)
        canon_ext2 = None
        x_off = None
        if use_fused:
            # The fused kernel wants canonical on block + 2 ghost rows for
            # shape agreement only: ghost-row canonical values never reach an
            # interior output (conv_local_x zeroes beyond the interior and
            # the stats mask excludes ghosts), so an edge pad suffices — no
            # collective.
            canon_ext2 = jnp.concatenate(
                [canon_blk[:1], canon_blk, canon_blk[-1:]], axis=0
            )
            canon_ext2 = jnp.concatenate(
                [canon_ext2[:1], canon_ext2, canon_ext2[-1:]], axis=0
            )
            x_off = idx * n_local - 2

        zeros = jnp.zeros((n_outer,), canon_blk.dtype)
        init = (
            jnp.moveaxis(warp0_blk, -1, 0) if use_fused else warp0_blk,
            jnp.zeros((), jnp.int32),  # outer step
            jnp.full((), jnp.inf, canon_blk.dtype),  # last global max update
            jnp.asarray(params.learning_rate, canon_blk.dtype),
            jnp.full((), jnp.inf, canon_blk.dtype),  # prev outer energy
            SchurTelemetry(zeros, zeros, zeros, zeros, zeros),
            jnp.zeros((d,), canon_blk.dtype),  # running per-axis max |u|
        )

        def cond(state):
            _, s, max_up, _, _, _, _ = state
            return (s < n_outer) & (max_up >= params.convergence_threshold)

        # Component axis position: the fused path carries the warp
        # component-major (3, x, y, z) — the layout both Pallas kernels want.
        x_ax = 1 if use_fused else 0

        def _row(a, sl):
            return a[:, sl] if use_fused else a[sl]

        from levelsetfusion_tpu.models.single_level import _axis_max_abs

        def outer_body(state):
            warp, s, _, rate, prev_e, tel, max_disp = state

            # (1) one warp halo exchange; ghosts stay frozen through the
            # inner sweep.
            warp_ext = halo_exchange(
                warp, 2, axis_name, nd, fill="replicate", axis=x_ax
            )
            ghosts = (_row(warp_ext, slice(None, 2)),
                      _row(warp_ext, slice(-2, None)))

            # (2) block-local inner iterations — no collectives.
            if use_fused:
                from levelsetfusion_tpu.ops.pallas.fused_gradient import (
                    fused_gradient_update,
                )

                # The kernel reports each updated warp's per-axis max |u|
                # in its stats; seed with the warp entering the sweep.
                max_disp = jnp.maximum(
                    max_disp, _axis_max_abs(warp, use_fused)
                )

                def inner(_, carry):
                    w, _, _, md = carry
                    w_ext_cm = jnp.concatenate(
                        [ghosts[0], w, ghosts[1]], axis=1
                    )
                    warped_ext = resample_block_ext_cm(
                        w_ext_cm, live_ext, prepared, params, 2, n_local,
                        live_halo, axis_name,
                    )
                    new_w, stats = fused_gradient_update(
                        warped_ext,
                        canon_ext2,
                        w_ext_cm,
                        rate,
                        w_data=params.data_term_weight,
                        w_smooth=params.smoothing_term_weight,
                        w_ls=params.level_set_term_weight,
                        killing=(
                            params.smoothing_mode is SmoothingMode.KILLING
                        ),
                        gamma=params.rigidity_enforcement_factor,
                        band_union=params.band_union_only,
                        taps=taps,
                        interpret=params.pallas_interpret,
                        x_offset=x_off,
                        x_global=x_global,
                        x_lo=2,
                        x_len=n_local,
                        conv_local_x=True,
                    )
                    energies = (
                        stats.data_energy,
                        stats.smoothing_energy,
                        stats.level_set_energy,
                    )
                    md = jnp.maximum(md, stats.max_abs_u)
                    return (new_w, new_w - w, energies, md)
            else:

                def inner(_, carry):
                    w, _, _, md = carry
                    md = jnp.maximum(md, _axis_max_abs(w, use_fused))
                    # Neighbor ghosts stay frozen (that is the scheme), but
                    # GLOBAL-boundary ghosts are locally computable: refresh
                    # the replicate fill from the current edge row so the
                    # one-sided global-edge forms track the iterate (and
                    # match the fused kernel's masked edge forms exactly).
                    lo = jnp.where(
                        idx == 0,
                        jnp.broadcast_to(w[:1], ghosts[0].shape),
                        ghosts[0],
                    )
                    hi = jnp.where(
                        idx == nd - 1,
                        jnp.broadcast_to(w[-1:], ghosts[1].shape),
                        ghosts[1],
                    )
                    grad, energies = _block_gradient(
                        canon_blk, live_ext, w, params, kernel, axis_name,
                        nd, live_halo, prepared, warp_ghosts=(lo, hi),
                        local_only=True,
                    )
                    direction = -rate * grad
                    return (w + direction, direction, energies, md)

            dir0 = jnp.zeros_like(warp)
            e0 = (jnp.zeros((), canon_blk.dtype),) * 3
            warp, direction, (e_d, e_s, e_l), max_disp = lax.fori_loop(
                0, t_inner, inner, (warp, dir0, e0, max_disp)
            )

            # (3) interface reduction: exchange edge directions (one
            # ppermute round), solve the per-cut implicit 2×2 system, and
            # replace the edge rows' last explicit update with δ.
            d_first = _row(direction, slice(None, 1))
            d_last = _row(direction, slice(-1, None))
            if nd == 1:
                # No cuts on a mesh-of-1 axis: the interface solve is
                # bypassed below (idx==0 and idx==nd-1 both hold), so skip
                # the self-ppermute round entirely.
                nbr_last, nbr_first = d_last, d_first
            else:
                nbr_last = lax.ppermute(d_last, axis_name, fwd)
                nbr_first = lax.ppermute(d_first, axis_name, bwd)

            def solve2(d_own, d_nbr):
                # per-component closed-form (I + a·A₂)⁻¹ applied to (d_own,
                # d_nbr), returning δ_own.
                parts = []
                for c in range(d):
                    a = rate * w_s * kappa[c]
                    det = (1.0 + 2.0 * a) ** 2 - a * a
                    own = d_own[c] if use_fused else d_own[..., c]
                    nbr = d_nbr[c] if use_fused else d_nbr[..., c]
                    parts.append(((1.0 + 2.0 * a) * own + a * nbr) / det)
                return jnp.stack(parts, axis=0 if use_fused else -1)

            delta_first = solve2(d_first, nbr_last)
            delta_last = solve2(d_last, nbr_first)
            # Global edges have no cut: keep the explicit update there.
            delta_first = jnp.where(idx == 0, d_first, delta_first)
            delta_last = jnp.where(idx == nd - 1, d_last, delta_last)
            if use_fused:
                warp = warp.at[:, :1].add(delta_first - d_first)
                warp = warp.at[:, -1:].add(delta_last - d_last)
                direction = direction.at[:, :1].set(delta_first)
                direction = direction.at[:, -1:].set(delta_last)
            else:
                warp = warp.at[:1].add(delta_first - d_first)
                warp = warp.at[-1:].add(delta_last - d_last)
                direction = direction.at[:1].set(delta_first)
                direction = direction.at[-1:].set(delta_last)

            # (4) one fused global reduction: energies + update stats.
            ulen = jnp.sqrt(
                jnp.sum(direction * direction, axis=0 if use_fused else -1)
            )
            max_up = pmax_axis(jnp.max(ulen), axis_name, nd)
            mean_up = psum_axis(jnp.sum(ulen), axis_name, nd) / num_voxels
            e_d = psum_axis(e_d, axis_name, nd)
            e_s = psum_axis(e_s, axis_name, nd)
            e_l = psum_axis(e_l, axis_name, nd)

            energy = e_d + e_s + e_l
            if params.adaptive_learning_rate:
                rate = jnp.where(energy > prev_e, rate * 0.5, rate)

            tel = SchurTelemetry(
                data_energy=tel.data_energy.at[s].set(e_d),
                smoothing_energy=tel.smoothing_energy.at[s].set(e_s),
                level_set_energy=tel.level_set_energy.at[s].set(e_l),
                max_warp_update=tel.max_warp_update.at[s].set(max_up),
                mean_warp_update=tel.mean_warp_update.at[s].set(mean_up),
            )
            return (warp, s + 1, max_up, rate, energy, tel, max_disp)

        warp, s, max_up, _, _, tel, max_disp = lax.while_loop(
            cond, outer_body, init
        )
        max_disp = pmax_axis(
            jnp.maximum(max_disp, _axis_max_abs(warp, use_fused)),
            axis_name, nd,
        )
        if use_fused:
            warp = jnp.moveaxis(warp, 0, -1)
        return warp, s, max_up < params.convergence_threshold, tel, max_disp

    spec = P(axis_name)
    rep = P()
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(
            spec,
            rep,
            rep,
            SchurTelemetry(rep, rep, rep, rep, rep),
            rep,
        ),
        check_vma=False,
    )
    warp, outer_steps, converged, telemetry, max_disp = fn(
        canonical, live, initial_warp
    )
    return SchurResult(
        warp=warp,
        outer_steps=outer_steps,
        inner_per_outer=t_inner,
        converged=converged,
        telemetry=telemetry,
        max_abs_displacement=max_disp,
    )
