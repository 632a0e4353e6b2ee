"""Static communication accounting + ICI scaling model (BASELINE north_star
"≥80% scaling efficiency at N hosts").

Real multi-chip hardware is not available in this environment, but the
sharded solvers' communication volume is *statically knowable*: every
collective in ``parallel.sharded`` / ``parallel.schur`` moves a fixed
number of ghost planes per iteration, set by the stencil/filter radii and
the solver structure — there is no data-dependent communication anywhere.
This module computes those volumes exactly and combines them with a
measured single-chip iteration time and an assumed per-link ICI bandwidth
into a predicted N-chip scaling efficiency, with every assumption explicit
and parameterized. ``experiments/halo_overhead.py`` measures the 1-device-
mesh overhead (shard_map + layout cost with zero real ppermutes) on the
real chip; this model covers the part hardware absence leaves open.

Collective inventory (1D mesh, per device, per solver iteration; verified
against the loop-body jaxprs by tests/test_scaling.py):

- sync solver, fused-kernel path: ONE warp halo exchange of ``hx`` ghost
  rows per side (hx = 5 with Sobolev — stencil radius 2 + filter radius 3
  — else 2), 3 warp components. The Sobolev filter runs inside the fused
  kernel from the exchanged rows, so there is no second exchange.
- sync solver, jnp path: warp halo (2 rows) + with Sobolev a combined-
  gradient halo (3 rows), 3 components each.
- Schur solver, per OUTER step (amortized over T inner iterations): warp
  halo (2 rows) + interface directions (1 row), 3 components.
- Once per solve: live-field halo (``live_halo`` rows, 1 scalar channel) —
  amortized to zero over a long solve; included in per-solve totals.
- Per iteration both solvers fuse the energy/termination reductions into
  one psum/pmax round of ~6 scalars (bytes negligible; the ROUND counts —
  each is an ICI latency hit, ~1–10 µs on a slice — are reported).

The 2D mesh doubles the story along axis 1 with Y×(X_local)×Z ghost planes;
``comm_bytes_per_iteration`` handles both.
"""

from __future__ import annotations

import dataclasses
import math

from levelsetfusion_tpu.models.params import SolverParams

F32 = 4


def _stencil_halo(params: SolverParams) -> int:
    """Ghost rows the warp exchange needs per side per iteration."""
    return params.stencil_halo


@dataclasses.dataclass(frozen=True)
class CommBudget:
    """Per-device communication volume, bytes, send direction only (links
    are full-duplex; the matching receive rides the opposite direction of
    the neighbor's link)."""

    bytes_per_iteration: int  # neighbor ppermute traffic, steady-state
    bytes_once_per_solve: int  # live-field halo exchange
    ppermute_rounds_per_iteration: float  # may be fractional (Schur: 2/T)
    reduction_rounds_per_iteration: float

    def total_bytes(self, iterations: int) -> int:
        return self.bytes_per_iteration * iterations + self.bytes_once_per_solve


def comm_bytes_per_iteration(
    shape,
    mesh_shape,
    params: SolverParams,
    *,
    live_halo: int = 8,
    solver_kind: str = "sync",
    inner_iterations: int = 8,
    fused: bool = True,
    dtype_bytes: int = F32,
) -> CommBudget:
    """Exact per-device neighbor-exchange volume for one solver iteration.

    Args:
      shape: global (X, Y, Z) voxel volume.
      mesh_shape: (n0,) for the 1D mesh or (n0, n1) for the 2D mesh.
      solver_kind: "sync" | "schur" (1D mesh only).
      fused: fused-kernel path (one hx-row exchange) vs jnp path.
    """
    d = len(shape)
    if len(mesh_shape) == 1:
        n0, n1 = mesh_shape[0], 1
    else:
        n0, n1 = mesh_shape
    x_local = shape[0] // n0
    y_local = (shape[1] // n1) if d > 1 else 1
    z = shape[2] if d > 2 else 1
    plane0 = y_local * z  # voxels in one axis-0 ghost plane
    plane1 = x_local * z  # voxels in one axis-1 ghost plane (2D mesh)
    hx = _stencil_halo(params)

    def _warp_rows(rows: int) -> int:
        # ghost rows × 2 sides × d warp components, both mesh axes if 2D.
        v = rows * 2 * d * plane0
        if n1 > 1:
            v += rows * 2 * d * plane1
        return v * dtype_bytes

    live_once = live_halo * 2 * plane0 * dtype_bytes
    if n1 > 1:
        live_once += live_halo * 2 * plane1 * dtype_bytes

    if solver_kind == "schur":
        if n1 > 1:
            raise ValueError("the Schur solver runs on the 1D mesh")
        per_outer = _warp_rows(2) + _warp_rows(1)  # halo + interface dirs
        return CommBudget(
            bytes_per_iteration=math.ceil(per_outer / inner_iterations),
            bytes_once_per_solve=live_once,
            ppermute_rounds_per_iteration=2.0 / inner_iterations,
            reduction_rounds_per_iteration=1.0 / inner_iterations,
        )

    if fused:
        per_iter = _warp_rows(hx)
        rounds = 1.0 if n1 == 1 else 2.0
    else:
        per_iter = _warp_rows(2)
        rounds = 1.0 if n1 == 1 else 2.0
        if params.sobolev_smoothing:
            per_iter += _warp_rows(3)  # combined-gradient halo
            rounds += 1.0 if n1 == 1 else 2.0
    return CommBudget(
        bytes_per_iteration=per_iter,
        bytes_once_per_solve=live_once,
        ppermute_rounds_per_iteration=rounds,
        reduction_rounds_per_iteration=1.0,
    )


@dataclasses.dataclass(frozen=True)
class ScalingPrediction:
    n_devices: int
    compute_s_per_iteration: float
    comm_s_per_iteration: float
    latency_s_per_iteration: float
    efficiency: float
    assumptions: dict


def predict_efficiency(
    shape,
    mesh_shape,
    params: SolverParams,
    compute_s_per_iteration: float,
    *,
    live_halo: int = 8,
    solver_kind: str = "sync",
    inner_iterations: int = 8,
    fused: bool = True,
    link_bytes_per_s: float = 4.5e10,
    round_latency_s: float = 5e-6,
    overlap: float = 0.0,
) -> ScalingPrediction:
    """Predicted N-chip scaling efficiency for the sharded warp solve.

    Model: per iteration each device sends its ghost planes to both
    neighbors. A TPU v5e chip has one ICI link per torus direction at
    ~45 GB/s each way [assumption: public v5e figure; parameterize
    ``link_bytes_per_s`` for other generations]; the two sides of an axis
    use different links, so the serialized transfer time is the one-side
    volume over one link. Reduction/ppermute rounds each cost
    ``round_latency_s`` (ICI latency, microseconds on a slice — dominant
    only for tiny shards). ``overlap`` ∈ [0, 1] credits compute/comm
    overlap (0 = fully serialized, conservative: the current solvers issue
    the exchange at the head of the iteration with no double buffering
    across iterations).

    Efficiency = t_compute / (t_compute + (1−overlap)·t_comm + t_latency):
    per-device compute is constant in N (the volume shards), so the only
    deviation from linear scaling is the (N-independent) halo traffic —
    this is the weak-scaling-flat regime the ≥80% target lives in. The
    model is per-iteration steady-state; the once-per-solve live halo and
    any DCN hop for multi-slice meshes are excluded (a DCN hop at ~25 GB/s
    would change link_bytes_per_s for the slice-boundary devices only).
    """
    b = comm_bytes_per_iteration(
        shape, mesh_shape, params, live_halo=live_halo,
        solver_kind=solver_kind, inner_iterations=inner_iterations,
        fused=fused,
    )
    one_side = b.bytes_per_iteration / 2.0
    t_comm = one_side / link_bytes_per_s
    t_lat = (
        b.ppermute_rounds_per_iteration + b.reduction_rounds_per_iteration
    ) * round_latency_s
    denom = compute_s_per_iteration + (1.0 - overlap) * t_comm + t_lat
    n = 1
    for m in mesh_shape:
        n *= m
    return ScalingPrediction(
        n_devices=n,
        compute_s_per_iteration=compute_s_per_iteration,
        comm_s_per_iteration=t_comm,
        latency_s_per_iteration=t_lat,
        efficiency=compute_s_per_iteration / denom,
        assumptions={
            "link_bytes_per_s": link_bytes_per_s,
            "round_latency_s": round_latency_s,
            "overlap": overlap,
            "bytes_per_iteration_send": b.bytes_per_iteration,
            "ppermute_rounds": b.ppermute_rounds_per_iteration,
        },
    )
