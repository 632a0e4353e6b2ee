"""Frame-to-canonical fusion (SURVEY.md §2.14, §3.3; BASELINE config 4).

The "fusion" in LevelSetFusion: after the non-rigid solve aligns live frame t
to the canonical frame, the warped live TSDF is blended into the canonical
field with truncation-aware running weighted averaging:

    w_t(v)   = 1  where |Φ_w(v)| < 1 (inside the observed narrow band)
    Φ_c(v)  ←  (W(v) Φ_c(v) + w_t(v) Φ_w(v)) / (W(v) + w_t(v))
    W(v)    ←  W(v) + w_t(v)

The per-frame loop is a host loop (frame count is dynamic, IO per frame);
each step — TSDF generation, warp solve, resample, blend — is a jitted
on-device program, with the warp warm-started from the previous frame.

Displacement contract (VERDICT r3 weak #1): warm-started warps grow
monotonically over a drifting sequence, straight toward the Pallas
resample's silent ±K clamp. Every frame therefore records the solve's
measured per-axis max |u| (``FrameReport.max_abs_displacement``), checks it
against the clamp via ``utils.debug.check_displacement_contract``, and —
with ``auto_raise_displacement`` on (default) — a violating frame is
**redone** from the same pre-blend state with K raised to cover the
measured motion (one recompile per raise; subsequent frames inherit the
raised K), so the fused canonical never silently absorbs clamped reads.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
import math
from typing import Callable, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from levelsetfusion_tpu.core.camera import PinholeCamera
from levelsetfusion_tpu.core.grid import GridSpec
from levelsetfusion_tpu.models.hierarchical import solve_hierarchical
from levelsetfusion_tpu.models.params import HierarchicalParams, SolverParams
from levelsetfusion_tpu.models.single_level import solve_single_level
from levelsetfusion_tpu.ops.interpolation import warp_field
from levelsetfusion_tpu.ops.tsdf import GenerationMethod, generate_tsdf_3d

TRUNCATION_EPS = 1e-5

_log = logging.getLogger("levelsetfusion_tpu.fusion")


class FusionState(NamedTuple):
    canonical: jnp.ndarray  # (*spatial,) running fused TSDF
    weights: jnp.ndarray  # (*spatial,) accumulated observation weights


class FrameReport(NamedTuple):
    frame_index: int
    solver_iterations: int
    final_data_energy: float
    band_voxels: int  # |Φ_c| < 1 count after fusion
    # Measured per-axis max |u| over every warp the frame's solve/blend
    # resampled with (voxel units) — the displacement-contract observable.
    max_abs_displacement: Tuple[float, ...] = ()
    # The Pallas clamp the frame actually ran under (0 = clamped kernel not
    # engaged; exact XLA gather). Scalar, or a per-axis (kx, ky, kz) tuple.
    pallas_max_displacement: int | tuple = 0
    # Contract-violation messages that survived auto-raise (empty = clean).
    contract_violations: Tuple[str, ...] = ()


class FusionResult(NamedTuple):
    state: FusionState
    reports: List[FrameReport]
    final_warp: jnp.ndarray


@jax.jit
def blend(state: FusionState, warped_live: jnp.ndarray) -> FusionState:
    """One truncation-aware weighted-average fusion update."""
    w_live = (jnp.abs(warped_live) < 1.0 - TRUNCATION_EPS).astype(
        warped_live.dtype
    )
    w_total = state.weights + w_live
    fused = jnp.where(
        w_total > 0.0,
        (state.weights * state.canonical + w_live * warped_live)
        / jnp.maximum(w_total, 1e-12),
        state.canonical,
    )
    return FusionState(canonical=fused, weights=w_total)


def init_state(first_field: jnp.ndarray) -> FusionState:
    w = (jnp.abs(first_field) < 1.0 - TRUNCATION_EPS).astype(first_field.dtype)
    return FusionState(canonical=first_field, weights=w)


@dataclasses.dataclass(frozen=True)
class FusionPipelineConfig:
    """Config for the multi-frame frame-to-canonical driver."""

    grid: GridSpec
    narrow_band_width_voxels: int = 20
    generation_method: GenerationMethod = GenerationMethod.BASIC
    hierarchical: bool = True
    solver: SolverParams = SolverParams(learning_rate=1.0, convergence_threshold=1e-3)
    levels: int = 3
    warm_start: bool = True
    # Displacement-contract enforcement: when the measured max |u| of a
    # frame's solve exceeds the Pallas resample's ±K clamp, redo the frame
    # (solve + blend, same pre-blend state) with K raised to cover it, and
    # keep the raised K for the rest of the sequence. One recompile per
    # raise. Off → the violation is only logged and reported.
    auto_raise_displacement: bool = True


def field_stub(shape):
    """Shape-only stand-in accepted by the static fast-path gates
    (``pallas_resample_supported`` and friends read only ndim/shape) —
    shared by every caller that gates without a real array."""
    import types

    return types.SimpleNamespace(ndim=len(shape), shape=tuple(shape))


class _MdOnly(NamedTuple):
    """Minimal displacement-contract carrier for the fused flat frame
    step (the full SolveResult never leaves the device)."""

    max_abs_displacement: object


def pallas_resample_engaged(solver: SolverParams, field) -> bool:
    """Whether the ±K-clamped Pallas resample actually runs for ``field``
    (mirrors the solver's static gate: platform + trailing-extent checks)."""
    if not (solver.use_pallas_resample and field.ndim == 3):
        return False
    from levelsetfusion_tpu.ops.pallas.resample import pallas_resample_supported

    return pallas_resample_supported(field, solver.pallas_interpret)


def _raised_k(md, k) -> tuple | int | None:
    """New clamp if measured per-axis max |u| exceeded the (possibly
    per-axis) K, else None. A scalar K raises to a scalar; a per-axis K
    raises only the violated axes."""
    md = np.asarray(md)
    if isinstance(k, (tuple, list)):
        ks = np.asarray(k, dtype=np.float64)[: md.shape[0]]
        if (md <= ks).all():
            return None
        return tuple(
            int(math.ceil(m)) + 1 if m > kv else int(kv)
            for m, kv in zip(md, ks)
        )
    worst = float(np.max(md))
    if worst <= k:
        return None
    return int(math.ceil(worst)) + 1


def _call_frame_callback(cb, t, state, warp, report, solver) -> None:
    """Invoke a frame callback, passing ``report``/``solver`` keywords when
    the callback accepts them (checkpoint hooks persist the auto-raised
    clamp through resume — VERDICT r4 weak #6); plain ``(t, state, warp)``
    callbacks keep working."""
    import inspect

    try:
        sig = inspect.signature(cb)
        params = sig.parameters.values()
        extended = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params
        ) or {"report", "solver"} <= set(sig.parameters)
    except (TypeError, ValueError):
        extended = False
    if extended:
        cb(t, state, warp, report=report, solver=solver)
    else:
        cb(t, state, warp)


def _k_engaged(k) -> bool:
    """Whether ``k`` denotes an engaged Pallas clamp. Explicit about the
    sentinel: None and the scalar 0 mean "exact gather ran"; a per-axis
    tuple is always a real clamp even if an axis is 0 (ADVICE r4 — tuple
    truthiness would silently disable the check)."""
    if k is None:
        return False
    if isinstance(k, (tuple, list)):
        return True
    return k != 0


def _frame_contract(res, k_used, name: str,
                    live_halo: int | None = None,
                    sharded_axes: tuple = (0,)) -> list:
    from levelsetfusion_tpu.utils.debug import check_displacement_contract

    return check_displacement_contract(
        res,
        pallas_max_displacement=k_used if _k_engaged(k_used) else None,
        live_halo=live_halo,
        sharded_axes=sharded_axes,
        name=name,
    )


def _pack_stats(res, state: FusionState):
    """Device-side packing for the ONE host fetch per frame (every
    transfer costs the remote-TPU round trip, ~24 ms): the int32 stats
    (band counts at 512³ overflow f32's 2^24 integer range, so they must
    not round-trip through float) and the f32 stats ride one INT32
    vector — the floats are bitcast into it, never the other way around:
    small ints bitcast to f32 are denormals, which TPU f32 ops flush to
    zero inside a fused program (measured: iteration counts arrived as 0
    when this packed into f32)."""
    ints = jnp.stack(
        [
            res.iterations.astype(jnp.int32),
            jnp.count_nonzero(
                jnp.abs(state.canonical) < 1.0 - TRUNCATION_EPS
            ).astype(jnp.int32),
        ]
    )
    floats = jnp.concatenate(
        [
            jnp.take(
                res.telemetry.data_energy, jnp.maximum(res.iterations - 1, 0)
            )[None],
            jnp.asarray(res.max_abs_displacement),
        ]
    )
    return jnp.concatenate(
        [ints, jax.lax.bitcast_convert_type(floats, jnp.int32)]
    )


def _unpack_stats(packed):
    host = np.asarray(packed)
    return host[:2], host[2:].view(np.float32)


def _fetch_stats(res, state: FusionState):
    return _unpack_stats(_pack_stats(res, state))


@partial(
    jax.jit,
    static_argnames=("solver", "camera", "grid", "nb_width", "method"),
)
def _flat_frame_core_from_depth(
    depth, canonical, weights, init_warp, solver: SolverParams,
    camera, grid, nb_width: int, method,
):
    """TSDF generation + solve + resample + blend + stats-pack as ONE
    device program: the whole flat fusion frame is a single dispatch
    round trip (plus the one stats fetch)."""
    live = generate_tsdf_3d(
        depth, camera, grid,
        narrow_band_width_voxels=nb_width, method=method,
    )
    state, warp, packed = _flat_frame_body(
        canonical, weights, live, init_warp, solver
    )
    return state, warp, packed


@partial(jax.jit, static_argnames=("solver",))
def _flat_frame_core(
    canonical, weights, live, init_warp, solver: SolverParams
):
    """Solve + resample + blend + stats-pack as ONE device program — one
    dispatch round trip per frame instead of three (the remote-TPU tunnel
    costs ~24 ms per dispatch chain; at 128³ the per-frame floor, not the
    compute, bounds fps — KERNEL_NOTES round 5)."""
    return _flat_frame_body(canonical, weights, live, init_warp, solver)


def _flat_frame_body(canonical, weights, live, init_warp, solver):
    res = solve_single_level(
        canonical, live, solver, initial_warp=init_warp
    )
    if solver.use_pallas_resample:
        from levelsetfusion_tpu.ops.pallas.resample import warp_field_fast

        warped = warp_field_fast(
            live, res.warp, solver.pallas_max_displacement,
            interpret=solver.pallas_interpret,
        )
    else:
        warped = warp_field(live, res.warp)
    state = blend(FusionState(canonical=canonical, weights=weights), warped)
    return state, res.warp, _pack_stats(res, state)


def _finalize_flat_frame(out, dispatch, solver, config, frame_index,
                         field=None):
    """Finalize one flat fusion frame: unpack the packed stats, derive the
    engaged clamp, auto-raise + redo ONCE via ``dispatch(raised_solver)``,
    run the displacement-contract check, and build the FrameReport.
    Returns ``(state, warp, report, solver, redone)``.

    THE single implementation of the guarded flat-frame semantics — shared
    by ``fuse_frame`` (serial + CLI resume) and ``fuse_sequence``'s
    pipelined loop so the two paths cannot diverge."""
    state, warp, packed = out
    ints, floats = _unpack_stats(packed)
    md = floats[1:]
    if field is None:
        field = field_stub(config.grid.shape)

    def _k(s):
        return (
            s.pallas_max_displacement
            if pallas_resample_engaged(s, field)
            else 0
        )

    k_used = _k(solver)
    new_k = _raised_k(md, k_used) if _k_engaged(k_used) else None
    redone = False
    if new_k is not None and config.auto_raise_displacement:
        _log.warning(
            "frame %d: measured max |u| %s exceeds the Pallas clamp K=%s — "
            "redoing the frame with K=%s",
            frame_index, np.round(md, 3).tolist(), k_used, new_k,
        )
        solver = solver.replace(pallas_max_displacement=new_k)
        state, warp, packed = dispatch(solver)
        ints, floats = _unpack_stats(packed)
        md = floats[1:]
        k_used = _k(solver)
        redone = True
    violations = _frame_contract(
        _MdOnly(md), k_used, name=f"fusion frame {frame_index}"
    )
    report = FrameReport(
        frame_index=frame_index,
        solver_iterations=int(ints[0]),
        final_data_energy=float(floats[0]),
        band_voxels=int(ints[1]),
        max_abs_displacement=tuple(float(v) for v in md),
        pallas_max_displacement=k_used,
        contract_violations=tuple(violations),
    )
    return state, warp, report, solver, redone


def fuse_frame(
    state: FusionState,
    live: jnp.ndarray,
    init_warp: jnp.ndarray,
    solver: SolverParams,
    config: FusionPipelineConfig,
    frame_index: int,
    depth=None,
    camera=None,
):
    """One flat-path fusion frame with the displacement contract enforced:
    solve → resample → blend → stats fetch → (on clamp violation, redo once
    with K raised). Returns ``(state, warp, report, solver)`` — the possibly
    K-raised ``solver`` is what subsequent frames should use.

    When ``depth``/``camera`` are given (and the pipeline is flat), TSDF
    generation folds into the same device program as the solve — the frame
    is ONE dispatch + ONE stats fetch; ``live`` may be None then.

    Shared by ``fuse_sequence`` and the CLI's checkpoint-resume loop.
    """
    prev_state = state
    if not config.hierarchical:
        if depth is not None:
            # One dispatch: TSDF gen + solve + clamped resample + blend +
            # stats pack, then the frame's single host fetch.
            def dispatch(s):
                return _flat_frame_core_from_depth(
                    depth, prev_state.canonical, prev_state.weights,
                    init_warp, s, camera, config.grid,
                    config.narrow_band_width_voxels,
                    config.generation_method,
                )
        else:
            def dispatch(s):
                return _flat_frame_core(
                    prev_state.canonical, prev_state.weights, live,
                    init_warp, s,
                )

        state, warp, report, solver, _ = _finalize_flat_frame(
            dispatch(solver), dispatch, solver, config, frame_index,
            field=live,
        )
        return state, warp, report, solver

    for attempt in (0, 1):
        hres = solve_hierarchical(
            prev_state.canonical,
            live,
            HierarchicalParams(levels=config.levels, base=solver),
            initial_warp=init_warp,
        )
        warp = hres.warp
        res = hres.level_results[-1]
        # The blend resample is the Pallas kernel when the fast path
        # is on (the XLA general gather costs ~192 ms at 128³); same
        # ±K clamp contract as the solve, verified by the stats below.
        if solver.use_pallas_resample:
            from levelsetfusion_tpu.ops.pallas.resample import (
                warp_field_fast,
            )

            warped = warp_field_fast(
                live, warp, solver.pallas_max_displacement,
                interpret=solver.pallas_interpret,
            )
        else:
            warped = warp_field(live, warp)
        state = blend(prev_state, warped)
        ints, floats = _fetch_stats(res, state)
        md = floats[1:]

        k_used = (
            solver.pallas_max_displacement
            if pallas_resample_engaged(solver, live)
            else 0
        )
        new_k = _raised_k(md, k_used) if _k_engaged(k_used) else None
        if new_k is None or not config.auto_raise_displacement or attempt:
            break
        _log.warning(
            "frame %d: measured max |u| %s exceeds the Pallas clamp K=%s — "
            "redoing the frame with K=%s",
            frame_index, np.round(md, 3).tolist(), k_used, new_k,
        )
        solver = solver.replace(pallas_max_displacement=new_k)

    violations = _frame_contract(
        res, k_used, name=f"fusion frame {frame_index}"
    )
    report = FrameReport(
        frame_index=frame_index,
        solver_iterations=int(ints[0]),
        final_data_energy=float(floats[0]),
        band_voxels=int(ints[1]),
        max_abs_displacement=tuple(float(v) for v in md),
        pallas_max_displacement=k_used,
        contract_violations=tuple(violations),
    )
    return state, warp, report, solver


def fuse_sequence_sharded(
    frames: Sequence[np.ndarray],
    camera: PinholeCamera,
    config: FusionPipelineConfig,
    *,
    mesh,
    axis_name: str = "x",
    mesh_axes: tuple | None = None,
    live_halo: int = 8,
    frame_callback: Callable[[int, FusionState, jnp.ndarray], None] | None = None,
) -> FusionResult:
    """Sharded twin of ``fuse_sequence`` (BASELINE configs 4 × 5): the
    canonical/weights state, the per-frame live TSDF, the warp, and every
    step — TSDF generation, the voxel-block-sharded warp solve, the
    resample, the blend — stay sharded across the whole sequence; nothing
    is ever gathered to one device.

    - TSDF generation runs under jit with a sharded output layout (GSPMD
      shards the per-voxel projection; the depth image is replicated).
    - The warp solve is ``parallel.sharded.solve_single_level_sharded``
      (ppermute halos, psum/pmax termination), warm-started per frame;
      with ``hierarchical=True`` the coarse-to-fine
      ``parallel.hierarchical.solve_hierarchical_sharded`` whose fine-level
      halos are sized from the measured coarse motion.
    - The fusion resample is ``parallel.sharded.warp_field_sharded`` with
      its halo sized from the frame's MEASURED max |u| (not the config's
      flat ``live_halo`` — the hierarchical path exists precisely for
      motion beyond it); when even a one-block halo cannot cover the
      motion, the blend falls back to the GSPMD gather, which is exact.
    - The blend is elementwise and keeps the state's sharding.

    ``mesh_axes``: pass ``("x", "y")`` with a 2D mesh to shard spatial axes
    0 AND 1 as true voxel blocks (parallel.sharded2d does the solve; the
    blend resample is the per-shard ``warp_field_sharded2d`` with its halo
    sized from the measured per-axis |u|, GSPMD gather only as the
    beyond-one-block fallback; per-frame contract checks cover both
    sharded axes). The 2D mesh composes with flat per-frame solves;
    coarse-to-fine stays on the 1D mesh (``hierarchical=True`` with a 2D
    mesh raises).

    Parity: tests/test_fusion_sharded.py asserts the final canonical equals
    the single-device ``fuse_sequence`` to float tolerance on both mesh
    shapes.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from levelsetfusion_tpu.parallel.sharded import (
        solve_single_level_sharded,
        warp_field_sharded,
    )

    if mesh_axes is None:
        mesh_axes = (axis_name,)
    two_d = len(mesh_axes) == 2
    if two_d and config.hierarchical:
        raise ValueError(
            "hierarchical sharded fusion runs on the 1D mesh; set "
            "hierarchical=False for the 2D voxel-block mesh"
        )
    grid = config.grid
    sharding = NamedSharding(mesh, P(*mesh_axes))
    nd = mesh.shape[mesh_axes[0]]
    n_local = grid.shape[0] // nd
    solver = config.solver

    def _gen(depth):
        return generate_tsdf_3d(
            depth,
            camera,
            grid,
            narrow_band_width_voxels=config.narrow_band_width_voxels,
            method=config.generation_method,
        )

    gen = jax.jit(_gen, out_shardings=sharding)

    frame_iter = iter(frames)
    state = init_state(gen(jnp.asarray(next(frame_iter))))
    d = grid.dim
    warp = jax.device_put(
        jnp.zeros(grid.shape + (d,), state.canonical.dtype), sharding
    )
    reports: List[FrameReport] = []

    for t, frame in enumerate(frame_iter, start=1):
        live = gen(jnp.asarray(frame))
        init_warp = warp if config.warm_start else jnp.zeros_like(warp)
        for attempt in (0, 1):
            level_halos = None
            if config.hierarchical:
                # Coarse-to-fine on the sharded volume: replicated coarse
                # levels absorb large inter-frame motion, the fine level runs
                # sharded with an adaptively sized live halo
                # (parallel.hierarchical).
                from levelsetfusion_tpu.parallel.hierarchical import (
                    solve_hierarchical_sharded,
                )

                hres = solve_hierarchical_sharded(
                    state.canonical,
                    live,
                    HierarchicalParams(levels=config.levels, base=solver),
                    mesh=mesh,
                    axis_name=axis_name,
                    min_live_halo=live_halo,
                    initial_warp=init_warp,
                )
                warp = jax.device_put(hres.warp, sharding)
                res = hres.level_results[-1]
                level_halos = hres.level_halos
            elif two_d:
                from levelsetfusion_tpu.parallel.sharded2d import (
                    solve_single_level_sharded2d,
                )

                res = solve_single_level_sharded2d(
                    state.canonical,
                    live,
                    solver,
                    mesh=mesh,
                    axis_names=mesh_axes,
                    live_halo=live_halo,
                    initial_warp=init_warp,
                )
                warp = res.warp
            else:
                res = solve_single_level_sharded(
                    state.canonical,
                    live,
                    solver,
                    mesh=mesh,
                    axis_name=axis_name,
                    live_halo=live_halo,
                    initial_warp=init_warp,
                )
                warp = res.warp

            # Small pre-blend fetch: iterations + final energy + measured
            # max |u| — md sizes the blend's halo and clamp below.
            ints = res.iterations.astype(jnp.int32)[None]
            floats = jnp.concatenate(
                [
                    jnp.take(
                        res.telemetry.data_energy,
                        jnp.maximum(res.iterations - 1, 0),
                    )[None],
                    jnp.asarray(res.max_abs_displacement),
                ]
            )
            ints, floats = (np.asarray(a) for a in jax.device_get((ints, floats)))
            md = floats[1:]

            # k_used comes from the gate the solver ACTUALLY used (ADVICE
            # r4: the whole-volume gate misattributes clamps when the
            # per-shard halo gate kept the solve on the exact jnp gather).
            if config.hierarchical:
                from levelsetfusion_tpu.parallel.hierarchical import (
                    level_k_used,
                )

                fine_halo = level_halos[-1] if level_halos else None
                k_used = level_k_used(
                    solver, grid.shape, fine_halo, (nd,)
                )
            elif two_d:
                from levelsetfusion_tpu.parallel.sharded2d import (
                    block2d_fast_paths,
                )

                _, eng = block2d_fast_paths(
                    solver, state.canonical, live_halo,
                    mesh.shape[mesh_axes[0]], mesh.shape[mesh_axes[1]],
                )
                k_used = solver.pallas_max_displacement if eng else 0
            else:
                from levelsetfusion_tpu.parallel.sharded import (
                    block_fast_paths,
                )

                _, eng = block_fast_paths(
                    solver, state.canonical, live_halo, nd
                )
                k_used = solver.pallas_max_displacement if eng else 0
            # Auto-raise: redo the frame with K raised to cover the
            # measured motion (hierarchical included — its FINE level runs
            # the clamped per-shard kernel too, ADVICE r4 medium).
            new_k = _raised_k(md, k_used) if _k_engaged(k_used) else None
            if new_k is None or not config.auto_raise_displacement or attempt:
                break
            _log.warning(
                "sharded fusion frame %d: measured max |u| %s exceeds the "
                "Pallas clamp K=%s — redoing the frame with K=%s",
                t, np.round(md, 3).tolist(), k_used, new_k,
            )
            solver = solver.replace(pallas_max_displacement=new_k)

        # Blend-resample halo sized from the MEASURED warp (ADVICE r3): the
        # gather reads up to ceil(|u|)+1 slices past a block face per
        # sharded axis. Quantize up to multiples of 4 so a drifting
        # sequence doesn't recompile the blend every frame; past one
        # block, fall back to the GSPMD gather (exact, slow).
        need_axes = [0, 1] if two_d else [0]
        need = max(int(math.ceil(float(md[a]))) + 2 for a in need_axes)
        blend_halo = max(live_halo, ((need + 3) // 4) * 4)
        blend_params = solver
        if _k_engaged(k_used) and _raised_k(md, solver.pallas_max_displacement):
            blend_params = solver.replace(
                pallas_max_displacement=_raised_k(
                    md, solver.pallas_max_displacement
                )
            )
        if two_d:
            # Per-shard 2D blend (VERDICT r4 weak #3): one corner-correct
            # two-axis halo exchange instead of the GSPMD general gather.
            from levelsetfusion_tpu.parallel.sharded2d import (
                warp_field_sharded2d,
            )

            n0 = grid.shape[0] // mesh.shape[mesh_axes[0]]
            n1 = grid.shape[1] // mesh.shape[mesh_axes[1]]
            if blend_halo > min(n0, n1):
                warped = jax.jit(warp_field)(live, warp)  # GSPMD, exact
            else:
                warped = warp_field_sharded2d(
                    live, warp, mesh=mesh, axis_names=mesh_axes,
                    live_halo=blend_halo, params=blend_params,
                )
        elif blend_halo > n_local:
            warped = jax.jit(warp_field)(live, warp)  # GSPMD gather, exact
        else:
            warped = warp_field_sharded(
                live, warp, mesh=mesh, axis_name=axis_name,
                live_halo=blend_halo, params=blend_params,
            )
        state = blend(state, warped)
        band = int(
            np.asarray(
                jnp.count_nonzero(
                    jnp.abs(state.canonical) < 1.0 - TRUNCATION_EPS
                ).astype(jnp.int32)
            )
        )

        # Contract check: flat solves against the flat halo; hierarchical
        # solves per level against the halo each level actually used
        # (None = replicated, no contract).
        violations: list = []
        if config.hierarchical and level_halos is not None:
            from levelsetfusion_tpu.parallel.hierarchical import level_k_used

            for li, (lres, lh) in enumerate(
                zip(hres.level_results, level_halos)
            ):
                lk = level_k_used(
                    solver, lres.warp.shape[:-1], lh, (nd,)
                )
                violations += _frame_contract(
                    lres, lk, live_halo=lh,
                    name=f"sharded fusion frame {t} level {li}",
                )
        else:
            violations = _frame_contract(
                res, k_used, live_halo=live_halo,
                sharded_axes=(0, 1) if two_d else (0,),
                name=f"sharded fusion frame {t}",
            )

        reports.append(
            FrameReport(
                frame_index=t,
                solver_iterations=int(ints[0]),
                final_data_energy=float(floats[0]),
                band_voxels=band,
                max_abs_displacement=tuple(float(v) for v in md),
                pallas_max_displacement=k_used,
                contract_violations=tuple(violations),
            )
        )
        if frame_callback is not None:
            _call_frame_callback(
                frame_callback, t, state, warp, reports[-1], solver
            )

    return FusionResult(state=state, reports=reports, final_warp=warp)


def fuse_sequence(
    frames,
    camera: PinholeCamera,
    config: FusionPipelineConfig,
    frame_callback: Callable[[int, FusionState, jnp.ndarray], None] | None = None,
) -> FusionResult:
    """Fuse a depth sequence into a canonical TSDF (SURVEY.md §3.3 loop).

    ``frames`` is any iterable of depth images — a list, or a lazy source
    such as ``io.native_loader.DepthPrefetcher`` (the PP-analogue from
    SURVEY §2's parallelism table: frames are decoded ahead by native
    threads while the device solves the current frame, so host IO rides
    under device compute). Frames are consumed strictly in order, once.

    ``frame_callback(t, state, warp)`` is invoked after each frame for
    telemetry/visualization/checkpointing hooks; callbacks that accept
    ``report``/``solver`` keywords also receive the frame's FrameReport
    and the (possibly clamp-raised) solver (see ``_call_frame_callback``).

    The flat path runs PIPELINED (frame t dispatches before frame t−1's
    stats fetch — see the loop below); the hierarchical path is serial.
    The sharded driver (``fuse_sequence_sharded``) is not pipelined: its
    blend halo is sized from the frame's fetched measured |u|, so the
    fetch is load-bearing there (speculating with the previous halo is
    possible future work).
    """
    grid = config.grid

    def gen(depth):
        return generate_tsdf_3d(
            jnp.asarray(depth),
            camera,
            grid,
            narrow_band_width_voxels=config.narrow_band_width_voxels,
            method=config.generation_method,
        )

    frame_iter = iter(frames)
    state = init_state(gen(next(frame_iter)))
    d = grid.dim
    warp = jnp.zeros(grid.shape + (d,), state.canonical.dtype)
    reports: List[FrameReport] = []
    solver = config.solver

    if config.hierarchical:
        for t, frame in enumerate(frame_iter, start=1):
            init_warp = warp if config.warm_start else jnp.zeros_like(warp)
            state, warp, report, solver = fuse_frame(
                state, gen(frame), init_warp, solver, config, t
            )
            reports.append(report)
            if frame_callback is not None:
                _call_frame_callback(
                    frame_callback, t, state, warp, report, solver
                )
        return FusionResult(state=state, reports=reports, final_warp=warp)

    # Flat path, PIPELINED: frame t's all-in-one device program (gen +
    # solve + resample + blend + stats pack) is dispatched from frame
    # t−1's device outputs BEFORE t−1's packed stats are fetched, so the
    # one host round trip per frame (~24 ms on the remote tunnel) rides
    # under the next frame's compute. The rare auto-raise redo discards
    # the one speculative dispatch and re-issues it from the corrected
    # state — accuracy is identical to the serial loop (same guarded
    # semantics; tests assert report parity).

    def _dispatch(prev_state, init_warp, depth):
        return _flat_frame_core_from_depth(
            depth, prev_state.canonical, prev_state.weights, init_warp,
            solver, camera, grid, config.narrow_band_width_voxels,
            config.generation_method,
        )

    def _finalize(p):
        nonlocal solver

        def dispatch(s):
            return _flat_frame_core_from_depth(
                p["depth"], p["prev_state"].canonical,
                p["prev_state"].weights, p["init_warp"], s, camera, grid,
                config.narrow_band_width_voxels, config.generation_method,
            )

        new_state, new_warp, report, new_solver, redone = (
            _finalize_flat_frame(
                p["out"], dispatch, solver, config, p["t"]
            )
        )
        solver = new_solver
        return new_state, new_warp, report, redone

    def _emit(t, f_state, f_warp, report):
        reports.append(report)
        if frame_callback is not None:
            _call_frame_callback(
                frame_callback, t, f_state, f_warp, report, solver
            )

    pending = None
    for t, frame in enumerate(frame_iter, start=1):
        depth = jnp.asarray(frame)
        init_warp = warp if config.warm_start else jnp.zeros_like(warp)
        cur = {
            "t": t, "prev_state": state, "init_warp": init_warp,
            "depth": depth,
        }
        cur["out"] = _dispatch(state, init_warp, depth)
        # Advance speculatively on the device outputs; the host fetch of
        # the PREVIOUS frame's stats happens while this frame computes.
        state, warp = cur["out"][0], cur["out"][1]
        if pending is not None:
            f_state, f_warp, report, redone = _finalize(pending)
            _emit(pending["t"], f_state, f_warp, report)
            if redone:
                # The speculative dispatch consumed the pre-redo state:
                # re-issue this frame from the corrected outputs.
                cur["prev_state"] = f_state
                cur["init_warp"] = (
                    f_warp if config.warm_start
                    else jnp.zeros_like(f_warp)
                )
                cur["out"] = _dispatch(
                    f_state, cur["init_warp"], depth
                )
                state, warp = cur["out"][0], cur["out"][1]
        pending = cur

    if pending is not None:
        state, warp, report, _ = _finalize(pending)
        _emit(pending["t"], state, warp, report)

    return FusionResult(state=state, reports=reports, final_warp=warp)
