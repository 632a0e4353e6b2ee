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
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Sequence

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


class FusionState(NamedTuple):
    canonical: jnp.ndarray  # (*spatial,) running fused TSDF
    weights: jnp.ndarray  # (*spatial,) accumulated observation weights


class FrameReport(NamedTuple):
    frame_index: int
    solver_iterations: int
    final_data_energy: float
    band_voxels: int  # |Φ_c| < 1 count after fusion


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


def fuse_sequence_sharded(
    frames: Sequence[np.ndarray],
    camera: PinholeCamera,
    config: FusionPipelineConfig,
    *,
    mesh,
    axis_name: str = "x",
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
      (ppermute halos, psum/pmax termination), warm-started per frame.
    - The fusion resample is ``parallel.sharded.warp_field_sharded`` (one
      explicit halo exchange); the blend is elementwise and keeps the
      state's sharding.

    Parity: tests/test_fusion_sharded.py asserts the final canonical equals
    the single-device ``fuse_sequence`` to float tolerance.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from levelsetfusion_tpu.parallel.sharded import (
        solve_single_level_sharded,
        warp_field_sharded,
    )

    grid = config.grid
    sharding = NamedSharding(mesh, P(axis_name))

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
                HierarchicalParams(
                    levels=config.levels, base=config.solver
                ),
                mesh=mesh,
                axis_name=axis_name,
                min_live_halo=live_halo,
                initial_warp=init_warp,
            )
            warp = jax.device_put(hres.warp, sharding)
            res = hres.level_results[-1]
        else:
            res = solve_single_level_sharded(
                state.canonical,
                live,
                config.solver,
                mesh=mesh,
                axis_name=axis_name,
                live_halo=live_halo,
                initial_warp=init_warp,
            )
            warp = res.warp
        warped = warp_field_sharded(
            live, warp, mesh=mesh, axis_name=axis_name, live_halo=live_halo,
            params=config.solver,
        )
        state = blend(state, warped)
        # One host fetch per frame (see fuse_sequence).
        stats = np.asarray(
            jnp.stack(
                [
                    res.iterations.astype(jnp.float32),
                    jnp.take(
                        res.telemetry.data_energy,
                        jnp.maximum(res.iterations - 1, 0),
                    ),
                    jnp.sum(
                        (
                            jnp.abs(state.canonical) < 1.0 - TRUNCATION_EPS
                        ).astype(jnp.float32)
                    ),
                ]
            )
        )
        reports.append(
            FrameReport(
                frame_index=t,
                solver_iterations=int(stats[0]),
                final_data_energy=float(stats[1]),
                band_voxels=int(stats[2]),
            )
        )
        if frame_callback is not None:
            frame_callback(t, state, warp)

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
    telemetry/visualization/checkpointing hooks.
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

    for t, frame in enumerate(frame_iter, start=1):
        live = gen(frame)
        init_warp = warp if config.warm_start else jnp.zeros_like(warp)
        if config.hierarchical:
            hres = solve_hierarchical(
                state.canonical,
                live,
                HierarchicalParams(levels=config.levels, base=config.solver),
                initial_warp=init_warp,
            )
            warp = hres.warp
            res = hres.level_results[-1]
        else:
            res = solve_single_level(
                state.canonical, live, config.solver, initial_warp=init_warp
            )
            warp = res.warp

        # The blend resample is the Pallas kernel when the solver's fast
        # path is on (the XLA general gather costs ~192 ms at 128³ — it
        # would dominate the whole frame); same ±K clamp contract as the
        # solve, which the displacement guard monitors.
        if config.solver.use_pallas_resample:
            from levelsetfusion_tpu.ops.pallas.resample import warp_field_fast

            warped = warp_field_fast(
                live, warp, config.solver.pallas_max_displacement,
                interpret=config.solver.pallas_interpret,
            )
        else:
            warped = warp_field(live, warp)
        state = blend(state, warped)
        # One host fetch per frame: every dispatch costs the remote-TPU
        # round trip (~24 ms here), so the per-frame report scalars are
        # stacked on device and fetched together.
        stats = np.asarray(
            jnp.stack(
                [
                    res.iterations.astype(jnp.float32),
                    jnp.take(
                        res.telemetry.data_energy,
                        jnp.maximum(res.iterations - 1, 0),
                    ),
                    jnp.sum(
                        (
                            jnp.abs(state.canonical) < 1.0 - TRUNCATION_EPS
                        ).astype(jnp.float32)
                    ),
                ]
            )
        )
        reports.append(
            FrameReport(
                frame_index=t,
                solver_iterations=int(stats[0]),
                final_data_energy=float(stats[1]),
                band_voxels=int(stats[2]),
            )
        )
        if frame_callback is not None:
            frame_callback(t, state, warp)

    return FusionResult(state=state, reports=reports, final_warp=warp)
