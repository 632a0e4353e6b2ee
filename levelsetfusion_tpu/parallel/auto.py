"""GSPMD auto-sharded solve (the pjit/scaling-book recipe, SURVEY.md §2
parallelism table): run the *single-device* solver under jit with sharded
inputs and let XLA's SPMD partitioner insert the halo collectives for the
stencils and the gather for the warp resample.

This is the zero-new-math path — semantics are identical to
``models.single_level.solve_single_level`` by construction. The hand-rolled
``parallel.sharded`` solver exists because (a) BASELINE config 5 mandates
explicit voxel-block halo exchange, and (b) explicit neighbor ``ppermute``
of 2–3 ghost rows beats the partitioner's general handling of the resample
gather (which may all-gather the live volume). Both are parity-tested
against each other.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from levelsetfusion_tpu.models.params import SolverParams
from levelsetfusion_tpu.models.single_level import SolveResult, solve_single_level


def solve_single_level_auto(
    canonical,
    live,
    params: SolverParams = SolverParams(),
    *,
    mesh: Mesh,
    axis_name: str = "x",
    initial_warp=None,
) -> SolveResult:
    """Auto-sharded twin of ``solve_single_level`` via GSPMD."""
    sharding = NamedSharding(mesh, P(axis_name))
    canonical = jax.device_put(canonical, sharding)
    live = jax.device_put(live, sharding)
    if initial_warp is not None:
        initial_warp = jax.device_put(
            initial_warp, NamedSharding(mesh, P(axis_name))
        )
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _nullcontext():
        return solve_single_level(canonical, live, params, initial_warp=initial_warp)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
