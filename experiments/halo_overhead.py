"""Price the sharded-solver halo machinery on a real-TPU 1-device mesh
(VERDICT r3 missing #2): ``solve_single_level_sharded`` / ``_schur`` on a
Mesh of ONE device run the full shard_map program — halo ppermutes
(self-sends), psum/pmax termination, per-shard kernel prep — with zero
actual neighbor traffic, so (sharded₁ − bare) prices the per-iteration
structural overhead an N-chip run pays on top of compute, separately from
the ICI transfer time that parallel/scaling.py models.

Shapes: the config-5 per-shard block (64, 512, 512) — the per-device work
of 512³ over 8 — at the bench's full-energy settings.

Prints one JSON line; provenance for BASELINE.md's scaling row.
Usage: python experiments/halo_overhead.py  (TPU, ~3 min incl. compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SHAPE = (64, 512, 512)
N_ITER = 32  # multiple of termination_check_interval=4 (exact rate math)


def _sync(x):
    return float(jnp.sum(x))


def _fields():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(SHAPE).astype(np.float32)
    return (
        jnp.asarray(np.tanh(base * 0.3)),
        jnp.asarray(np.tanh(np.roll(base, 1, axis=0) * 0.3)),
    )


def _time(fn, repeats=3):
    fn()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import bench

    from levelsetfusion_tpu.models.single_level import solve_single_level
    from levelsetfusion_tpu.parallel import make_mesh, solve_single_level_sharded
    from levelsetfusion_tpu.parallel.schur import solve_single_level_schur

    params = bench._params("config5_512", max_iterations=N_ITER)
    canonical, live = _fields()
    mesh1 = make_mesh(1)

    bare = _time(
        lambda: _sync(solve_single_level(canonical, live, params).warp)
    )

    def sharded_time(k_int):
        p = params.replace(termination_check_interval=k_int)
        return _time(
            lambda: _sync(
                solve_single_level_sharded(
                    canonical, live, p, mesh=mesh1, live_halo=8
                ).warp
            )
        )

    # k=1: exact per-iteration termination round; k=4: the production
    # preset's amortized setting (round-5). Round-5 also elides the
    # self-ppermutes/psums a 1-device mesh used to pay, so both are far
    # below round 4's +14.7%.
    sharded1_k1 = sharded_time(1)
    sharded1 = sharded_time(4)
    schur1 = _time(
        lambda: _sync(
            solve_single_level_schur(
                canonical, live,
                params.replace(
                    adaptive_learning_rate=False,
                    termination_check_interval=1,
                ),
                mesh=mesh1, live_halo=8, inner_iterations=8,
            ).warp
        )
    )

    voxels = SHAPE[0] * SHAPE[1] * SHAPE[2]
    out = {
        "shape": list(SHAPE),
        "iterations": N_ITER,
        "bare_s_per_iter": bare / N_ITER,
        "sharded1_k1_s_per_iter": sharded1_k1 / N_ITER,
        "sharded1_s_per_iter": sharded1 / N_ITER,
        "schur1_s_per_iter": schur1 / N_ITER,
        "sharded1_k1_overhead_fraction": sharded1_k1 / bare - 1.0,
        "sharded1_overhead_fraction": sharded1 / bare - 1.0,
        "schur1_overhead_fraction": schur1 / bare - 1.0,
        "bare_voxel_iter_per_s": voxels * N_ITER / bare,
        "sharded1_voxel_iter_per_s": voxels * N_ITER / sharded1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
