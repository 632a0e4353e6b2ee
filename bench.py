"""Headline benchmark: BASELINE config 3 — 3D dense 128³ single-pair
non-rigid alignment with the full data+Killing+level-set energy and Sobolev
preconditioning.

Prints ONE JSON line:
  {"metric": "voxel_warp_updates_per_s_per_chip", "value": N, "unit": "voxel·iter/s",
   "vs_baseline": R, ...}

``vs_baseline`` is measured against the reference-architecture stand-in: the
same solve run on one host CPU core-set (the reference is single-process CPU
numpy; its repo publishes no numbers and the mount is empty — see
BASELINE.md — so the CPU run of our own math is the closest measurable
proxy, and is itself vectorized, i.e. a *conservative* baseline).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Enough iterations that the ~24 ms remote-dispatch floor (axon tunnel; see
# KERNEL_NOTES.md) is <10% of the measured solve (~1 ms/iteration now).
N_ITER = 300
SHAPE = (128, 128, 128)
CPU_SHAPE = (64, 64, 64)
CPU_ITER = 5


def _build_fields(shape):
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = np.tanh(base * 0.3)
    live = np.tanh(np.roll(base, 1, axis=0) * 0.3)
    return jnp.asarray(canonical), jnp.asarray(live)


def _params():
    from levelsetfusion_tpu.models.params import SmoothingMode, SolverParams

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    return SolverParams(
        max_iterations=N_ITER,
        learning_rate=0.3,
        smoothing_term_weight=0.1,
        smoothing_mode=SmoothingMode.KILLING,
        level_set_term_weight=0.1,
        sobolev_smoothing=True,
        convergence_threshold=0.0,  # run exactly max_iterations
        use_pallas_resample=on_tpu,
        pallas_max_displacement=2,
        # Fused stencil+Sobolev+update kernel: 1.62 -> 1.02 ms/iter at 128³.
        use_pallas_gradient=on_tpu,
    )


def _sync(x):
    """Force completion. block_until_ready is a no-op on the remote-TPU
    (axon) backend in this container, so fetch a scalar instead."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def measure(shape, n_iter, repeats=3):
    from levelsetfusion_tpu.models.single_level import solve_single_level

    params = _params().replace(max_iterations=n_iter)
    canonical, live = _build_fields(shape)
    # Warmup/compile.
    res = solve_single_level(canonical, live, params)
    _sync(res.warp)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = solve_single_level(canonical, live, params)
        _sync(res.warp)
        best = min(best, time.perf_counter() - t0)
    voxels = 1
    for s in shape:
        voxels *= s
    return voxels * n_iter / best, best


def _cpu_baseline_rate():
    """Measure the CPU stand-in rate in a subprocess (platform is locked per
    process in this container)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import bench; r,_ = bench.measure(bench.CPU_SHAPE, bench.CPU_ITER, repeats=1);"
        "print('CPU_RATE', r)" % REPO
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_RATE"):
                return float(line.split()[1])
    except Exception:
        pass
    return None


def main():
    import jax

    platform = jax.devices()[0].platform
    rate, secs = measure(SHAPE, N_ITER)
    cpu_rate = _cpu_baseline_rate()
    vs = rate / cpu_rate if cpu_rate else None
    print(
        json.dumps(
            {
                "metric": "voxel_warp_updates_per_s_per_chip",
                "value": rate,
                "unit": "voxel·iter/s",
                "vs_baseline": vs,
                "details": {
                    "config": "3D 128^3 single-pair, data+Killing+level-set+Sobolev",
                    "iterations": N_ITER,
                    "best_solve_seconds": secs,
                    "platform": platform,
                    "cpu_baseline_rate": cpu_rate,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
