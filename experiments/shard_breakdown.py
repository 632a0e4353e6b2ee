"""Where does the 64x512x512 per-shard iteration time go?

Differenced timing (KERNEL_NOTES methodology: ~24 ms dispatch floor, chain N
iterations in one jit at two N and difference).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetfusion_tpu.models.params import SmoothingMode, SolverParams
from levelsetfusion_tpu.models.single_level import solve_single_level

SHAPE = (64, 512, 512)


def _sphere_pair(shape, offset=0.01):
    x = np.linspace(-1, 1, shape[0], dtype=np.float32)[:, None, None]
    y = np.linspace(-1, 1, shape[1], dtype=np.float32)[None, :, None]
    z = np.linspace(-1, 1, shape[2], dtype=np.float32)[None, None, :]
    r = np.sqrt(x * x + y * y + z * z)
    canonical = jnp.asarray(np.clip((r - 0.5) * 8.0, -1, 1))
    r2 = np.sqrt((x - offset) ** 2 + y * y + z * z)
    live = jnp.asarray(np.clip((r2 - 0.5) * 8.0, -1, 1))
    return canonical, live


def _sync(x):
    return float(jnp.sum(x))


def _time(fn, *args, repeats=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def solver_per_iter(canonical, live, n1=4, n2=24, **kw):
    def run(n):
        params = SolverParams(
            max_iterations=n, learning_rate=0.3,
            smoothing_term_weight=0.1, smoothing_mode=SmoothingMode.KILLING,
            level_set_term_weight=0.1, sobolev_smoothing=True,
            convergence_threshold=0.0, **kw,
        )
        return lambda c, l: solve_single_level(c, l, params).warp

    t1 = _time(jax.jit(run(n1)), canonical, live)
    t2 = _time(jax.jit(run(n2)), canonical, live)
    return (t2 - t1) / (n2 - n1)


def resample_per_call(live, n1=2, n2=12):
    from levelsetfusion_tpu.ops.pallas.resample import (
        compute_skip_flags, pick_y_block, prepare_field,
        warp_field_pallas_prepared,
    )
    import functools

    K = 2
    stacked = prepare_field(live, K)
    yb = pick_y_block(live.shape)
    flags = compute_skip_flags(stacked, live.shape[0], yb, K)
    warp_cm = jnp.zeros((3,) + live.shape, jnp.float32) + 0.3

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(stacked, flags, w, n):
        def body(i, acc):
            out = warp_field_pallas_prepared(
                stacked, w + 1e-6 * acc[0, 0, 0], K, y_block=yb,
                skip_flags=flags, component_major=True,
            )
            return out
        return jax.lax.fori_loop(0, n, body, jnp.zeros_like(live))

    t1 = _time(lambda s, f, w: chain(s, f, w, n1), stacked, flags, warp_cm)
    t2 = _time(lambda s, f, w: chain(s, f, w, n2), stacked, flags, warp_cm)
    return (t2 - t1) / (n2 - n1)


def xla_stencil_per_call(canonical, live, n1=2, n2=12):
    """The non-resample half only: term stencils + Sobolev + update from a
    fixed warped field (what the fused kernel replaces)."""
    import functools
    from levelsetfusion_tpu.ops import sobolev as sobolev_ops
    from levelsetfusion_tpu.ops import terms
    from levelsetfusion_tpu.ops.derivatives import gradient as _grad

    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
    warp = jnp.zeros(live.shape + (3,), jnp.float32) + 0.3
    warped = live  # stands in for the resample output

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(c, wd, w, n):
        def body(i, w):
            wg = _grad(wd + 1e-6 * w[0, 0, 0, 0])
            g_data, _ = terms.data_term(wd, c, wg)
            g_s, _ = terms.killing_term(w, 0.1)
            g_ls, _ = terms.level_set_term(wd, wg, c)
            total = g_data + 0.1 * g_s + 0.1 * g_ls
            total = sobolev_ops.convolve_with_sobolev_kernel(
                total, kernel, num_spatial_dims=3
            )
            return w - 0.3 * total
        return jax.lax.fori_loop(0, n, body, w)

    t1 = _time(lambda c, wd, w: chain(c, wd, w, n1), canonical, warped, warp)
    t2 = _time(lambda c, wd, w: chain(c, wd, w, n2), canonical, warped, warp)
    return (t2 - t1) / (n2 - n1)


if __name__ == "__main__":
    canonical, live = _sphere_pair(SHAPE)
    print("platform:", jax.devices()[0].platform, "shape:", SHAPE)
    if "--full" in sys.argv:
        t_full = solver_per_iter(canonical, live, use_pallas_resample=True)
        print(f"full iteration (pallas resample + XLA stencils): {t_full*1e3:.2f} ms")
    t_res = resample_per_call(live)
    print(f"resample alone: {t_res*1e3:.2f} ms")
    t_sten = xla_stencil_per_call(canonical, live)
    print(f"XLA stencil half alone (from fixed warped field): {t_sten*1e3:.2f} ms")
