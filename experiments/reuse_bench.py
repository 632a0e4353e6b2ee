"""A/B timing of the term-row-reuse whole-volume fused kernel vs the plain
whole-volume kernel (VERDICT r3 weak #4: the Sobolev window-row recompute).

Chained-call differenced timing (KERNEL_NOTES methodology) at 128³ full
energy, plus hardware parity of the two lowerings against each other and
the jnp golden on the same inputs.

Run: python experiments/reuse_bench.py  (TPU, idle host)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetfusion_tpu.ops import sobolev as sobolev_ops
from levelsetfusion_tpu.ops import terms
from levelsetfusion_tpu.ops.derivatives import gradient
from levelsetfusion_tpu.ops.pallas.fused_gradient import (
    fused_gradient_update,
    sobolev_taps,
)

KW = dict(w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
          band_union=True)
SHAPE = (128, 128, 128)
N = 16


def fields(rng):
    base = rng.standard_normal(SHAPE).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.4))
    warped = jnp.asarray(np.tanh(np.roll(base, 1, axis=0) * 0.4))
    warp = jnp.asarray(
        (rng.standard_normal((3,) + SHAPE) * 0.5).astype(np.float32)
    )
    return canonical, warped, warp


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(jax.device_get(a)).ravel()[:1], out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(jax.device_get(a)).ravel()[:1], out)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(fused, n):
    @jax.jit
    def run(w, c, u, rate):
        for _ in range(n):
            u, stats = fused(w, c, u, rate)
            rate = rate + 0.0 * stats.max_update
        # On-device reduction: full-warp fetches over the tunnel bury the
        # differenced timing in transfer noise.
        return jnp.sum(u), rate

    return run


def main():
    rng = np.random.default_rng(0)
    canonical, warped, warp = fields(rng)
    rate = jnp.float32(0.1)
    taps = sobolev_taps(7, 0.1)
    out = {"shape": list(SHAPE)}

    results = {}
    for name, reuse in (("reuse", True), ("plain", False)):
        fused = functools.partial(
            fused_gradient_update, taps=taps, row_reuse=reuse, **KW
        )
        t1 = timed(chain(fused, 1), warped, canonical, warp, rate)
        tN = timed(chain(fused, N), warped, canonical, warp, rate)
        per = (tN - t1) / (N - 1)
        results[name] = per
        u1, s1 = jax.jit(fused)(warped, canonical, warp, rate)
        results[name + "_out"] = (np.asarray(u1), s1)
        out[name + "_ms_per_call"] = per * 1e3

    # Hardware parity: the two lowerings against each other + the golden.
    d_kernels = float(
        np.max(np.abs(results["reuse_out"][0] - results["plain_out"][0]))
    )
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))

    def golden(w, c, u_cm, r_):
        u = jnp.moveaxis(u_cm, 0, -1)
        wg = gradient(w)
        g_data, _ = terms.data_term(w, c, wg, band_union_only=True)
        total = KW["w_data"] * g_data
        g_s, _ = terms.killing_term(u, KW["gamma"])
        total = total + KW["w_smooth"] * g_s
        g_ls, _ = terms.level_set_term(w, wg, c, band_union_only=True)
        total = total + KW["w_ls"] * g_ls
        total = sobolev_ops.convolve_with_sobolev_kernel(
            total, kernel, num_spatial_dims=3
        )
        return jnp.moveaxis(u - r_ * total, -1, 0)

    g = np.asarray(jax.jit(golden)(warped, canonical, warp, rate))
    d_golden = float(np.max(np.abs(results["reuse_out"][0] - g)))
    out["reuse_vs_plain_max_abs"] = d_kernels
    out["reuse_vs_jnp_golden_max_abs"] = d_golden
    out["speedup"] = results["plain"] / results["reuse"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
