"""Real-TPU timing of the y-tiled fused gradient kernel at config-5
per-shard shapes (the VERDICT r2 #1 item: (64, 512, 512) blocks).

Chained-call timing (dispatch-floor corrected): N kernel calls inside one
jit, difference against 1 call. Also times the XLA jnp assembly at the same
shape for the before/after comparison, and the whole-volume kernel at 128^3
to check the shared-helper refactor didn't regress it.

Run: python experiments/tiled_fused_bench.py [--shape X Y Z] [--tiles XB YB]
"""
import argparse
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


def fields(shape, rng):
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.4))
    warped = jnp.asarray(np.tanh(np.roll(base, 1, axis=0) * 0.4))
    warp = jnp.asarray(
        (rng.standard_normal((3,) + shape) * 0.5).astype(np.float32)
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


def chain(fn, n):
    @jax.jit
    def run(w, c, u, rate):
        for _ in range(n):
            u, stats = fn(w, c, u, rate)
            rate = rate + 0.0 * stats.max_update  # serialize
        # Reduce on device: fetching the full updated warp costs seconds
        # over the remote-TPU tunnel and buries the differenced timing.
        return jnp.sum(u), rate

    return run


def golden_chain(taps_kernel, n):
    def step(warped, canonical, u_cm, rate):
        u = jnp.moveaxis(u_cm, 0, -1)
        wg = gradient(warped)
        g_data, _ = terms.data_term(warped, canonical, wg,
                                    band_union_only=True)
        total = KW["w_data"] * g_data
        g_s, _ = terms.killing_term(u, KW["gamma"])
        total = total + KW["w_smooth"] * g_s
        g_ls, _ = terms.level_set_term(warped, wg, canonical,
                                       band_union_only=True)
        total = total + KW["w_ls"] * g_ls
        total = sobolev_ops.convolve_with_sobolev_kernel(
            total, taps_kernel, num_spatial_dims=3
        )
        return jnp.moveaxis(u - rate * total, -1, 0)

    @jax.jit
    def run(w, c, u, rate):
        for _ in range(n):
            u = step(w, c, u, rate)
        return u

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=[74, 512, 512])
    ap.add_argument("--xlo", type=int, default=5)
    ap.add_argument("--xlen", type=int, default=64)
    ap.add_argument("--tiles", type=int, nargs=2, default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--skip-golden", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    shape = tuple(args.shape)
    canonical, warped, warp = fields(shape, rng)
    rate = jnp.float32(0.1)
    taps = sobolev_taps(7, 0.1)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))

    import functools
    fused = functools.partial(
        fused_gradient_update, taps=taps,
        x_offset=0, x_global=shape[0], x_lo=args.xlo, x_len=args.xlen,
        tile_override=tuple(args.tiles) if args.tiles else None,
        **KW,
    )

    # Pad warp output back to input extent so the chain composes.
    def step(w, c, u, r):
        nu, stats = fused(w, c, u, r)
        u2 = jax.lax.dynamic_update_slice(
            u, nu, (0, args.xlo, 0, 0)
        )
        return u2, stats

    n1 = chain(step, 1)
    nN = chain(step, args.n)
    print(f"shape={shape} x_lo={args.xlo} x_len={args.xlen}")
    t0 = time.perf_counter()
    t1 = timed(n1, warped, canonical, warp, rate)
    print(f"compile+1call done ({time.perf_counter()-t0:.1f}s)")
    tN = timed(nN, warped, canonical, warp, rate)
    per = (tN - t1) / (args.n - 1)
    vox = args.xlen * shape[1] * shape[2]
    print(f"fused tiled: 1-call {t1*1e3:.2f} ms, {args.n}-call {tN*1e3:.2f} "
          f"ms -> {per*1e3:.3f} ms/iter = {vox/per/1e9:.3f} Gvox/s")

    if not args.skip_golden:
        g1 = golden_chain(kernel, 1)
        gN = golden_chain(kernel, args.n)
        t1g = timed(g1, warped, canonical, warp, rate)
        tNg = timed(gN, warped, canonical, warp, rate)
        perg = (tNg - t1g) / (args.n - 1)
        print(f"XLA stencils: {perg*1e3:.3f} ms/iter = "
              f"{shape[0]*shape[1]*shape[2]/perg/1e9:.3f} Gvox/s "
              f"(full {shape[0]} rows)")


if __name__ == "__main__":
    main()
