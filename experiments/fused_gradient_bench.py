"""Microbenchmark: fused gradient+update kernel vs the XLA stencil path.

Methodology (KERNEL_NOTES.md): the axon tunnel costs ~24 ms per dispatch and
`block_until_ready` is a no-op, so per-iteration time is measured by chaining
N iterations inside ONE jit at two different N and differencing:
    t_iter = (t(N2) - t(N1)) / (N2 - N1)
"""

import functools
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

SHAPE = (128, 128, 128)
N1, N2 = 4, 44


def _fields(shape):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(shape).astype(np.float32)
    canonical = np.tanh(base * 0.4)
    warped = np.tanh(np.roll(base, 1, axis=0) * 0.4)
    warp = (rng.standard_normal(shape + (3,)) * 0.5).astype(np.float32)
    return jnp.asarray(canonical), jnp.asarray(warped), jnp.asarray(warp)


def _sync(x):
    return float(jnp.sum(x))


def _time_call(fn, *args, repeats=4):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(make_chain, *args):
    """Differenced per-iteration seconds for a chain builder."""
    t1 = _time_call(make_chain(N1), *args)
    t2 = _time_call(make_chain(N2), *args)
    return (t2 - t1) / (N2 - N1)


def xla_step(warped, canonical, warp, rate, kernel):
    wg = gradient(warped)
    g_data, _ = terms.data_term(warped, canonical, wg)
    total = g_data
    g_s, _ = terms.killing_term(warp, 0.1)
    total = total + 0.1 * g_s
    g_ls, _ = terms.level_set_term(warped, wg, canonical)
    total = total + 0.1 * g_ls
    total = sobolev_ops.convolve_with_sobolev_kernel(total, kernel, 3)
    return warp - rate * total


def main():
    canonical, warped, warp = _fields(SHAPE)
    warp_cm = jnp.moveaxis(warp, -1, 0)
    rate = jnp.float32(0.3)
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(7, 0.1))
    taps = sobolev_taps(7, 0.1)

    def xla_chain(n):
        @jax.jit
        def run(warped, canonical, warp, rate):
            def body(i, w):
                return xla_step(warped, canonical, w, rate, kernel)
            return jax.lax.fori_loop(0, n, body, warp)
        return run

    def fused_chain_maker(kw):
        def make(n):
            @jax.jit
            def run(warped, canonical, warp_cm, rate):
                def body(i, w):
                    nw, _ = fused_gradient_update(
                        warped, canonical, w, rate,
                        w_data=1.0, gamma=0.1, band_union=True, **kw,
                    )
                    return nw
                return jax.lax.fori_loop(0, n, body, warp_cm)
            return run
        return make

    t_xla = per_iter(xla_chain, warped, canonical, warp, rate)
    print(f"XLA stencil step:     {t_xla*1e3:8.3f} ms")

    variants = {
        "data only": dict(w_smooth=0.0, w_ls=0.0, killing=False, taps=()),
        "data+killing": dict(w_smooth=0.1, w_ls=0.0, killing=True, taps=()),
        "data+killing+ls": dict(w_smooth=0.1, w_ls=0.1, killing=True, taps=()),
        "full(+sobolev)": dict(w_smooth=0.1, w_ls=0.1, killing=True, taps=taps),
    }
    for name, kw in variants.items():
        t = per_iter(fused_chain_maker(kw), warped, canonical, warp_cm, rate)
        extra = f"   ({t_xla/t:.2f}x vs XLA)" if name.startswith("full") else ""
        print(f"{name:20s} {t*1e3:8.3f} ms{extra}")


if __name__ == "__main__":
    main()
