"""Isolate the fused kernel's fixed costs: same I/O plan, varying body."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (128, 128, 128)
CHAIN = 20
H = 5


def _sync(x):
    return float(jnp.sum(x))


def time_fn(fn, *args, repeats=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make(body_kind, xb):
    x, y, z = SHAPE
    xw = xb + 2 * H

    def kern(warped_ref, canon_ref, warp_ref, out_ref):
        i = pl.program_id(0)
        start = pl.multiple_of(i * xb, 8)
        w = warped_ref[pl.ds(start, xw)]
        c = canon_ref[pl.ds(start, xw)]
        u = [warp_ref[k, pl.ds(start, xw)] for k in range(3)]
        sl = slice(H, H + xb)
        if body_kind == "copy":
            for k in range(3):
                out_ref[k] = u[k][sl]
        elif body_kind == "arith":
            d = w - c
            for k in range(3):
                out_ref[k] = u[k][sl] + 0.1 * d[sl]
        elif body_kind == "rolls":
            acc = w
            for ax in range(3):
                acc = acc + jnp.roll(acc, 1, ax) + jnp.roll(acc, -1, ax)
            d = acc - c
            for k in range(3):
                out_ref[k] = u[k][sl] + 0.1 * d[sl]

    @jax.jit
    def run(warped, canon, warp_cm):
        pad = ((H, H), (0, 0), (0, 0))
        we = jnp.pad(warped, pad, mode="edge")
        ce = jnp.pad(canon, pad, mode="edge")
        ue = jnp.pad(warp_cm, ((0, 0),) + pad, mode="edge")

        def body(i, wcm):
            return pl.pallas_call(
                kern,
                grid=(x // xb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (3, xb, y, z), lambda i, *_: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((3, x, y, z), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024
                ),
            )(we, ce, ue)

        return jax.lax.fori_loop(0, CHAIN, body, warp_cm)

    return run


def main():
    rng = np.random.default_rng(0)
    warped = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    canon = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    warp_cm = jnp.asarray(
        rng.standard_normal((3,) + SHAPE).astype(np.float32)
    )
    for kind in ("copy", "arith", "rolls"):
        for xb in (16, 32):
            t = time_fn(make(kind, xb), warped, canon, warp_cm) / CHAIN
            print(f"{kind:6s} xb={xb:<3d} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
