"""Pin the ~8us/iteration cost inside a Pallas fori on this TPU.

All kernels: grid=(2,128) [y-blocks, x], block (yb=64,128) out, stacked
input resident in VMEM. Bodies differ:
  nothing   acc = acc + 1.0
  slice     acc = acc + s_ref[cy, i+cx]        (dynamic leading-dim slice)
  slice0    acc = acc + s_ref[0, i]            (static-ish slice)
  gather    acc = acc + take(s_ref[0,i], z0c)  (1 lane gather, no slice dyn)
  full      slice + 2 gathers + weights        (~v7 body)
Each runs with fori over NBODY=36 iterations and (where feasible) a static
unroll for comparison. Chained x8 inside one jit to subtract dispatch floor.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
NBODY = 36
K = 2
N = 2 * K + 2


def _make_kernel(body_kind, loop_kind):
    def kernel(s_ref, warp_ref, out_ref):
        i = pl.program_id(1)
        uz = warp_ref[0, :, :, 2]
        z0 = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + jnp.floor(uz).astype(
            jnp.int32
        )
        z0c = jnp.clip(z0, 0, _LANE - 1)
        z1c = jnp.clip(z0 + 1, 0, _LANE - 1)
        w0 = 0.5 * jnp.ones_like(uz)
        w1 = 0.25 * jnp.ones_like(uz)

        def body(t, acc):
            cy = t // N
            cx = t - cy * N
            if body_kind == "nothing":
                return acc + 1.0
            if body_kind == "slice":
                return acc + s_ref[cy, i + cx]
            if body_kind == "slice0":
                return acc + s_ref[0, i]
            if body_kind == "gather":
                return acc + jnp.take_along_axis(s_ref[0, i], z0c, axis=1)
            rows = s_ref[cy, i + cx]
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
            return acc + g

        acc0 = jnp.zeros_like(uz)
        if loop_kind == "fori":
            out_ref[0] = jax.lax.fori_loop(0, NBODY, body, acc0)
        else:
            acc = acc0
            for t in range(NBODY):
                acc = body(jnp.int32(t), acc)
            out_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("body_kind", "loop_kind", "yb", "chain"))
def run(stacked, warp, body_kind, loop_kind, yb=64, chain=1):
    xpad = stacked.shape[1]
    y_size = stacked.shape[2]
    x_size = 128
    kern = _make_kernel(body_kind, loop_kind)

    def one(w):
        return pl.pallas_call(
            kern,
            grid=(y_size // yb, x_size),
            in_specs=[
                pl.BlockSpec(
                    (N, xpad, yb, _LANE), lambda j, i: (0, 0, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, yb, _LANE, 3), lambda j, i: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, yb, _LANE), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((x_size, y_size, _LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        )(stacked, w)

    def step(t, w):
        o = one(w)
        return w + 0.0 * o[0, 0, 0]

    w = jax.lax.fori_loop(0, chain, step, warp)
    return one(w)


def _sync(x):
    return float(jnp.sum(x))


def timed(stacked, warp, body_kind, loop_kind, yb=64):
    try:
        t0 = time.perf_counter()
        _sync(run(stacked, warp, body_kind, loop_kind, yb, 1))
        compile_s = time.perf_counter() - t0
        best1 = min(
            (lambda t0=time.perf_counter(): (_sync(run(stacked, warp, body_kind,
             loop_kind, yb, 1)), time.perf_counter() - t0)[1])() for _ in range(3)
        )
        _sync(run(stacked, warp, body_kind, loop_kind, yb, 9))
        best9 = min(
            (lambda t0=time.perf_counter(): (_sync(run(stacked, warp, body_kind,
             loop_kind, yb, 9)), time.perf_counter() - t0)[1])() for _ in range(3)
        )
        per = (best9 - best1) / 8
        n_bodies = (128 // yb) * 128 * NBODY
        print(f"{body_kind:8s}/{loop_kind:6s} yb={yb:3d}: per-call={per*1e3:7.2f} ms  "
              f"per-body={per/n_bodies*1e6:6.2f} us  (compile {compile_s:.1f}s)")
    except Exception as e:  # noqa: BLE001
        print(f"{body_kind:8s}/{loop_kind:6s} yb={yb:3d}: FAILED "
              f"{type(e).__name__}: {str(e)[:140]}")


def main():
    rng = np.random.default_rng(0)
    y_size = 128
    xpad = 128 + N
    stacked = jnp.asarray(rng.standard_normal((N, xpad, y_size, _LANE)).astype(np.float32))
    warp = jnp.asarray((rng.standard_normal((128, y_size, _LANE, 3)) * 1.5).astype(np.float32))
    cases = sys.argv[1:] or [
        "nothing/fori", "slice/fori", "slice0/fori", "gather/fori", "full/fori",
        "nothing/static", "full/static",
    ]
    for case in cases:
        parts = case.split("/")
        body_kind, loop_kind = parts[0], parts[1]
        yb = int(parts[2]) if len(parts) > 2 else 64
        timed(stacked, warp, body_kind, loop_kind, yb)


if __name__ == "__main__":
    main()
