"""MXU offload experiment for the fused kernel's Sobolev convs
(VERDICT r2 weak #1 / next-round #7: "attempt the MXU banded-matmul
offload of the Sobolev convs/derivatives, or produce a profiler-backed
note proving VPU-bound is the wall").

Idea: a separable K-tap conv along the sublane (y) or lane (z) axis is a
banded matmul with a (128, 128) Toeplitz matrix, and the zero-edge
convention falls out of the band being cut at the matrix boundary — no
masks. Two chained contractions cycle the layout back with NO transposes:

    (x, y, z) ·_y C_y → (x, z, Y)      [contracted axis moves to the end]
    (x, z, Y) ·_z C_z → (x, Y, Z)      [and again — back to (x, y, z)]

fp32 inputs with precision=HIGHEST keep parity with the VPU path (the
MXU's bf16 passes would otherwise truncate the taps).

Measures, per variant, the cost of y+z convs on a (64, 128, 128) f32
block over R in-kernel repetitions (dispatch floor amortized).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _taps():
    from levelsetfusion_tpu.ops import sobolev

    k = np.asarray(sobolev.generate_1d_sobolev_kernel(7, 0.1))
    return tuple(float(v) for v in k)


def _band(n, taps):
    k = len(taps)
    r = k // 2
    m = np.zeros((n, n), np.float32)
    for j in range(n):
        for s in range(-r, r + 1):
            if 0 <= j + s < n:
                # out[j] = sum_s taps[r+s] * a[j+s]  =>  C[j+s, j] += taps[r+s]
                m[j + s, j] += taps[r + s]
    return m


def _roll(a, s, axis):
    return jnp.roll(a, s, axis=axis)


def _conv_vpu(a, vec, vec_end, taps, axis):
    # out[j] += taps[r−s]·a[j−s] (roll +s, valid j ≥ s) and
    # taps[r+s]·a[j+s] (roll −s, valid j ≤ n−1−s). The production kernel's
    # pairing differs cosmetically (symmetric taps + windowed slack); this
    # standalone replica needs the masks to match the reads exactly.
    r = len(taps) // 2
    out = taps[r] * a
    for s in range(1, r + 1):
        ok_m = vec >= s
        ok_p = vec_end <= -s
        out = out + taps[r - s] * jnp.where(ok_m, _roll(a, s, axis), 0.0)
        out = out + taps[r + s] * jnp.where(ok_p, _roll(a, -s, axis), 0.0)
    return out


def _kernel_vpu(a_ref, o_ref, *, taps, reps):
    y = lax.broadcasted_iota(jnp.int32, (1, a_ref.shape[1], 1), 1)
    z = lax.broadcasted_iota(jnp.int32, (1, 1, a_ref.shape[2]), 2)
    ye = y - (a_ref.shape[1] - 1)
    ze = z - (a_ref.shape[2] - 1)
    a = a_ref[...]

    def body(_, a):
        a = _conv_vpu(a, y, ye, taps, 1)
        return _conv_vpu(a, z, ze, taps, 2)

    o_ref[...] = lax.fori_loop(0, reps, body, a)


def _kernel_mxu(a_ref, cy_ref, cz_ref, o_ref, *, reps,
                precision=lax.Precision.HIGHEST):
    a = a_ref[...]
    cy = cy_ref[...]
    cz = cz_ref[...]

    def body(_, a):
        # (x, y, z) ·_y cy -> (x, z, Y); (x, z, Y) ·_z cz -> (x, Y, Z).
        t = lax.dot_general(
            a, cy, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return lax.dot_general(
            t, cz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    o_ref[...] = lax.fori_loop(0, reps, body, a)


def run(shape=(16, 128, 128), reps=1024, interpret=False):
    taps = _taps()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cy = jnp.asarray(_band(shape[1], taps))
    cz = jnp.asarray(_band(shape[2], taps))

    vpu = pl.pallas_call(
        functools.partial(_kernel_vpu, taps=taps, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    mxu = pl.pallas_call(
        functools.partial(_kernel_mxu, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )

    def sync(x):
        return float(jnp.sum(x))

    # Parity first (1 rep ≡ one y+z conv pass).
    vpu1 = pl.pallas_call(
        functools.partial(_kernel_vpu, taps=taps, reps=1),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    mxu1 = pl.pallas_call(
        functools.partial(_kernel_mxu, reps=1),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    pv = np.asarray(vpu1(a))
    pm = np.asarray(mxu1(a, cy, cz))
    err = float(np.max(np.abs(pv - pm)))

    out = {"shape": shape, "reps": reps, "parity_max_abs_err": err}
    # Dispatch floor (~24 ms axon tunnel) dominates a single call: difference
    # the heavy-rep call against the 1-rep call to isolate per-pass compute.
    mxu_bf16 = pl.pallas_call(
        functools.partial(
            _kernel_mxu, reps=reps, precision=lax.Precision.DEFAULT
        ),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    mxu_bf16_1 = pl.pallas_call(
        functools.partial(
            _kernel_mxu, reps=1, precision=lax.Precision.DEFAULT
        ),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )
    out["bf16_vs_f32_max_abs_err"] = float(
        np.max(np.abs(np.asarray(mxu_bf16_1(a, cy, cz)) - pm))
    )
    for name, fn, fn1, args in (
        ("vpu", vpu, vpu1, (a,)),
        ("mxu", mxu, mxu1, (a, cy, cz)),
        ("mxu_bf16", mxu_bf16, mxu_bf16_1, (a, cy, cz)),
    ):
        sync(fn(*args))
        sync(fn1(*args))
        best_n = best_1 = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(fn(*args))
            best_n = min(best_n, time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(fn1(*args))
            best_1 = min(best_1, time.perf_counter() - t0)
        out[f"{name}_us_per_convpass"] = (
            (best_n - best_1) / (reps - 1) * 1e6
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run(interpret="--interpret" in sys.argv)
