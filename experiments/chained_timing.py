"""Measure true kernel cost by chaining N dependent calls inside one jit,
subtracting the tunnel/dispatch floor: cost = (t_N - t_1) / (N - 1)."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments.resample_variants import run_vmemfull  # noqa: E402
from levelsetfusion_tpu.ops.pallas.resample import warp_field_pallas  # noqa: E402
from levelsetfusion_tpu.ops.interpolation import warp_field  # noqa: E402


def _sync(x):
    return float(jnp.sum(x))


@functools.partial(jax.jit, static_argnames=("n", "which", "inner"))
def chain(field, warp, n, which, inner="fori"):
    def body(i, f):
        if which == "vf":
            out = run_vmemfull(f, warp, inner=inner)
        elif which == "v6":
            out = warp_field_pallas(f, warp)
        else:
            out = warp_field(f, warp)
        # tiny data dependence to force sequencing
        return out + 0.0 * f[0, 0, 0]

    return jax.lax.fori_loop(0, n, body, field)


def timed(field, warp, n, which, inner="fori", repeats=3):
    out = chain(field, warp, n, which, inner)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = chain(field, warp, n, which, inner)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    shape = (128, 128, 128)
    rng = np.random.default_rng(0)
    field = jnp.asarray(np.tanh(rng.standard_normal(shape) * 0.3).astype(np.float32))
    warp = jnp.asarray((rng.standard_normal(shape + (3,)) * 1.5).astype(np.float32))

    # Tunnel floor: trivial jit roundtrip.
    f = jax.jit(lambda x: jnp.sum(x) * 1.0)
    _sync(f(field))
    floor = min(
        (lambda t0=time.perf_counter(): (_sync(f(field)), time.perf_counter() - t0)[1])()
        for _ in range(5)
    )
    print(f"tunnel/dispatch floor: {floor * 1e3:.2f} ms")

    for which, inner in [("vf", "fori"), ("vf", "chunk"), ("xla", None)]:
        t1 = timed(field, warp, 1, which, inner or "fori")
        tn = timed(field, warp, 9, which, inner or "fori")
        per = (tn - t1) / 8
        print(f"{which}/{inner}: t1={t1*1e3:8.2f} ms  t9={tn*1e3:8.2f} ms  "
              f"per-call={per*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
