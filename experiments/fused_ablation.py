"""Where does the fused kernel's time go? Chain N kernel calls in one jit
(dispatch floor differenced) with energy components toggled."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from levelsetfusion_tpu.ops.pallas.fused_gradient import (
    fused_gradient_update,
    sobolev_taps,
)

SHAPE = (128, 128, 128)
N1, N2 = 4, 44


def main():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(SHAPE).astype(np.float32)
    canonical = jnp.asarray(np.tanh(base * 0.4))
    warped = jnp.asarray(np.tanh(np.roll(base, 1, 0) * 0.4))
    warp_cm = jnp.asarray(
        (rng.standard_normal((3,) + SHAPE) * 0.5).astype(np.float32)
    )
    taps = sobolev_taps(7, 0.1)

    cases = {
        "full(kill+ls+sob)": dict(w_smooth=0.1, w_ls=0.1, killing=True,
                                  taps=taps),
        "no_sobolev": dict(w_smooth=0.1, w_ls=0.1, killing=True, taps=()),
        "no_levelset": dict(w_smooth=0.1, w_ls=0.0, killing=True, taps=taps),
        "tikhonov": dict(w_smooth=0.1, w_ls=0.1, killing=False, taps=taps),
        "data_only": dict(w_smooth=0.0, w_ls=0.0, killing=False, taps=()),
    }

    out = {}
    for name, kw in cases.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(w, n):
            def body(i, w):
                nw, _ = fused_gradient_update(
                    warped, canonical, w, jnp.float32(0.1),
                    band_union=True, gamma=0.1, **kw,
                )
                return nw

            return jax.lax.fori_loop(0, n, body, w)

        def t(n):
            float(jnp.sum(chain(warp_cm, n)))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(chain(warp_cm, n)))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t(N2) - t(N1)) / (N2 - N1)
        out[name] = round(per * 1e3, 4)
    print(json.dumps({"shape": SHAPE, "ms_per_kernel_call": out}))


if __name__ == "__main__":
    main()
