"""Hardware (real-Mosaic) parity check of the y-tiled fused kernel.

The per-commit tests cover the tiled kernel in interpret mode; interpret
mode does not enforce Mosaic's sublane-alignment rules (the `pl.multiple_of`
hints exist precisely because a real compile rejected the clip-derived
offsets). This script runs the tiled kernel on the real chip at a small
multi-block shape and asserts parity vs the pure-jnp golden assembly.
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from levelsetfusion_tpu.ops import sobolev as sobolev_ops
from levelsetfusion_tpu.ops import terms
from levelsetfusion_tpu.ops.derivatives import gradient
from levelsetfusion_tpu.ops.pallas.fused_gradient import (
    fused_gradient_update,
    sobolev_taps,
)


def golden(warped, canonical, warp, rate, kernel, *, w_smooth, w_ls, gamma):
    wg = gradient(warped)
    g_data, _ = terms.data_term(warped, canonical, wg, band_union_only=True)
    total = g_data
    g_s, _ = terms.killing_term(warp, gamma)
    total = total + w_smooth * g_s
    g_ls, _ = terms.level_set_term(warped, wg, canonical, band_union_only=True)
    total = total + w_ls * g_ls
    total = sobolev_ops.convolve_with_sobolev_kernel(
        total, kernel, num_spatial_dims=3
    )
    return warp - rate * total


def main():
    rng = np.random.default_rng(7)
    shape = (16, 64, 128)
    warped = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    canonical = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    warp = jnp.asarray(
        rng.uniform(-0.5, 0.5, shape + (3,)).astype(np.float32)
    )
    rate = jnp.float32(0.2)
    ksize, kstr = 7, 0.1
    kernel = jnp.asarray(sobolev_ops.generate_1d_sobolev_kernel(ksize, kstr))
    taps = sobolev_taps(ksize, kstr)

    warp_cm = jnp.moveaxis(warp, -1, 0)
    got_cm, stats = fused_gradient_update(
        warped, canonical, warp_cm, rate,
        w_data=1.0, w_smooth=0.1, w_ls=0.1, killing=True, gamma=0.1,
        band_union=True, taps=taps, force_tiled=True,
    )
    got = np.asarray(jnp.moveaxis(got_cm, 0, -1))
    want = np.asarray(
        golden(warped, canonical, warp, rate, kernel,
               w_smooth=0.1, w_ls=0.1, gamma=0.1)
    )
    err = float(np.max(np.abs(got - want)))
    out = {
        "mode": "tiled_hw_parity",
        "platform": jax.devices()[0].platform,
        "shape": shape,
        "max_abs_err": err,
        "max_update": float(stats.max_update),
    }
    print(json.dumps(out))
    assert err < 2e-5, err


if __name__ == "__main__":
    main()
