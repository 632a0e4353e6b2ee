"""Probe: manual HBM->VMEM DMA with dynamic multi-dim offsets + double buffer.

Validates the mechanism the y-tiled fused kernel needs:
- inputs with memory_space=ANY (stay in HBM), manual make_async_copy windows
- dynamic offsets on leading (x) and second-minor (y, 8-aligned) dims
- scratch/semaphore persistence across sequential grid steps
- works in interpret mode (CPU) and compiled (TPU)

Run: python experiments/dma_probe.py [--cpu]
"""
import sys
import functools

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X, Y, Z = 32, 64, 128
XB, YB = 8, 16
HX, HY = 5, 8
XW, YW = XB + 2 * HX, YB + 2 * HY
NX, NY = X // XB, Y // YB


def kernel(a_hbm, u_hbm, out_ref, abuf, ubuf, sems):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ny = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ny
    k = i * ny + j

    def offs(lin):
        ii = lin // ny
        jj = lin % ny
        ox = jnp.clip(ii * XB - HX, 0, X - XW)
        oy = jnp.clip(jj * YB - HY, 0, Y - YW)
        return ox, oy

    def start(lin, slot):
        ox, oy = offs(lin)
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(ox, XW), pl.ds(oy, YW), :],
            abuf.at[slot], sems.at[slot, 0],
        ).start()
        for c in range(2):
            pltpu.make_async_copy(
                u_hbm.at[c, pl.ds(ox, XW), pl.ds(oy, YW), :],
                ubuf.at[slot, c], sems.at[slot, 1 + c],
            ).start()

    def wait(lin, slot):
        ox, oy = offs(lin)
        pltpu.make_async_copy(
            a_hbm.at[pl.ds(ox, XW), pl.ds(oy, YW), :],
            abuf.at[slot], sems.at[slot, 0],
        ).wait()
        for c in range(2):
            pltpu.make_async_copy(
                u_hbm.at[c, pl.ds(ox, XW), pl.ds(oy, YW), :],
                ubuf.at[slot, c], sems.at[slot, 1 + c],
            ).wait()

    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        start(k, slot)

    @pl.when(k + 1 < nsteps)
    def _():
        start(k + 1, jax.lax.rem(k + 1, 2))

    wait(k, slot)

    ox, oy = offs(k)
    slx = i * XB - ox
    sly = j * YB - oy
    a = abuf[slot]
    u0 = ubuf[slot, 0]
    u1 = ubuf[slot, 1]
    val = a * 2.0 + u0 - u1
    out_ref[:] = val[...]  # full window compute
    # dynamic slice of the interior via ref slicing
    out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:, :, :] = val[...][pl.ds(0, XB + 2 * HX)][0:XB] * 0.0  # noop shape check


def kernel2(a_hbm, u_hbm, out_ref, abuf, ubuf, stage, sems):
    # realistic version: compute on window, stage, ds-slice interior to out
    i = pl.program_id(0)
    j = pl.program_id(1)
    ny = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ny
    k = i * ny + j

    def offs(lin):
        ii = lin // ny
        jj = lin % ny
        ox = jnp.clip(ii * XB - HX, 0, X - XW)
        oy = jnp.clip(jj * YB - HY, 0, Y - YW)
        return ox, oy

    def dmas(lin, slot):
        ox, oy = offs(lin)
        out = [pltpu.make_async_copy(
            a_hbm.at[pl.ds(ox, XW), pl.ds(oy, YW), :],
            abuf.at[slot], sems.at[slot, 0])]
        for c in range(2):
            out.append(pltpu.make_async_copy(
                u_hbm.at[c, pl.ds(ox, XW), pl.ds(oy, YW), :],
                ubuf.at[slot, c], sems.at[slot, 1 + c]))
        return out

    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _():
        for d in dmas(k, slot):
            d.start()

    @pl.when(k + 1 < nsteps)
    def _():
        for d in dmas(k + 1, jax.lax.rem(k + 1, 2)):
            d.start()

    for d in dmas(k, slot):
        d.wait()

    ox, oy = offs(k)
    slx = i * XB - ox
    sly = j * YB - oy
    val = abuf[slot] * 2.0 + ubuf[slot, 0] - ubuf[slot, 1]
    stage[:] = val
    out_ref[:] = stage[pl.ds(slx, XB), pl.ds(sly, YB), :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(a, u, interpret=False):
    return pl.pallas_call(
        kernel2,
        grid=(NX, NY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((XB, YB, Z), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, XW, YW, Z), jnp.float32),
            pltpu.VMEM((2, 2, XW, YW, Z), jnp.float32),
            pltpu.VMEM((XW, YW, Z), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(a, u)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((X, Y, Z)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((2, X, Y, Z)), jnp.float32)
    want = a * 2.0 + u[0] - u[1]
    interp = "--cpu" in sys.argv
    got = run(a, u, interpret=interp)
    err = float(jnp.max(jnp.abs(got - want)))
    print("platform:", jax.devices()[0].platform, "interpret:", interp,
          "max|err|:", err)
    assert err == 0.0, err
    print("OK")
