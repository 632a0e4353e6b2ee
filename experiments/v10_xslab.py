"""v10 prototype: XB x-rows per grid step, 3D slab bodies, active-range loop.

Setup (z-setup, tent planes, min/max reductions, scalar bound syncs) was
~20us/step x 512 steps in v9; amortize it over XB rows. Bodies become
(XB, yb, 128) slabs sliced with dynamic-start/static-size on the leading x
dim of the stacked window.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from levelsetfusion_tpu.ops.interpolation import warp_field  # noqa: E402

_LANE = 128
K = 2
N = 2 * K + 2
FILL = 1.0


def _tent(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _kernel_v10(s_ref, warp_ref, out_ref, tx_ref, ty_ref, *, xb_steps: int):
    # s_ref: (N, win, yb, 128) x-chunk window; this grid step covers rows
    # [ri*XB, (ri+1)*XB) within the chunk.
    i = pl.program_id(1)
    nchunk = s_ref.shape[1] - (N - 1)  # rows per x-chunk window
    per_chunk = nchunk // xb_steps  # grid steps per chunk... XB = xb_steps? no
    kf = float(K)

    xb = out_ref.shape[0]
    yb = out_ref.shape[1]
    flat = (xb * yb, _LANE)
    ux = jnp.clip(warp_ref[:, :, :, 0], -kf, kf).reshape(flat)
    uy = jnp.clip(warp_ref[:, :, :, 1], -kf, kf).reshape(flat)
    uz = warp_ref[:, :, :, 2].reshape(flat)
    nz = jnp.floor(uz)
    fz = uz - nz
    z0 = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + nz.astype(jnp.int32)
    z0c = jnp.clip(z0, 0, _LANE - 1)
    z1c = jnp.clip(z0 + 1, 0, _LANE - 1)
    w0 = jnp.where((z0 >= 0) & (z0 < _LANE), 1.0 - fz, 0.0)
    w1 = jnp.where((z0 + 1 >= 0) & (z0 + 1 < _LANE), fz, 0.0)
    for c in range(N):
        tx_ref[c] = _tent(ux - (float(c) - kf))
        ty_ref[c] = _tent(uy - (float(c) - kf))

    lo_x = jnp.floor(jnp.min(ux)).astype(jnp.int32) + K
    hi_x = jnp.floor(jnp.max(ux)).astype(jnp.int32) + K + 1
    lo_y = jnp.floor(jnp.min(uy)).astype(jnp.int32) + K
    hi_y = jnp.floor(jnp.max(uy)).astype(jnp.int32) + K + 1
    cnt_x = hi_x - lo_x + 1
    cnt_y = hi_y - lo_y + 1

    r0 = (i % (nchunk // xb)) * xb  # start row within the chunk window

    def body(t, acc):
        cy = lo_y + t // cnt_x
        cx = lo_x + (t - (t // cnt_x) * cnt_x)
        rows = s_ref[cy, pl.ds(r0 + cx, xb)].reshape(flat)  # (xb*yb, 128)
        w = ty_ref[cy] * tx_ref[cx]
        g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
            rows, z1c, axis=1
        )
        return acc + w * g

    acc0 = (1.0 - w0 - w1) * FILL
    acc = jax.lax.fori_loop(0, cnt_y * cnt_x, body, acc0)
    out_ref[...] = acc.reshape(xb, yb, _LANE)


@functools.partial(jax.jit, static_argnames=("xb", "yb", "chunk"))
def run_v10(field, warp, xb=8, yb=64, chunk=128):
    x_size, y_size, _ = field.shape
    padded = jnp.pad(field, ((K, K + 1), (K, K + 1), (0, 0)), constant_values=FILL)
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(N)])
    win = chunk + N - 1
    kern = functools.partial(_kernel_v10, xb_steps=xb)
    return pl.pallas_call(
        kern,
        grid=(y_size // yb, x_size // xb),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(N), pl.Element(win), pl.Element(yb), pl.Element(_LANE)),
                lambda j, i, xb=xb, yb=yb, chunk=chunk: (
                    0, ((i * xb) // chunk) * chunk, j * yb, 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (xb, yb, _LANE, 3), lambda j, i: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (xb, yb, _LANE), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
        scratch_shapes=[
            pltpu.VMEM((N, xb * yb, _LANE), jnp.float32),
            pltpu.VMEM((N, xb * yb, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(stacked, warp)


def _sync(x):
    return float(jnp.sum(x))


def main():
    shape = (128, 128, 128)
    rng = np.random.default_rng(0)
    field = jnp.asarray(np.tanh(rng.standard_normal(shape) * 0.3).astype(np.float32))

    for scale, smooth in [(1.5, False), (0.5, True)]:
        w = rng.standard_normal(shape + (3,)).astype(np.float32) * scale
        if smooth:
            # Smooth warp: low-frequency sinusoid — the solver-realistic case.
            xs = np.linspace(0, 2 * np.pi, shape[0], dtype=np.float32)
            w = np.stack([
                scale * np.sin(xs)[:, None, None] * np.ones(shape, np.float32),
                scale * np.cos(xs)[None, :, None].transpose(1, 0, 2) * np.ones(shape, np.float32),
                scale * np.sin(2 * xs)[None, None, :] * np.ones(shape, np.float32),
            ], axis=-1)
        warp = jnp.asarray(w)
        wc = jnp.concatenate([jnp.clip(warp[..., :2], -K, K), warp[..., 2:]], axis=-1)
        ref = np.asarray(jax.jit(warp_field)(field, wc))
        for xb in (4, 8, 16):
            try:
                out = run_v10(field, warp, xb=xb)
                err = float(np.max(np.abs(np.asarray(out) - ref)))

                @functools.partial(jax.jit, static_argnames=("n", "xb"))
                def chain(wp, n, xb):
                    def body(t, wp):
                        o = run_v10(field, wp, xb=xb)
                        return wp + 0.0 * o[0, 0, 0]
                    return jax.lax.fori_loop(0, n, body, wp)

                _sync(chain(warp, 1, xb))
                t1 = min((lambda t0=time.perf_counter(): (_sync(chain(warp, 1, xb)),
                          time.perf_counter() - t0)[1])() for _ in range(3))
                _sync(chain(warp, 9, xb))
                t9 = min((lambda t0=time.perf_counter(): (_sync(chain(warp, 9, xb)),
                          time.perf_counter() - t0)[1])() for _ in range(3))
                tag = "smooth" if smooth else "random"
                print(f"v10 xb={xb:2d} {tag} s={scale}: {(t9 - t1) / 8 * 1e3:7.2f} ms  "
                      f"maxerr={err:.2e}")
            except Exception as e:  # noqa: BLE001
                print(f"v10 xb={xb}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
