"""Kernel-variant timing harness for the Pallas warp-resample (KERNEL_NOTES
step 1: find the ~27x overhead of the fori pair-pass).

Run on TPU:  python experiments/resample_variants.py [variant ...]

Variants (all compute the same resample unless marked TIMING-ONLY):
  v6        current production kernel (dynamic s_ref[cy,cx], fori n*n)
  static00  TIMING-ONLY: s_ref[0,0] static index — isolates dynamic-index cost
  nogather  TIMING-ONLY: drop the two take_along_axis — isolates gather cost
  noslice   TIMING-ONLY: hoist one static slice, fori only does weights+gather
  twolevel  static-unrolled cy (python loop), fori over cx
  chunk     fori over cy, static-unrolled cx inside the body
  unroll    fully static-unrolled n*n python loop (small yb)
  yb128     v6 with y_block=128
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRUNCATION_FILL = 1.0
_LANE = 128


def _tent(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _z_setup(warp_ref):
    ux = warp_ref[0, :, :, 0]
    uy = warp_ref[0, :, :, 1]
    uz = warp_ref[0, :, :, 2]
    nz = jnp.floor(uz)
    fz = uz - nz
    z0 = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + nz.astype(jnp.int32)
    z0c = jnp.clip(z0, 0, _LANE - 1)
    z1c = jnp.clip(z0 + 1, 0, _LANE - 1)
    w0 = jnp.where((z0 >= 0) & (z0 < _LANE), 1.0 - fz, 0.0)
    w1 = jnp.where((z0 + 1 >= 0) & (z0 + 1 < _LANE), fz, 0.0)
    return ux, uy, z0c, z1c, w0, w1


def _kernel_v6(s_ref, warp_ref, out_ref, *, k, mode):
    n = 2 * k + 2
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)

    def body(t, acc):
        cy = t // n
        cx = t - cy * n
        if mode == "static00":
            rows = s_ref[0, 0]
        else:
            rows = s_ref[cy, cx]
        w = _tent(uy - (cy.astype(jnp.float32) - kf)) * _tent(
            ux - (cx.astype(jnp.float32) - kf)
        )
        if mode == "nogather":
            g = w0 * rows + w1 * rows
        else:
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
        return acc + w * g

    acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
    out_ref[0] = jax.lax.fori_loop(0, n * n, body, acc0)


def _kernel_noslice(s_ref, warp_ref, out_ref, *, k):
    n = 2 * k + 2
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)
    rows = s_ref[0, 0]  # hoisted static slice (TIMING-ONLY semantics)

    def body(t, acc):
        cy = t // n
        cx = t - cy * n
        w = _tent(uy - (cy.astype(jnp.float32) - kf)) * _tent(
            ux - (cx.astype(jnp.float32) - kf)
        )
        g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
            rows, z1c, axis=1
        )
        return acc + w * g

    acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
    out_ref[0] = jax.lax.fori_loop(0, n * n, body, acc0)


def _kernel_twolevel(s_ref, warp_ref, out_ref, *, k):
    n = 2 * k + 2
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)
    acc = (1.0 - w0 - w1) * TRUNCATION_FILL
    for cy in range(n):  # static
        wy = _tent(uy - (float(cy) - kf))

        def body(cx, acc, cy=cy, wy=wy):
            rows = s_ref[cy, cx]
            w = wy * _tent(ux - (cx.astype(jnp.float32) - kf))
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
            return acc + w * g

        acc = jax.lax.fori_loop(0, n, body, acc)
    out_ref[0] = acc


def _kernel_chunk(s_ref, warp_ref, out_ref, *, k):
    n = 2 * k + 2
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)

    def body(cy, acc):
        wy = _tent(uy - (cy.astype(jnp.float32) - kf))
        for cx in range(n):  # static
            rows = s_ref[cy, cx]
            w = wy * _tent(ux - (float(cx) - kf))
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
            acc = acc + w * g
        return acc

    acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
    out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)


def _kernel_unroll(s_ref, warp_ref, out_ref, *, k):
    n = 2 * k + 2
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)
    acc = (1.0 - w0 - w1) * TRUNCATION_FILL
    for cy in range(n):
        wy = _tent(uy - (float(cy) - kf))
        for cx in range(n):
            rows = s_ref[cy, cx]
            w = wy * _tent(ux - (float(cx) - kf))
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
            acc = acc + w * g
    out_ref[0] = acc


def _kernel_passthrough(s_ref, warp_ref, out_ref, *, k):
    # TIMING-ONLY: no fori at all — pure grid + DMA overhead.
    out_ref[0] = s_ref[0, 0] + warp_ref[0, :, :, 0]


def _kernel_onepair(s_ref, warp_ref, out_ref, *, k):
    # TIMING-ONLY: full z-setup + exactly one pair body, no loop.
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    rows = s_ref[0, 0]
    w = _tent(uy) * _tent(ux)
    g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
        rows, z1c, axis=1
    )
    out_ref[0] = (1.0 - w0 - w1) * TRUNCATION_FILL + w * g


KERNELS = {
    "passthrough": (_kernel_passthrough, 64),
    "onepair": (_kernel_onepair, 64),
    "v6": (functools.partial(_kernel_v6, mode="dyn"), 64),
    "static00": (functools.partial(_kernel_v6, mode="static00"), 64),
    "nogather": (functools.partial(_kernel_v6, mode="nogather"), 64),
    "noslice": (_kernel_noslice, 64),
    "twolevel": (_kernel_twolevel, 64),
    "chunk": (_kernel_chunk, 64),
    "unroll": (_kernel_unroll, 8),
    "yb128": (functools.partial(_kernel_v6, mode="dyn"), 128),
}


@functools.partial(jax.jit, static_argnames=("variant", "k"))
def run_variant(field, warp, variant="v6", k=2):
    kern_fn, yb = KERNELS[variant]
    n = 2 * k + 2
    x_size, y_size, _ = field.shape
    yb = min(yb, y_size)
    wc = jnp.concatenate([jnp.clip(warp[..., :2], -k, k), warp[..., 2:]], axis=-1)
    padded = jnp.pad(
        field, ((k, k + 1), (k, k + 1), (0, 0)), constant_values=TRUNCATION_FILL
    )
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(n)])
    kern = functools.partial(kern_fn, k=k)
    return pl.pallas_call(
        kern,
        grid=(x_size, y_size // yb),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(n), pl.Element(n), pl.Element(yb), pl.Element(_LANE)),
                lambda i, j, yb=yb: (0, i, j * yb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, yb, _LANE, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, yb, _LANE), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(stacked, wc)


def _kernel_vmemfull(s_ref, warp_ref, out_ref, *, k, inner):
    # s_ref: (n, xpad, yb, 128) — FULL padded-x stacked array resident in
    # VMEM; x window via dynamic leading-dim indexing (cheap), no Element
    # blocks. Grid = (y_blocks, x) with x fastest so s_ref DMAs once per
    # y-block.
    n = 2 * k + 2
    i = pl.program_id(1)
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)

    if inner == "fori":
        def body(t, acc):
            cy = t // n
            cx = t - cy * n
            rows = s_ref[cy, i + cx]
            w = _tent(uy - (cy.astype(jnp.float32) - kf)) * _tent(
                ux - (cx.astype(jnp.float32) - kf)
            )
            g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
                rows, z1c, axis=1
            )
            return acc + w * g

        acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
        out_ref[0] = jax.lax.fori_loop(0, n * n, body, acc0)
    elif inner == "chunk":
        def body(cy, acc):
            wy = _tent(uy - (cy.astype(jnp.float32) - kf))
            for cx in range(n):
                rows = s_ref[cy, i + cx]
                w = wy * _tent(ux - (float(cx) - kf))
                g = w0 * jnp.take_along_axis(rows, z0c, axis=1) \
                    + w1 * jnp.take_along_axis(rows, z1c, axis=1)
                acc = acc + w * g
            return acc

        acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
        out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)
    else:  # full static unroll
        acc = (1.0 - w0 - w1) * TRUNCATION_FILL
        for cy in range(n):
            wy = _tent(uy - (float(cy) - kf))
            for cx in range(n):
                rows = s_ref[cy, i + cx]
                w = wy * _tent(ux - (float(cx) - kf))
                g = w0 * jnp.take_along_axis(rows, z0c, axis=1) \
                    + w1 * jnp.take_along_axis(rows, z1c, axis=1)
                acc = acc + w * g
        out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("inner", "k", "yb"))
def run_vmemfull(field, warp, inner="fori", k=2, yb=64):
    n = 2 * k + 2
    x_size, y_size, _ = field.shape
    wc = jnp.concatenate([jnp.clip(warp[..., :2], -k, k), warp[..., 2:]], axis=-1)
    padded = jnp.pad(
        field, ((k, k + 1), (k, k + 1), (0, 0)), constant_values=TRUNCATION_FILL
    )
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(n)])
    xpad = stacked.shape[1]
    kern = functools.partial(_kernel_vmemfull, k=k, inner=inner)
    return pl.pallas_call(
        kern,
        grid=(y_size // yb, x_size),  # x fastest => stacked DMA per y-block only
        in_specs=[
            pl.BlockSpec(
                (n, xpad, yb, _LANE),
                lambda j, i: (0, 0, j, 0),
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
        out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(stacked, wc)


def _kernel_v7(s_ref, warp_ref, out_ref, *, k, structure):
    # Lean-body variant: precompute per-grid-step tent weight planes for all
    # shifts (and the z-gather indices/weights) ONCE; each pair body is then
    # slice + 2 lane-gathers + 6 elementwise ops.
    n = 2 * k + 2
    i = pl.program_id(1)
    ux, uy, z0c, z1c, w0, w1 = _z_setup(warp_ref)
    kf = jnp.float32(k)
    tx = [_tent(ux - (float(c) - kf)) for c in range(n)]
    ty = [_tent(uy - (float(c) - kf)) for c in range(n)]

    if structure == "chunk":
        def body(cy, acc):
            # wy via dynamic select over precomputed planes (avoid recompute)
            wy = _tent(uy - (cy.astype(jnp.float32) - kf))
            for cx in range(n):
                rows = s_ref[cy, i + cx]
                g = w0 * jnp.take_along_axis(rows, z0c, axis=1) \
                    + w1 * jnp.take_along_axis(rows, z1c, axis=1)
                acc = acc + (wy * tx[cx]) * g
            return acc

        acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL
        out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)
    else:  # full static unroll, lean bodies
        acc = (1.0 - w0 - w1) * TRUNCATION_FILL
        for cy in range(n):
            for cx in range(n):
                rows = s_ref[cy, i + cx]
                g = w0 * jnp.take_along_axis(rows, z0c, axis=1) \
                    + w1 * jnp.take_along_axis(rows, z1c, axis=1)
                acc = acc + (ty[cy] * tx[cx]) * g
        out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("structure", "k", "yb"))
def run_v7(field, warp, structure="chunk", k=2, yb=64):
    n = 2 * k + 2
    x_size, y_size, _ = field.shape
    wc = jnp.concatenate([jnp.clip(warp[..., :2], -k, k), warp[..., 2:]], axis=-1)
    padded = jnp.pad(
        field, ((k, k + 1), (k, k + 1), (0, 0)), constant_values=TRUNCATION_FILL
    )
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(n)])
    xpad = stacked.shape[1]
    kern = functools.partial(_kernel_v7, k=k, structure=structure)
    return pl.pallas_call(
        kern,
        grid=(y_size // yb, x_size),
        in_specs=[
            pl.BlockSpec(
                (n, xpad, yb, _LANE),
                lambda j, i: (0, 0, j, 0),
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
        out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(stacked, wc)


def _sync(x):
    return float(jnp.sum(x))


def time_variant(name, field, warp, k=2, repeats=5):
    t0 = time.perf_counter()
    out = run_variant(field, warp, variant=name, k=k)
    _sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run_variant(field, warp, variant=name, k=k)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, compile_s, out


def main():
    shape = (128, 128, 128)
    rng = np.random.default_rng(0)
    field = jnp.asarray(np.tanh(rng.standard_normal(shape) * 0.3).astype(np.float32))
    warp = jnp.asarray(
        (rng.standard_normal(shape + (3,)) * 1.5).astype(np.float32)
    )
    names = sys.argv[1:] or ["v6", "static00", "nogather", "noslice", "twolevel",
                             "chunk", "yb128"]
    # Golden reference (with the fast path's documented x/y clamp applied).
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from levelsetfusion_tpu.ops.interpolation import warp_field as _golden
    k = 2
    wc = jnp.concatenate([jnp.clip(warp[..., :2], -k, k), warp[..., 2:]], axis=-1)
    ref = np.asarray(jax.jit(_golden)(field, wc))
    for name in names:
        try:
            if name.startswith("vf_") or name.startswith("v7_"):
                parts = name.split("_")  # {vf,v7}_<inner>[_yb<N>]
                inner = parts[1]
                yb = int(parts[2][2:]) if len(parts) > 2 else 64
                runner = run_v7 if name.startswith("v7_") else run_vmemfull
                kw = {"structure" if name.startswith("v7_") else "inner": inner}
                t0 = time.perf_counter()
                out = runner(field, warp, yb=yb, **kw)
                _sync(out)
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    out = runner(field, warp, yb=yb, **kw)
                    _sync(out)
                    best = min(best, time.perf_counter() - t0)
                if ref is not None:
                    err = float(np.max(np.abs(np.asarray(out) - ref)))
                    print(f"{name:10s} {best * 1e3:8.2f} ms   (compile "
                          f"{compile_s:.1f}s) maxerr_vs_v6={err:.2e}")
                else:
                    print(f"{name:10s} {best * 1e3:8.2f} ms   (compile {compile_s:.1f}s)")
                continue
            best, compile_s, out = time_variant(name, field, warp)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        note = ""
        if ref is not None and name not in ("static00", "nogather", "noslice",
                                            "passthrough", "onepair"):
            err = float(np.max(np.abs(np.asarray(out) - ref)))
            note = f" maxerr_vs_v6={err:.2e}"
        print(f"{name:10s} {best * 1e3:8.2f} ms   (compile {compile_s:.1f}s){note}")


if __name__ == "__main__":
    main()
