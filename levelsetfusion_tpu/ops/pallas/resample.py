"""Pallas TPU warp-resample kernel — the pipeline's dominant cost.

Why a kernel: XLA lowers the trilinear gather ``Φ_live(x + u(x))`` to a
general TPU gather (~198 ms per 128³ resample on v5e — measured; TPUs have
no hardware gather). This kernel exploits the problem's structure instead
and measures **84 ms at K=2 / 40 ms at K=1** for the same resample (see
KERNEL_NOTES.md for the full design-space log and the next optimization
steps).

Design (exact trilinear for per-axis displacements ``|u| ≤ K``; larger x/y
displacements are clamped — documented fast-path semantics; z is unbounded):

- **x/y integer offsets** are enumerated over the ``(2K+2)²`` shift pairs
  with exact *tent weights* (Σ_s tent(u−s)·plane[x+s] ≡ linear
  interpolation: only the two bracketing terms per axis are nonzero and the
  weights select them). All terms are combined in the *output* frame, so
  there is no separable-warp approximation: this matches the golden op to
  float precision.
- The **y shifts are pre-materialized** as a stacked array of 2K+2 y-shifted
  copies (cheap XLA slices) so that every in-kernel access is a tile-aligned
  block — unaligned sublane access on TPU forces murderous relayouts.
- The **x slab** rides an all-``pl.Element`` BlockSpec whose x start is the
  raw grid index (element-granular overlapping windows).
- The **z axis** uses the VPU's per-element dynamic gather within one vreg
  (``tpu.dynamic_gather`` via ``take_along_axis``, lane width 128) with both
  interpolation corners and out-of-band +1 fill folded into per-corner
  weights — hence the fast path requires the trailing extent to equal 128.

``warp_field_fast`` dispatches: Pallas on TPU when the shape fits, golden
jnp path otherwise. Parity: tests/test_pallas.py (interpret mode on CPU) and
the identical check compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from levelsetfusion_tpu.ops.interpolation import TRUNCATION_FILL, warp_field

# Default maximum supported x/y displacement magnitude (voxels), static.
MAX_DISPLACEMENT = 2
_LANE = 128


def _tent(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _resample3d_kernel(s_ref, warp_ref, out_ref, *, k: int):
    n = 2 * k + 2
    ux = warp_ref[0, :, :, 0]
    uy = warp_ref[0, :, :, 1]
    uz = warp_ref[0, :, :, 2]
    nz = jnp.floor(uz)
    fz = uz - nz
    z0 = jax.lax.broadcasted_iota(jnp.int32, uz.shape, 1) + nz.astype(jnp.int32)
    z0c = jnp.clip(z0, 0, _LANE - 1)
    z1c = jnp.clip(z0 + 1, 0, _LANE - 1)
    # Corner weights with out-of-band reads (z) redirected to the +1 fill.
    w0 = jnp.where((z0 >= 0) & (z0 < _LANE), 1.0 - fz, 0.0)
    w1 = jnp.where((z0 + 1 >= 0) & (z0 + 1 < _LANE), fz, 0.0)
    kf = jnp.float32(k)

    def body(t, acc):
        cy = t // n
        cx = t - cy * n
        rows = s_ref[cy, cx]  # (YB, 128): dynamic leading-dim index, aligned
        w = _tent(uy - (cy.astype(jnp.float32) - kf)) * _tent(
            ux - (cx.astype(jnp.float32) - kf)
        )
        g = w0 * jnp.take_along_axis(rows, z0c, axis=1) + w1 * jnp.take_along_axis(
            rows, z1c, axis=1
        )
        return acc + w * g

    acc0 = (1.0 - w0 - w1) * TRUNCATION_FILL  # tent weights sum to 1
    out_ref[0] = jax.lax.fori_loop(0, n * n, body, acc0)


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "y_block", "interpret")
)
def warp_field_pallas(
    field: jnp.ndarray,
    warp: jnp.ndarray,
    max_displacement: int = MAX_DISPLACEMENT,
    y_block: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas trilinear/bilinear warp resample (see module docstring).

    Requires the trailing spatial extent to be exactly 128 (vreg lane width).
    """
    k = max_displacement
    n = 2 * k + 2
    d = field.ndim
    if field.shape[-1] != _LANE:
        raise ValueError(
            f"pallas resample needs trailing extent {_LANE}, got {field.shape}"
        )
    if d == 2:
        # Treat a 2D (X, Z) field as (X, Y=1, Z) with zero y-displacement.
        field3 = field[:, None, :]
        warp3 = jnp.concatenate(
            [warp[..., :1], jnp.zeros_like(warp[..., :1]), warp[..., 1:]],
            axis=-1,
        )[:, None, :, :]
        out = warp_field_pallas(
            field3,
            warp3,
            max_displacement=max_displacement,
            y_block=1,
            interpret=interpret,
        )
        return out[:, 0, :]
    assert d == 3, field.shape

    x_size, y_size, _ = field.shape
    yb = min(y_block, y_size)
    if y_size % yb:
        raise ValueError(f"y extent {y_size} not divisible by y_block {yb}")

    wc = jnp.concatenate([jnp.clip(warp[..., :2], -k, k), warp[..., 2:]], axis=-1)
    # Pad x/y by (k, k+1) with the truncation fill; padded row (i + c) along
    # x (or a y-copy shifted by c) = original row (i + c - k).
    padded = jnp.pad(
        field, ((k, k + 1), (k, k + 1), (0, 0)), constant_values=TRUNCATION_FILL
    )
    # Stacked y-shifted copies: S[cy, x, y, z] = original[x - k, y + cy - k, z].
    stacked = jnp.stack([padded[:, cy : cy + y_size, :] for cy in range(n)])

    kern = functools.partial(_resample3d_kernel, k=k)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(stacked, wc)


def pallas_resample_supported(field: jnp.ndarray) -> bool:
    return (
        jax.devices()[0].platform == "tpu"
        and field.ndim in (2, 3)
        and field.shape[-1] == _LANE
        and (field.ndim == 2 or field.shape[1] % 8 == 0)
    )


def warp_field_fast(
    field: jnp.ndarray,
    warp: jnp.ndarray,
    max_displacement: int = MAX_DISPLACEMENT,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel when supported (TPU, lane-width trailing dim),
    golden jnp path otherwise."""
    if pallas_resample_supported(field):
        yb = 64 if field.ndim == 3 else 1
        if field.ndim == 3:
            yb = 64 if field.shape[1] % 64 == 0 else (
                32 if field.shape[1] % 32 == 0 else 8
            )
        return warp_field_pallas(field, warp, max_displacement, y_block=yb)
    return warp_field(field, warp)
