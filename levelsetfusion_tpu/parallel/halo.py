"""Halo exchange and edge-exact sharded stencil primitives.

The volume is sharded along spatial axis 0 into contiguous voxel blocks,
one per device on a 1D mesh. These helpers run *inside* ``shard_map``:

- ``halo_exchange``: pull ``width`` boundary rows from both neighbors with
  ``lax.ppermute`` (ICI neighbor exchange); at the two global boundaries the
  halo is synthesized per ``fill``:
    * ``"replicate"`` — copy the block's edge row (Neumann ghost cells; the
      convention of the framework's Laplacian),
    * ``"zero"``      — zeros (the Sobolev filter's zero padding),
    * ``"truncation"``— +1.0 (unobserved space outside the volume).
- ``d0_edge_fixed``: axis-0 np.gradient on a haloed block that reproduces
  the *global* one-sided edge convention exactly. Trick: with replicated
  ghost rows, the central difference at a global edge row equals half the
  one-sided difference, so doubling that row restores it; the fixed edge row
  is then re-broadcast into the out-of-domain halo rows so the operator can
  be applied repeatedly (Hessians).
- ``second_diff0``: plain axis-0 1-(-2)-1 stencil on a haloed block — with
  replicated ghosts this matches the global Neumann Laplacian with no fix-up.

Together with the fact that only axis 0 is sharded (all other spatial axes
use the ordinary single-device ops unchanged), every derivative the solver
needs is *bit-comparable* with its single-device counterpart; the parity
tests in tests/test_parallel.py assert this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _edge_row(x, i):
    return lax.dynamic_slice_in_dim(x, i, 1, axis=0)


def halo_exchange(
    x: jnp.ndarray,
    width: int,
    axis_name: str,
    num_devices: int,
    fill: str = "replicate",
) -> jnp.ndarray:
    """Return ``x`` extended with ``width`` halo rows on both sides of axis 0."""
    if width == 0:
        return x
    idx = lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % num_devices) for i in range(num_devices)]
    bwd = [(i, (i - 1) % num_devices) for i in range(num_devices)]
    # Halo received from the left neighbor = its last `width` rows.
    from_left = lax.ppermute(x[-width:], axis_name, fwd)
    # Halo received from the right neighbor = its first `width` rows.
    from_right = lax.ppermute(x[:width], axis_name, bwd)

    if fill == "replicate":
        left_fill = jnp.broadcast_to(x[:1], from_left.shape)
        right_fill = jnp.broadcast_to(x[-1:], from_right.shape)
    elif fill == "zero":
        left_fill = jnp.zeros_like(from_left)
        right_fill = jnp.zeros_like(from_right)
    elif fill == "truncation":
        left_fill = jnp.full_like(from_left, 1.0)
        right_fill = jnp.full_like(from_right, 1.0)
    else:
        raise ValueError(f"unknown fill {fill!r}")

    from_left = jnp.where(idx == 0, left_fill, from_left)
    from_right = jnp.where(idx == num_devices - 1, right_fill, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def d0_edge_fixed(
    x_ext: jnp.ndarray,
    halo: int,
    axis_name: str,
    num_devices: int,
) -> jnp.ndarray:
    """Axis-0 np.gradient of a haloed block, exact at global edges.

    Args:
      x_ext: block with ``halo`` ghost rows per side (global-edge ghosts must
        be *replicated* edge rows).
      halo: number of ghost rows on each side of ``x_ext`` (static).

    Returns the gradient with ``halo - 1`` ghost rows per side; at the global
    boundaries the output's remaining ghost rows hold the (fixed) edge value,
    so the result can be fed to ``d0_edge_fixed`` again (np.gradient
    composition for Hessians).
    """
    idx = lax.axis_index(axis_name)
    first = idx == 0
    last = idx == num_devices - 1

    g = (x_ext[2:] - x_ext[:-2]) * 0.5  # rows: local ± (halo-1)
    m = g.shape[0]
    h = halo - 1  # ghost rows remaining in g; global row 0 sits at index h
    rows = lax.broadcasted_iota(jnp.int32, (m,) + (1,) * (g.ndim - 1), 0)

    # One-sided fix at the global start: double row h, replicate into ghosts.
    start_fixed = _edge_row(g, h) * 2.0
    g = jnp.where(first & (rows <= h), start_fixed, g)
    # Global end: double row m-1-h, replicate into trailing ghosts.
    end_fixed = _edge_row(g, m - 1 - h) * 2.0
    g = jnp.where(last & (rows >= m - 1 - h), end_fixed, g)
    return g


def second_diff0(x_ext: jnp.ndarray) -> jnp.ndarray:
    """Axis-0 1-(-2)-1 stencil; consumes one ghost row per side."""
    return x_ext[2:] - 2.0 * x_ext[1:-1] + x_ext[:-2]


def convolve0_zero_edges(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    axis_name: str,
    num_devices: int,
) -> jnp.ndarray:
    """Same-size axis-0 convolution with global zero padding (Sobolev filter):
    exchanges a radius-wide halo, zero-filled at global edges."""
    k = kernel.shape[0]
    r = k // 2
    x_ext = halo_exchange(x, r, axis_name, num_devices, fill="zero")
    n = x.shape[0]
    out = jnp.zeros_like(x)
    for t in range(k):
        out = out + kernel[k - 1 - t] * x_ext[t : t + n]
    return out
