"""Unit tests for the sharded stencil primitives (parallel/halo.py) in
isolation, via shard_map on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from levelsetfusion_tpu.ops.derivatives import laplacian  # noqa: F401
from levelsetfusion_tpu.parallel.halo import (
    convolve0_zero_edges,
    d0_edge_fixed,
    halo_exchange,
    second_diff0,
)
from levelsetfusion_tpu.parallel.mesh import make_mesh
from levelsetfusion_tpu.ops.sobolev import generate_1d_sobolev_kernel, _convolve_axis


def _run_sharded(fn, x, nd=4):
    mesh = make_mesh(nd)
    return shard_map(
        fn, mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False
    )(x)


def test_halo_exchange_neighbors_and_fills(rng):
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(16, 1) * np.ones((1, 4), np.float32))
    nd = 4

    def f(blk):
        ext = halo_exchange(blk, 2, "x", nd, fill="replicate")
        return ext[:4]  # left halo (2) + first 2 local rows

    out = np.asarray(_run_sharded(f, x, nd))
    # Device 0: replicate fill = rows [0, 0]; devices 1..3: neighbor rows.
    np.testing.assert_allclose(out[0:2, 0], [0, 0])
    np.testing.assert_allclose(out[4:6, 0], [2, 3])   # device 1 left halo
    np.testing.assert_allclose(out[8:10, 0], [6, 7])  # device 2 left halo

    def g(blk):
        ext = halo_exchange(blk, 1, "x", nd, fill="truncation")
        return ext[-2:]  # last local row + right halo

    out = np.asarray(_run_sharded(g, x, nd))
    np.testing.assert_allclose(out[1, 0], 4.0)   # device 0 right halo = row 4
    np.testing.assert_allclose(out[-1, 0], 1.0)  # device 3 right halo = +1 fill


def test_d0_edge_fixed_matches_np_gradient(rng):
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    nd = 4

    def f(blk):
        ext = halo_exchange(blk, 2, "x", nd, fill="replicate")
        return d0_edge_fixed(ext, 2, "x", nd)[1:-1]

    out = np.asarray(_run_sharded(f, x, nd))
    expected = np.gradient(np.asarray(x), axis=0)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_d0_edge_fixed_composes_for_second_derivative(rng):
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    nd = 4

    def f(blk):
        ext = halo_exchange(blk, 2, "x", nd, fill="replicate")
        g = d0_edge_fixed(ext, 2, "x", nd)
        return d0_edge_fixed(g, 1, "x", nd)

    out = np.asarray(_run_sharded(f, x, nd))
    expected = np.gradient(np.gradient(np.asarray(x), axis=0), axis=0)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_second_diff0_matches_neumann_laplacian_1d(rng):
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    nd = 4

    def f(blk):
        ext = halo_exchange(blk, 1, "x", nd, fill="replicate")
        return second_diff0(ext)

    out = np.asarray(_run_sharded(f, x, nd))
    # Axis-0-only part of the framework (Neumann) Laplacian.
    from levelsetfusion_tpu.ops.derivatives import _second_diff_axis

    expected = np.asarray(_second_diff_axis(x, 0))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_convolve0_zero_edges_matches_single_device(rng):
    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    k = jnp.asarray(generate_1d_sobolev_kernel(7, 0.1))
    nd = 4

    def f(blk):
        return convolve0_zero_edges(blk, k, "x", nd)

    out = np.asarray(_run_sharded(f, x, nd))
    expected = np.asarray(_convolve_axis(x, k, 0))
    np.testing.assert_allclose(out, expected, atol=1e-6)
