"""Parity tests: Pallas kernels vs golden jnp ops (SURVEY.md §4's
direct-vs-vectorized-vs-native parity culture). Run in interpret mode on the
CPU backend; the same kernels are validated compiled on real TPU by the
bench/driver runs."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.ops.interpolation import warp_field
from levelsetfusion_tpu.ops.pallas.resample import MAX_DISPLACEMENT, warp_field_pallas


def test_resample3d_parity_small_warp(rng):
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-3.5, 3.5, (8, 8, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample3d_zero_warp_identity(rng):
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.zeros((8, 8, 128, 3), jnp.float32)
    out = warp_field_pallas(f, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_resample2d_parity(rng):
    f = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-3.5, 3.5, (16, 128, 2)).astype(np.float32))
    out = warp_field_pallas(f, w, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_clamps_large_displacements(rng):
    """Beyond MAX_DISPLACEMENT the kernel clamps x/y displacements —
    documented fast-path semantics, asserted against the golden op applied to
    the clamped warp."""
    k = MAX_DISPLACEMENT
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-8.0, 8.0, (8, 8, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, interpret=True)
    w_clamped = jnp.clip(w, -k, k)
    ref = warp_field(f, w_clamped)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_out_of_bounds_fill(rng):
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.full((8, 8, 128, 3), 4.0, jnp.float32)  # pushes edge reads outside
    out = np.asarray(warp_field_pallas(f, w, interpret=True))
    # Voxels whose source is fully outside the grid read +1.
    assert np.allclose(out[-1, -1, -10:], 1.0, atol=1e-6)
