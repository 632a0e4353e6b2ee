"""Tests for pyramid construction and warp prolongation (SURVEY.md §2.10)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.core.grid import GridSpec
from levelsetfusion_tpu.ops import pyramid


def test_downsample_mean_2d():
    f = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = np.asarray(pyramid.downsample2x_mean(jnp.asarray(f)))
    expected = np.array([[f[0:2, 0:2].mean(), f[0:2, 2:4].mean()],
                         [f[2:4, 0:2].mean(), f[2:4, 2:4].mean()]])
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_downsample_mean_3d(rng):
    f = rng.standard_normal((4, 4, 4)).astype(np.float32)
    out = np.asarray(pyramid.downsample2x_mean(jnp.asarray(f)))
    assert out.shape == (2, 2, 2)
    np.testing.assert_allclose(out[0, 0, 0], f[:2, :2, :2].mean(), rtol=1e-5)
    np.testing.assert_allclose(out[1, 0, 1], f[2:, :2, 2:].mean(), rtol=1e-5)


def test_build_pyramid_order_and_shapes(rng):
    f = rng.standard_normal((16, 16)).astype(np.float32)
    pyr = pyramid.build_pyramid(jnp.asarray(f), levels=3)
    assert [p.shape for p in pyr] == [(4, 4), (8, 8), (16, 16)]
    np.testing.assert_allclose(np.asarray(pyr[-1]), f)


def test_prolongate_doubles_displacement_and_resolution():
    w = np.ones((4, 4, 2), np.float32) * 0.5
    up = np.asarray(pyramid.prolongate_warp(jnp.asarray(w)))
    assert up.shape == (8, 8, 2)
    np.testing.assert_allclose(up, 1.0, atol=1e-6)


def test_grid_coarsen_preserves_world_extent():
    g = GridSpec(shape=(16, 32), voxel_size=0.004, offset=(-8, 4))
    c = g.coarsened(2)
    assert c.shape == (8, 16)
    assert c.voxel_size == 0.008
    lo_f, hi_f = g.world_bounds()
    lo_c, hi_c = c.world_bounds()
    # Coarse voxel centers sit at the mean of their children's centers:
    # first coarse center = mean of first two fine centers.
    np.testing.assert_allclose(lo_c, lo_f + 0.5 * g.voxel_size, atol=1e-7)
    np.testing.assert_allclose(hi_c, hi_f - 0.5 * g.voxel_size, atol=1e-7)
