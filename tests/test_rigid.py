"""Tests for rigid SDF-2-SDF registration (SURVEY.md §2.11, §3.4)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.core.camera import se2_matrix
from levelsetfusion_tpu.core.grid import GridSpec
from levelsetfusion_tpu.io import synthetic
from levelsetfusion_tpu.models.rigid import solve_rigid_2d, solve_rigid_3d
from levelsetfusion_tpu.ops.tsdf import generate_tsdf_2d, generate_tsdf_3d


def test_rigid_2d_recovers_known_pose():
    pair = synthetic.bump_wall_pair_2d(width=128, bump_height=0.04, live_shift_px=0.0)
    grid = GridSpec(shape=(96, 48), voxel_size=0.004, offset=(-48, 85))
    true_ext = jnp.asarray(se2_matrix(0.02, 0.008, 0.004))
    canonical = generate_tsdf_2d(
        jnp.asarray(pair.canonical_depth), pair.camera, grid, extrinsic=true_ext
    )
    res = solve_rigid_2d(canonical, jnp.asarray(pair.canonical_depth), pair.camera, grid)
    est = np.asarray(res.extrinsic)
    np.testing.assert_allclose(est, np.asarray(true_ext), atol=2e-3)
    # Energy decreased by at least 10x.
    e = np.asarray(res.energies)
    assert e[-1] < 0.1 * e[0], (e[0], e[-1])


def test_rigid_2d_identity_stays_identity():
    pair = synthetic.bump_wall_pair_2d(width=128, bump_height=0.04, live_shift_px=0.0)
    grid = GridSpec(shape=(96, 48), voxel_size=0.004, offset=(-48, 85))
    canonical = generate_tsdf_2d(jnp.asarray(pair.canonical_depth), pair.camera, grid)
    res = solve_rigid_2d(canonical, jnp.asarray(pair.canonical_depth), pair.camera, grid, iterations=10)
    np.testing.assert_allclose(np.asarray(res.extrinsic), np.eye(3), atol=1e-4)


def test_rigid_3d_recovers_translation():
    from levelsetfusion_tpu.core.camera import PinholeCamera

    # Narrow fov so the grid laterally covers blob + surrounding wall.
    cam = PinholeCamera(fx=48.0, fy=48.0, cx=24.0, cy=24.0, image_width=48, image_height=48)
    canonical_depth = synthetic.blob_wall_depth_3d(
        cam, wall_depth=0.4, blob_radius_px=10.0, blob_height=0.06
    )
    grid = GridSpec(shape=(32, 32, 24), voxel_size=0.008, offset=(-16, -16, 42))
    true_ext = jnp.eye(4).at[0, 3].set(0.012).at[2, 3].set(-0.008)
    canonical = generate_tsdf_3d(jnp.asarray(canonical_depth), cam, grid, extrinsic=true_ext)
    res = solve_rigid_3d(canonical, jnp.asarray(canonical_depth), cam, grid, iterations=30)
    est = np.asarray(res.extrinsic)
    np.testing.assert_allclose(est[:3, 3], np.asarray(true_ext)[:3, 3], atol=2e-3)
    np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=5e-3)
    e = np.asarray(res.energies)
    assert e[-1] < 0.2 * e[0]
