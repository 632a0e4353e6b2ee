"""Golden tests for TSDF generation (SURVEY.md §2.3 conventions)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.core.camera import Camera2d, PinholeCamera, se2_matrix
from levelsetfusion_tpu.core.grid import GridSpec
from levelsetfusion_tpu.ops.tsdf import GenerationMethod, generate_tsdf_2d, generate_tsdf_3d


def test_2d_flat_wall_basic():
    """A constant-depth wall yields a linear TSDF ramp along z, truncated.

    Camera fov must contain the grid: fx=10, cx=8, 16 px -> lateral view
    extent [-0.8z, 0.7z], which covers x ∈ [-0.02, 0.01] for all z >= 0.06.
    """
    vs = 0.01
    grid = GridSpec(shape=(4, 26), voxel_size=vs, offset=(-2, 6))
    cam = Camera2d(fx=10.0, cx=8.0, image_width=16)
    wall_z = 0.16  # voxel index 16 along z
    depth = jnp.full((16,), wall_z, jnp.float32)
    field = np.asarray(
        generate_tsdf_2d(depth, cam, grid, narrow_band_width_voxels=20)
    )
    assert field.shape == (4, 26)
    band_m = 10 * vs
    z = (6 + np.arange(26)) * vs
    expected = np.clip((wall_z - z) / band_m, -1.0, 1.0)
    for i in range(4):
        np.testing.assert_allclose(field[i], expected, atol=1e-5)
    # Sign convention: in front of the wall positive, behind negative.
    assert field[0, 6] > 0 and field[0, 20] < 0


def test_2d_behind_camera_gives_plus_one():
    grid = GridSpec(shape=(2, 3), voxel_size=0.01, offset=(0, -4))  # z < 0
    cam = Camera2d(fx=10.0, cx=8.0, image_width=16)
    depth = jnp.full((16,), 0.1, jnp.float32)
    field = np.asarray(generate_tsdf_2d(depth, cam, grid))
    np.testing.assert_allclose(field, 1.0)


def test_2d_invalid_depth_gives_plus_one():
    grid = GridSpec(shape=(4, 8), voxel_size=0.01, offset=(-2, 1))
    cam = Camera2d(fx=100.0, cx=8.0, image_width=16)
    depth = jnp.zeros((16,), jnp.float32)  # all invalid
    field = np.asarray(generate_tsdf_2d(depth, cam, grid))
    np.testing.assert_allclose(field, 1.0)


def test_2d_out_of_view_gives_plus_one():
    grid = GridSpec(shape=(4, 8), voxel_size=0.01, offset=(1000, 1))  # x far right of frustum
    cam = Camera2d(fx=100.0, cx=8.0, image_width=16)
    depth = jnp.full((16,), 0.05, jnp.float32)
    field = np.asarray(generate_tsdf_2d(depth, cam, grid))
    np.testing.assert_allclose(field, 1.0)


def test_2d_extrinsic_translation_shifts_field():
    vs = 0.01
    grid = GridSpec(shape=(4, 26), voxel_size=vs, offset=(-2, 8))
    cam = Camera2d(fx=10.0, cx=8.0, image_width=16)
    depth = jnp.full((16,), 0.16, jnp.float32)
    base = np.asarray(generate_tsdf_2d(depth, cam, grid))
    # Camera moved back 2 voxels along z (world appears 2 voxels deeper).
    ext = jnp.asarray(se2_matrix(0.0, 0.0, 2 * vs))
    shifted = np.asarray(generate_tsdf_2d(depth, cam, grid, extrinsic=ext))
    np.testing.assert_allclose(shifted[:, :-2], base[:, 2:], atol=1e-5)


def test_2d_ewa_matches_basic_on_constant_depth():
    """On a constant-depth image every EWA sample agrees with BASIC."""
    grid = GridSpec(shape=(8, 24), voxel_size=0.004, offset=(-4, 10))
    cam = Camera2d(fx=20.0, cx=8.0, image_width=16)
    depth = jnp.full((16,), 0.08, jnp.float32)
    basic = np.asarray(generate_tsdf_2d(depth, cam, grid))
    for m in (GenerationMethod.EWA_IMAGE, GenerationMethod.EWA_TSDF):
        ewa = np.asarray(generate_tsdf_2d(depth, cam, grid, method=m))
        # Only compare voxels whose full EWA window is in view for every row.
        np.testing.assert_allclose(ewa[3:5], basic[3:5], atol=1e-3)


def test_2d_ewa_image_averages_depth():
    """A single-pixel depth spike is smoothed by EWA, not by BASIC."""
    grid = GridSpec(shape=(1, 24), voxel_size=0.004, offset=(0, 5))
    cam = Camera2d(fx=200.0, cx=8.0, image_width=16)
    d = np.full((16,), 0.08, np.float32)
    d[8] = 0.084
    basic = np.asarray(generate_tsdf_2d(jnp.asarray(d), cam, grid))
    ewa = np.asarray(
        generate_tsdf_2d(jnp.asarray(d), cam, grid, method=GenerationMethod.EWA_IMAGE)
    )
    # Voxel at x=0 projects to pixel 8. BASIC sees the spike fully; EWA blends.
    j = 12  # some in-band voxel
    assert abs(ewa[0, j] - basic[0, j]) > 1e-6


def test_3d_flat_wall_basic():
    vs = 0.01
    grid = GridSpec(shape=(4, 4, 26), voxel_size=vs, offset=(-2, -2, 6))
    cam = PinholeCamera(fx=10.0, fy=10.0, cx=8.0, cy=8.0, image_width=16, image_height=16)
    wall_z = 0.16
    depth = jnp.full((16, 16), wall_z, jnp.float32)
    field = np.asarray(generate_tsdf_3d(depth, cam, grid, narrow_band_width_voxels=20))
    assert field.shape == (4, 4, 26)
    band_m = 10 * vs
    z = (6 + np.arange(26)) * vs
    expected = np.clip((wall_z - z) / band_m, -1.0, 1.0)
    for i in range(4):
        for j in range(4):
            np.testing.assert_allclose(field[i, j], expected, atol=1e-5)


def test_3d_ewa_tsdf_inclusive_blends_with_truncation():
    """Half-invalid window: inclusive variant pulls TSDF toward +1."""
    vs = 0.01
    grid = GridSpec(shape=(2, 2, 16), voxel_size=vs, offset=(0, 0, 4))
    cam = PinholeCamera(fx=50.0, fy=50.0, cx=8.0, cy=8.0, image_width=16, image_height=16)
    d = np.full((16, 16), 0.1, np.float32)
    d[:, 9:] = 0.0  # right half invalid
    excl = np.asarray(
        generate_tsdf_3d(jnp.asarray(d), cam, grid, method=GenerationMethod.EWA_TSDF)
    )
    incl = np.asarray(
        generate_tsdf_3d(jnp.asarray(d), cam, grid, method=GenerationMethod.EWA_TSDF_INCLUSIVE)
    )
    # Voxels near the valid/invalid boundary: inclusive >= exclusive.
    assert (incl >= excl - 1e-6).all()
    assert (incl - excl).max() > 1e-3


def test_scanline_of_3d_camera_matches_2d():
    """The 2D scanline pipeline is the central row of the 3D pipeline."""
    vs = 0.01
    cam3 = PinholeCamera(fx=100.0, fy=100.0, cx=8.0, cy=8.0, image_width=16, image_height=16)
    cam2 = cam3.scanline()
    depth_img = np.full((16, 16), 0.12, np.float32)
    grid3 = GridSpec(shape=(4, 2, 24), voxel_size=vs, offset=(-2, 0, 1))
    grid2 = GridSpec(shape=(4, 24), voxel_size=vs, offset=(-2, 1))
    f3 = np.asarray(generate_tsdf_3d(jnp.asarray(depth_img), cam3, grid3))
    f2 = np.asarray(generate_tsdf_2d(jnp.asarray(depth_img[8]), cam2, grid2))
    # y = 0 plane of the 3D grid equals the 2D field.
    np.testing.assert_allclose(f3[:, 0, :], f2, atol=1e-5)
