"""Golden tests for warp/resample (SURVEY.md §2.8 conventions)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.ops import interpolation


def test_zero_warp_is_identity(rng):
    f = rng.standard_normal((6, 6)).astype(np.float32)
    w = np.zeros((6, 6, 2), np.float32)
    out = interpolation.warp_field(jnp.asarray(f), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), f, atol=1e-6)


def test_integer_shift_2d():
    f = np.arange(16, dtype=np.float32).reshape(4, 4)
    w = np.zeros((4, 4, 2), np.float32)
    w[..., 0] = 1.0  # sample at row + 1
    out = np.asarray(interpolation.warp_field(jnp.asarray(f), jnp.asarray(w)))
    np.testing.assert_allclose(out[:3], f[1:], atol=1e-6)
    # Last row samples out of bounds -> fill +1.
    np.testing.assert_allclose(out[3], 1.0, atol=1e-6)


def test_halfway_interpolation():
    f = np.array([[0.0, 2.0], [4.0, 6.0]], np.float32)
    pos = jnp.asarray(np.array([[0.5, 0.5]], np.float32))
    out = np.asarray(interpolation.sample_at(jnp.asarray(f), pos))
    np.testing.assert_allclose(out, [3.0], atol=1e-6)


def test_out_of_bounds_blend():
    # At position (-0.5, 0): half weight in-bounds value f[0,0]=5, half fill(+1).
    f = np.full((3, 3), 5.0, np.float32)
    pos = jnp.asarray(np.array([[-0.5, 0.0]], np.float32))
    out = np.asarray(interpolation.sample_at(jnp.asarray(f), pos))
    np.testing.assert_allclose(out, [3.0], atol=1e-6)


def test_trilinear_3d_center():
    f = np.zeros((2, 2, 2), np.float32)
    f[1, 1, 1] = 8.0
    pos = jnp.asarray(np.array([[0.5, 0.5, 0.5]], np.float32))
    out = np.asarray(interpolation.sample_at(jnp.asarray(f), pos))
    np.testing.assert_allclose(out, [1.0], atol=1e-6)


def test_warp_field_with_gradient_consistency(rng):
    f = rng.standard_normal((8, 8)).astype(np.float32)
    w = (0.3 * rng.standard_normal((8, 8, 2))).astype(np.float32)
    warped, grad = interpolation.warp_field_with_gradient(jnp.asarray(f), jnp.asarray(w))
    gx, gy = np.gradient(np.asarray(warped))
    np.testing.assert_allclose(np.asarray(grad[..., 0]), gx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad[..., 1]), gy, rtol=1e-5, atol=1e-6)


class TestAdvectField:
    """Forward-warp flavor (§2.8): push values to x + u."""

    def test_zero_warp_is_identity(self):
        from levelsetfusion_tpu.ops.interpolation import advect_field

        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.uniform(-1, 1, (6, 5)).astype(np.float32))
        out = advect_field(f, jnp.zeros((6, 5, 2), jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)

    def test_integer_shift_moves_values(self):
        from levelsetfusion_tpu.ops.interpolation import (
            TRUNCATION_FILL,
            advect_field,
        )

        f = jnp.zeros((5, 5), jnp.float32).at[1, 1].set(-0.5)
        w = jnp.ones((5, 5, 2), jnp.float32) * 2.0  # shift (+2, +2)
        out = np.asarray(advect_field(f, w))
        assert out[3, 3] == -0.5
        # The vacated source voxel's own content moved too; row 0 receives
        # nothing (no source maps there) -> fill.
        np.testing.assert_allclose(out[0, :], TRUNCATION_FILL)

    def test_forward_inverts_backward_for_constant_shift_3d(self):
        from levelsetfusion_tpu.ops.interpolation import (
            advect_field,
            warp_field,
        )

        # Linear fields are reproduced exactly by tent splat + bilinear
        # sample (partition of unity + linear precision); random fields
        # would only be recovered approximately (two tent filters smooth).
        x, y, z = np.meshgrid(*[np.arange(8.0)] * 3, indexing="ij")
        f = jnp.asarray(
            (0.05 * x + 0.03 * y - 0.02 * z).astype(np.float32)
        )
        shift = jnp.ones((8, 8, 8, 3), jnp.float32) * 1.5
        fwd = advect_field(f, shift)
        # fwd(y) ~ f(y - u), so sampling fwd at x + u recovers f(x).
        back = warp_field(fwd, shift)
        np.testing.assert_allclose(
            np.asarray(back)[2:-2, 2:-2, 2:-2],
            np.asarray(f)[2:-2, 2:-2, 2:-2],
            atol=1e-5,
        )
