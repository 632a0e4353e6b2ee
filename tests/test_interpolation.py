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
