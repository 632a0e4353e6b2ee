"""Golden tests for the Sobolev filter (SURVEY.md §2.7)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.ops import sobolev


def test_kernel_properties():
    k = sobolev.generate_1d_sobolev_kernel(7, 0.1)
    assert k.shape == (7,)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    # Symmetric, peaked at center, strictly positive, monotone from center.
    np.testing.assert_allclose(k, k[::-1], atol=1e-7)
    assert np.argmax(k) == 3
    assert (k > 0).all()
    assert k[3] > k[2] > k[1] > k[0]


def test_kernel_matches_operator_inverse():
    # Direct check: (I - λL) k_unnormalized = δ.
    size, lam = 7, 0.1
    lap = -2 * np.eye(size) + np.eye(size, k=1) + np.eye(size, k=-1)
    a = np.eye(size) - lam * lap
    delta = np.zeros(size)
    delta[3] = 1.0
    expected = np.linalg.solve(a, delta)
    expected /= expected.sum()
    k = sobolev.generate_1d_sobolev_kernel(size, lam)
    np.testing.assert_allclose(k, expected, atol=1e-6)


def test_zero_strength_is_identity(rng):
    k = sobolev.generate_1d_sobolev_kernel(5, 0.0)
    np.testing.assert_allclose(k, [0, 0, 1, 0, 0], atol=1e-7)
    f = rng.standard_normal((6, 6)).astype(np.float32)
    out = sobolev.convolve_with_sobolev_kernel(jnp.asarray(f), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(out), f, atol=1e-6)


def test_separable_convolution_matches_numpy(rng):
    from scipy.ndimage import convolve1d

    k = sobolev.generate_1d_sobolev_kernel(7, 0.1)
    f = rng.standard_normal((10, 12)).astype(np.float32)
    out = np.asarray(sobolev.convolve_with_sobolev_kernel(jnp.asarray(f), jnp.asarray(k)))
    expected = convolve1d(f, k, axis=0, mode="constant")
    expected = convolve1d(expected, k, axis=1, mode="constant")
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_vector_field_channels_filtered_independently(rng):
    k = sobolev.generate_1d_sobolev_kernel(7, 0.1)
    u = rng.standard_normal((8, 8, 2)).astype(np.float32)
    out = np.asarray(
        sobolev.convolve_with_sobolev_kernel(jnp.asarray(u), jnp.asarray(k), num_spatial_dims=2)
    )
    for c in range(2):
        single = np.asarray(
            sobolev.convolve_with_sobolev_kernel(jnp.asarray(u[..., c]), jnp.asarray(k))
        )
        np.testing.assert_allclose(out[..., c], single, atol=1e-6)
