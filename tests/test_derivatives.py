"""Golden tests for the finite-difference spec (SURVEY.md §4: tiny-field
hand-checkable cases + independent numpy cross-checks)."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.ops import derivatives


def test_gradient_matches_np_gradient_2d(rng):
    f = rng.standard_normal((5, 7)).astype(np.float32)
    g = derivatives.gradient(jnp.asarray(f))
    gx, gy = np.gradient(f)
    np.testing.assert_allclose(np.asarray(g[..., 0]), gx, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g[..., 1]), gy, rtol=1e-6)


def test_gradient_matches_np_gradient_3d(rng):
    f = rng.standard_normal((4, 5, 6)).astype(np.float32)
    g = derivatives.gradient(jnp.asarray(f))
    expected = np.gradient(f)
    for ax in range(3):
        np.testing.assert_allclose(np.asarray(g[..., ax]), expected[ax], rtol=1e-6)


def test_gradient_hand_computed():
    # f(x, z) = x + 2z on a 3x3 grid -> gradient (1, 2) everywhere.
    f = jnp.asarray(
        np.add.outer(np.arange(3.0), 2.0 * np.arange(3.0)).astype(np.float32)
    )
    g = derivatives.gradient(f)
    np.testing.assert_allclose(np.asarray(g[..., 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[..., 1]), 2.0, atol=1e-6)


def test_hessian_of_quadratic():
    # f = x^2 + 3xy + 2y^2 -> H = [[2, 3], [3, 4]] in the interior.
    n = 7
    x, y = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    f = x**2 + 3 * x * y + 2 * y**2
    h = np.asarray(derivatives.hessian(jnp.asarray(f)))
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(h[interior][..., 0, 0], 2.0, atol=1e-4)
    np.testing.assert_allclose(h[interior][..., 0, 1], 3.0, atol=1e-4)
    np.testing.assert_allclose(h[interior][..., 1, 0], 3.0, atol=1e-4)
    np.testing.assert_allclose(h[interior][..., 1, 1], 4.0, atol=1e-4)


def test_laplacian_stencil_neumann_edges():
    f = jnp.asarray(np.array([[0.0, 1.0, 4.0]], dtype=np.float32).T @ np.ones((1, 1), np.float32))
    # 1D column [0, 1, 4]: interior lap = 0 - 2*1 + 4 = 2;
    # edges replicate: lap[0] = 0 - 0 + 1 = 1... (f[-1]=f[0]) -> 0-2*0+1 = 1
    # lap[2] = 1 - 2*4 + 4 = -3  (f[3]=f[2])
    lap = np.asarray(derivatives.laplacian(f, num_spatial_dims=2))
    np.testing.assert_allclose(lap[:, 0], [1.0, 2.0, -3.0], atol=1e-6)


def test_laplacian_of_linear_field_is_zero_interior():
    n = 6
    x, y = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    f = 3 * x - 2 * y
    lap = np.asarray(derivatives.laplacian(jnp.asarray(f)))
    np.testing.assert_allclose(lap[1:-1, 1:-1], 0.0, atol=1e-5)


def test_vector_jacobian_and_divergence(rng):
    u = rng.standard_normal((5, 6, 2)).astype(np.float32)
    jac = np.asarray(derivatives.vector_jacobian(jnp.asarray(u)))
    gx0, gy0 = np.gradient(u[..., 0])
    gx1, gy1 = np.gradient(u[..., 1])
    np.testing.assert_allclose(jac[..., 0, 0], gx0, rtol=1e-5)
    np.testing.assert_allclose(jac[..., 0, 1], gy0, rtol=1e-5)
    np.testing.assert_allclose(jac[..., 1, 0], gx1, rtol=1e-5)
    np.testing.assert_allclose(jac[..., 1, 1], gy1, rtol=1e-5)
    div = np.asarray(derivatives.divergence(jnp.asarray(u)))
    np.testing.assert_allclose(div, gx0 + gy1, rtol=1e-5)


def test_gradient_of_divergence_linear_exact():
    # u = (x + 2y, 3x + 4y): div = 1 + 4 = 5 (constant) -> grad div = 0.
    n = 5
    x, y = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    u = np.stack([x + 2 * y, 3 * x + 4 * y], axis=-1)
    gd = np.asarray(derivatives.gradient_of_divergence(jnp.asarray(u)))
    np.testing.assert_allclose(gd, 0.0, atol=1e-5)
