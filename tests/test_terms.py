"""Golden tests for the energy terms (SURVEY.md §2.4–§2.6, §4).

Gradients are cross-checked against (a) hand-computed tiny cases and (b)
numerical differentiation of the term energies via jax.grad on the continuum
formulations where the discrete operators commute.
"""

import numpy as np
import jax
import jax.numpy as jnp

from levelsetfusion_tpu.ops import terms, derivatives


def test_data_term_hand_computed():
    canonical = jnp.asarray(np.zeros((3, 3), np.float32))
    warped = jnp.asarray(np.full((3, 3), 0.5, np.float32))
    grad_field = jnp.asarray(np.stack([np.full((3, 3), 2.0), np.full((3, 3), -1.0)], -1).astype(np.float32))
    g, e = terms.data_term(warped, canonical, grad_field, band_union_only=False)
    np.testing.assert_allclose(np.asarray(g[..., 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[..., 1]), -0.5, atol=1e-6)
    np.testing.assert_allclose(float(e), 0.5 * 9 * 0.25, atol=1e-6)


def test_data_term_band_union_masking():
    # Both fields fully truncated (+1) -> no gradient, no energy...
    canonical = jnp.ones((3, 3), jnp.float32)
    warped = jnp.ones((3, 3), jnp.float32)
    grad_field = jnp.ones((3, 3, 2), jnp.float32)
    g, e = terms.data_term(warped, canonical, grad_field, band_union_only=True)
    np.testing.assert_allclose(np.asarray(g), 0.0)
    assert float(e) == 0.0
    # ...but a voxel inside the band contributes.
    warped2 = warped.at[1, 1].set(0.2)
    g2, e2 = terms.data_term(warped2, canonical, grad_field, band_union_only=True)
    assert float(e2) > 0.0
    assert abs(float(g2[1, 1, 0]) - (0.2 - 1.0)) < 1e-6


def test_tikhonov_gradient_is_negative_laplacian(rng):
    u = jnp.asarray(rng.standard_normal((6, 6, 2)).astype(np.float32))
    g, e = terms.tikhonov_term(u)
    np.testing.assert_allclose(
        np.asarray(g), -np.asarray(derivatives.laplacian(u, num_spatial_dims=2)), atol=1e-6
    )
    jac = np.asarray(derivatives.vector_jacobian(u))
    np.testing.assert_allclose(float(e), 0.5 * (jac**2).sum(), rtol=1e-5)


def test_tikhonov_gradient_matches_continuum_on_sinusoid():
    """-Δu matches the analytic continuum Laplacian for a smooth field.

    (The stencil gradient is a consistent discretization of the continuum
    Euler–Lagrange operator, not the exact autodiff gradient of the discrete
    energy — for smooth fields both converge to the same operator.)
    """
    n = 32
    k = 2 * np.pi / n
    x, y = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij")
    u = np.stack([np.sin(k * x) * np.cos(k * y), np.cos(k * x) * np.sin(k * y)], -1)
    g, _ = terms.tikhonov_term(jnp.asarray(u.astype(np.float32)))
    analytic = 2 * k * k * u  # -Δu = 2k² u for these modes
    np.testing.assert_allclose(
        np.asarray(g)[2:-2, 2:-2], analytic[2:-2, 2:-2], rtol=0, atol=4e-2 * k * k
    )

    # Autodiff cross-check on the same smooth field: the exact gradient of
    # the *discrete* energy agrees with the EL stencil up to O(h²) interior.
    def energy(uu):
        jac = derivatives.vector_jacobian(uu)
        return 0.5 * jnp.sum(jac * jac)

    auto = np.asarray(jax.grad(energy)(jnp.asarray(u.astype(np.float32))))
    np.testing.assert_allclose(
        np.asarray(g)[4:-4, 4:-4], auto[4:-4, 4:-4], rtol=0, atol=6e-2 * k * k
    )


def test_killing_reduces_to_damped_tikhonov_for_irrotational_divfree():
    # For u with zero divergence everywhere, grad-div term vanishes:
    # u = (y, x) has div = 0 and symmetric J; killing grad = -(1+γ)Δu - ∇div u = 0 for linear u.
    n = 6
    x, y = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    u = jnp.asarray(np.stack([y, x], axis=-1))
    g, e = terms.killing_term(u, rigidity_enforcement_factor=0.1)
    np.testing.assert_allclose(np.asarray(g)[1:-1, 1:-1], 0.0, atol=1e-5)
    # Energy: J = [[0,1],[1,0]] everywhere; ½(½‖J+Jᵀ‖² + γ‖J‖²) per voxel
    # = ½(½·8 + 0.1·2) = 2.1
    np.testing.assert_allclose(float(e), 2.1 * n * n, rtol=1e-5)


def test_killing_rotation_is_killing_field():
    # Pure rotation u = (-y, x): J antisymmetric -> J + Jᵀ = 0, only the
    # damping term contributes energy; symmetric-part penalty is zero.
    n = 6
    x, y = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    u = jnp.asarray(np.stack([-y, x], axis=-1))
    _, e = terms.killing_term(u, rigidity_enforcement_factor=0.0)
    np.testing.assert_allclose(float(e), 0.0, atol=1e-5)
    _, e_damped = terms.killing_term(u, rigidity_enforcement_factor=0.1)
    np.testing.assert_allclose(float(e_damped), 0.5 * 0.1 * 2 * n * n, rtol=1e-5)


def test_killing_gradient_matches_continuum_on_sinusoid():
    """-(1+γ)Δu - ∇(∇·u) matches the analytic operator for smooth u."""
    n = 32
    k = 2 * np.pi / n
    gamma = 0.1
    x, y = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij")
    # u = (sin(kx)cos(ky), 0):
    #   Δu₀ = -2k²u₀;  div u = k cos(kx)cos(ky);
    #   ∇div = (-k² sin(kx)cos(ky), -k² cos(kx)sin(ky))
    u0 = np.sin(k * x) * np.cos(k * y)
    u = np.stack([u0, np.zeros_like(u0)], -1)
    g, _ = terms.killing_term(jnp.asarray(u.astype(np.float32)), gamma)
    analytic0 = (1 + gamma) * 2 * k * k * u0 + k * k * np.sin(k * x) * np.cos(k * y)
    analytic1 = k * k * np.cos(k * x) * np.sin(k * y)
    np.testing.assert_allclose(
        np.asarray(g)[2:-2, 2:-2, 0], analytic0[2:-2, 2:-2], rtol=0, atol=6e-2 * k * k
    )
    np.testing.assert_allclose(
        np.asarray(g)[2:-2, 2:-2, 1], analytic1[2:-2, 2:-2], rtol=0, atol=6e-2 * k * k
    )


def test_level_set_term_unit_gradient_field_is_zero():
    # Φ = x (voxel units): ‖∇Φ‖ = 1 exactly -> zero gradient & energy.
    n = 6
    x, _ = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    phi = jnp.asarray(0.1 * x - 0.2)  # keep inside the band for masking
    g = derivatives.gradient(phi)
    grad, e = terms.level_set_term(phi, g, band_union_only=False)
    # ‖∇Φ‖ = 0.1 -> nonzero; use a genuinely unit-slope field instead:
    phi2 = jnp.asarray((x - n / 2).astype(np.float32))
    g2 = derivatives.gradient(phi2)
    grad2, e2 = terms.level_set_term(phi2, g2, band_union_only=False)
    np.testing.assert_allclose(np.asarray(grad2), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(e2), 0.0, atol=1e-6)
    assert float(e) > 0.0


def test_level_set_term_pushes_toward_eikonal():
    # Φ with slope 0.5: energy ½Σ(0.5-1)²; gradient via Hessian is zero for
    # a linear field (H = 0 in the interior), so check energy only.
    n = 5
    x, _ = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    phi = jnp.asarray(0.5 * x)
    g = derivatives.gradient(phi)
    _, e = terms.level_set_term(phi, g, band_union_only=False)
    np.testing.assert_allclose(float(e), 0.5 * 0.25 * n * n, rtol=1e-5)


def test_killing_energy_maps_to_paper_form():
    """The docstring's mapping to KillingFusion's damped AKVF energy
    E_p = Σ(‖J+Jᵀ‖² + γ_p‖J‖²): E_here(γ) = ¼·E_p with γ_p = 2γ."""
    rng = np.random.default_rng(5)
    warp = jnp.asarray(rng.standard_normal((6, 5, 7, 3)).astype(np.float32))
    gamma = 0.1
    _, e_here = terms.killing_term(warp, gamma)

    jac = derivatives.vector_jacobian(warp)
    sym = jac + jnp.swapaxes(jac, -1, -2)
    e_paper = float(jnp.sum(sym * sym) + 2 * gamma * jnp.sum(jac * jac))
    np.testing.assert_allclose(float(e_here), 0.25 * e_paper, rtol=1e-6)
