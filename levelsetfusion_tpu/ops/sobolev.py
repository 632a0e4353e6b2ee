"""Sobolev gradient filtering (SURVEY.md §2.7; SobolevFusion, Slavcheva CVPR'18).

SobolevFusion preconditions the raw energy gradient by (approximately)
applying ``(I - λΔ)^{-1}``, realized as a small separable 1D kernel applied
along each spatial axis. The kernel is the central column of the inverse of
the 1D operator matrix ``A = I - λ L`` where ``L`` is the 1-(-2)-1 discrete
Laplacian (Dirichlet truncation to ``size`` taps), normalized to unit sum so
the filter preserves constants.

Convolution uses zero padding at the array edges ("same" size), matching the
reference's 1D-convolution helpers [MED].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def generate_1d_sobolev_kernel(size: int = 7, strength: float = 0.1) -> np.ndarray:
    """The separable Sobolev smoothing kernel ``(I - λΔ)^{-1} δ``, unit-sum.

    Args:
      size: odd number of taps (reference default 7 [MED]).
      strength: λ, the Sobolev smoothing strength (reference default 0.1 [MED]).
    """
    if size < 3 or size % 2 == 0:
        raise ValueError(f"kernel size must be odd and >= 3, got {size}")
    lap = (
        -2.0 * np.eye(size)
        + np.eye(size, k=1)
        + np.eye(size, k=-1)
    )
    a = np.eye(size) - strength * lap
    delta = np.zeros(size)
    delta[size // 2] = 1.0
    kernel = np.linalg.solve(a, delta)
    kernel = kernel / kernel.sum()
    return kernel.astype(np.float32)


def _convolve_axis(field: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Same-size 1D convolution along ``axis`` with zero edge padding."""
    k = kernel.shape[0]
    r = k // 2
    pad = [(0, 0)] * field.ndim
    pad[axis] = (r, r)
    fp = jnp.pad(field, pad)
    out = jnp.zeros_like(field)
    sl = [slice(None)] * field.ndim
    for t in range(k):
        sl2 = list(sl)
        sl2[axis] = slice(t, t + field.shape[axis])
        # Convolution (not correlation): tap t multiplies kernel[k-1-t].
        out = out + kernel[k - 1 - t] * fp[tuple(sl2)]
    return out


def convolve_with_sobolev_kernel(
    field: jnp.ndarray,
    kernel: jnp.ndarray,
    num_spatial_dims: int | None = None,
) -> jnp.ndarray:
    """Separable filter: convolve along every spatial axis in turn.

    ``field`` may carry trailing channel axes (e.g. a warp-gradient field of
    shape ``(*spatial, D)``); pass ``num_spatial_dims`` to restrict.
    Kernels are symmetric in practice, so convolution == correlation.
    """
    d = field.ndim if num_spatial_dims is None else num_spatial_dims
    kernel = jnp.asarray(kernel)
    out = field
    for ax in range(d):
        out = _convolve_axis(out, kernel, ax)
    return out
