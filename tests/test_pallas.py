"""Parity tests: Pallas kernels vs golden jnp ops (SURVEY.md §4's
direct-vs-vectorized-vs-native parity culture). Run in interpret mode on the
CPU backend; the same kernels are validated compiled on real TPU by the
bench/driver runs."""

import numpy as np
import jax.numpy as jnp

from levelsetfusion_tpu.ops.interpolation import warp_field
from levelsetfusion_tpu.ops.pallas.resample import warp_field_pallas


def _golden_clamped(f, w, k):
    """Golden op with the kernel's documented x/y clamping."""
    wc = jnp.concatenate([jnp.clip(w[..., :-1], -k, k), w[..., -1:]], axis=-1)
    if f.ndim == 2:
        wc = jnp.concatenate([jnp.clip(w[..., :1], -k, k), w[..., 1:]], axis=-1)
    return warp_field(f, wc)


def test_resample3d_parity_small_warp(rng):
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1.9, 1.9, (8, 8, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=2, y_block=8, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample3d_zero_warp_identity(rng):
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.zeros((8, 8, 128, 3), jnp.float32)
    out = warp_field_pallas(f, w, max_displacement=2, y_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_resample3d_unbounded_z_displacement(rng):
    """z displacements are NOT clamped — any magnitude is exact (out-of-band
    reads fill +1)."""
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.zeros((8, 8, 128, 3), jnp.float32)
    w = w.at[..., 2].set(
        jnp.asarray(rng.uniform(-30, 30, (8, 8, 128)).astype(np.float32))
    )
    out = warp_field_pallas(f, w, max_displacement=1, y_block=8, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample2d_parity(rng):
    f = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1.9, 1.9, (16, 128, 2)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=2, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_clamps_large_xy_displacements(rng):
    """Beyond max_displacement the kernel clamps x/y displacements —
    documented fast-path semantics, asserted against the golden op applied
    to the clamped warp."""
    k = 2
    f = jnp.asarray(rng.standard_normal((8, 8, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-8.0, 8.0, (8, 8, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=k, y_block=8, interpret=True)
    ref = _golden_clamped(f, w, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_k1_parity(rng):
    f = jnp.asarray(rng.standard_normal((8, 16, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.9, 0.9, (8, 16, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=1, y_block=16, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_multislab_parity(rng):
    """z extents of m·128 use the multi-slab kernel; z is clamped to ±K like
    x/y (documented large-volume fast-path semantics).

    Tolerance note: the GOLDEN op computes frac(z + uz) at absolute
    coordinates (f32 ulp at z=384 is 3e-5), while the kernel computes
    frac(uz) directly (ulp ~2e-7) — the kernel is the more accurate side;
    the tolerance covers the golden op's coordinate quantization."""
    k = 2
    for z in (256, 384):
        f = jnp.asarray(rng.standard_normal((8, 8, z)).astype(np.float32))
        w = jnp.asarray(rng.uniform(-4.0, 4.0, (8, 8, z, 3)).astype(np.float32))
        out = warp_field_pallas(f, w, max_displacement=k, y_block=8, interpret=True)
        wc = jnp.clip(w, -k, k)
        ref = warp_field(f, wc)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4,
            err_msg=f"z={z}",
        )


def test_resample_multislab_small_displacements(rng):
    """Within ±1 voxel the multi-slab kernel matches the golden op with no
    clamping caveat (global z edges included via the fill convention)."""
    f = jnp.asarray(rng.standard_normal((8, 8, 256)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.95, 0.95, (8, 8, 256, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=2, y_block=8, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_default_yblock_adapts(rng):
    """y extents not divisible by the default 64 auto-pick a block size
    (regression: (…, 96, …) fields raised instead of dispatching)."""
    f = jnp.asarray(rng.standard_normal((8, 96, 128)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1.5, 1.5, (8, 96, 128, 3)).astype(np.float32))
    out = warp_field_pallas(f, w, max_displacement=2, interpret=True)
    ref = warp_field(f, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_narrow_band_skip_flags(rng):
    """With skip flags, fully-truncated blocks short-circuit to +1 and the
    result still matches the golden op everywhere (blob-in-empty-space
    field: most blocks are all +1)."""
    from levelsetfusion_tpu.ops.pallas.resample import (
        compute_skip_flags,
        prepare_field,
        warp_field_pallas_prepared,
    )

    shape = (32, 16, 128)
    f = np.ones(shape, np.float32)
    xs, ys, zs = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    r = np.sqrt((xs - 16.0) ** 2 + (ys - 8.0) ** 2 + (zs - 64.0) ** 2)
    f = np.clip((r - 5.0) / 3.0, -1.0, 1.0).astype(np.float32)  # sphere TSDF
    fj = jnp.asarray(f)
    w = jnp.asarray(rng.uniform(-1.5, 1.5, shape + (3,)).astype(np.float32))
    stacked = prepare_field(fj, 2)
    flags = compute_skip_flags(stacked, shape[0], 8, 2)
    assert int(np.asarray(flags).sum()) > 0, "expected some skippable blocks"
    out = warp_field_pallas_prepared(
        stacked, w, 2, y_block=8, interpret=True, skip_flags=flags
    )
    ref = warp_field(fj, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_resample_narrow_band_skip_flags_multislab(rng):
    """Skip flags for z = m·128 volumes (per-z-slab granularity)."""
    from levelsetfusion_tpu.ops.pallas.resample import (
        compute_skip_flags,
        prepare_field,
        warp_field_pallas_prepared,
    )

    # m ≥ 4 so gather windows (3 slabs) are smaller than the volume and the
    # per-slab flag axis can discriminate.
    shape = (8, 8, 512)
    xs, ys, zs = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    r = np.sqrt((xs - 4.0) ** 2 + (ys - 4.0) ** 2 + (zs - 64.0) ** 2)
    f = np.clip((r - 4.0) / 3.0, -1.0, 1.0).astype(np.float32)
    fj = jnp.asarray(f)
    w = jnp.asarray(rng.uniform(-3.0, 3.0, shape + (3,)).astype(np.float32))
    stacked = prepare_field(fj, 2)
    flags = compute_skip_flags(stacked, shape[0], 8, 2)
    assert flags.shape == (4, 1, 8)
    # The blob sits entirely in slab 0: the last slab's window (slabs 1-3)
    # must be fully skippable.
    assert int(np.asarray(flags)[3].sum()) == 8
    out = warp_field_pallas_prepared(
        stacked, w, 2, y_block=8, interpret=True, skip_flags=flags
    )
    ref = warp_field(fj, jnp.clip(w, -2, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_per_axis_k_matches_golden(rng):
    """Per-axis (kx, ky, kz) clamps: exact wherever |u_axis| <= k_axis —
    anisotropic motion pays only for the axes that need it (the y clamp
    sets the stacked-copy count, the dominant cost term)."""
    from levelsetfusion_tpu.ops.interpolation import warp_field
    from levelsetfusion_tpu.ops.pallas.resample import warp_field_fast

    shape = (16, 16, 128)
    base = rng.standard_normal(shape).astype(np.float32)
    field = jnp.asarray(np.tanh(base * 0.4))
    warp = np.zeros(shape + (3,), np.float32)
    warp[..., 0] = rng.uniform(-2.5, 2.5, shape)   # needs kx >= 3
    warp[..., 1] = rng.uniform(-1.5, 1.5, shape)   # needs ky >= 2
    warp[..., 2] = rng.uniform(-5.5, 5.5, shape)   # z unbounded (single slab)
    warp = jnp.asarray(warp)
    ref = warp_field(field, warp)
    got = warp_field_fast(field, warp, (3, 2, 6), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # Multi-slab z (z = 256): kz clamps z reads to ±6, which covers the
    # |u_z| <= 5.5 warp, so the result stays exact.
    shape2 = (16, 8, 256)
    base2 = rng.standard_normal(shape2).astype(np.float32)
    field2 = jnp.asarray(np.tanh(base2 * 0.4))
    warp2 = np.zeros(shape2 + (3,), np.float32)
    warp2[..., 0] = rng.uniform(-2.5, 2.5, shape2)
    warp2[..., 1] = rng.uniform(-1.5, 1.5, shape2)
    warp2[..., 2] = rng.uniform(-5.5, 5.5, shape2)
    warp2 = jnp.asarray(warp2)
    ref2 = warp_field(field2, warp2)
    got2 = warp_field_fast(field2, warp2, (3, 2, 6), interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
