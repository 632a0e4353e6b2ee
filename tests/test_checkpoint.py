"""Checkpoint/resume: round-trip including sharded-array states (the
config-5 canonical/weights/warp live sharded; saving must go shard-wise and
loading must re-place onto the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from levelsetfusion_tpu.models.fusion import FusionState
from levelsetfusion_tpu.utils import checkpoint


def test_roundtrip_dense(tmp_path, rng):
    state = FusionState(
        canonical=jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32)),
        weights=jnp.ones((8, 8), jnp.float32),
    )
    warp = jnp.asarray(rng.standard_normal((8, 8, 2)).astype(np.float32))
    checkpoint.save(str(tmp_path), 3, state, warp, extra={"tag": "t"})
    got_state, got_warp, meta = checkpoint.load(str(tmp_path))
    assert meta["frame"] == 3 and meta["tag"] == "t"
    np.testing.assert_array_equal(got_state.canonical, state.canonical)
    np.testing.assert_array_equal(got_warp, warp)


def test_roundtrip_sharded(tmp_path, rng):
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("x",))
    sharding = NamedSharding(mesh, P("x"))
    shape = (len(devs) * 4, 8, 128)
    canonical = jax.device_put(
        jnp.asarray(rng.standard_normal(shape).astype(np.float32)), sharding
    )
    weights = jax.device_put(jnp.ones(shape, jnp.float32), sharding)
    warp = jax.device_put(
        jnp.asarray(rng.standard_normal(shape + (3,)).astype(np.float32)),
        NamedSharding(mesh, P("x")),
    )
    state = FusionState(canonical=canonical, weights=weights)
    checkpoint.save(str(tmp_path), 5, state, warp)

    got_state, got_warp, meta = checkpoint.load(
        str(tmp_path),
        shardings={"canonical": sharding, "weights": sharding,
                   "warp": NamedSharding(mesh, P("x"))},
    )
    assert meta["frame"] == 5
    np.testing.assert_array_equal(np.asarray(got_state.canonical), np.asarray(canonical))
    np.testing.assert_array_equal(np.asarray(got_warp), np.asarray(warp))
    # Restored arrays are actually sharded over the mesh.
    assert got_state.canonical.sharding.is_equivalent_to(sharding, len(shape))
