"""Pallas TPU kernels for the hot ops (SURVEY.md §2.15 TPU-native equivalent
of the reference's native module; BASELINE: "dense numpy voxel loops → Pallas
tiled grid kernels").

Every kernel has a pure-jnp golden twin in ``ops/`` and is parity-tested
against it (the build's version of the reference's direct-vs-vectorized-vs-
C++ parity culture).
"""

from levelsetfusion_tpu.ops.pallas.resample import warp_field_pallas

__all__ = ["warp_field_pallas"]
