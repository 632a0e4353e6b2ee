"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests need a virtual device mesh; everything numerical
runs fine on the CPU backend.

Note: this container's sitecustomize imports jax and registers a remote-TPU
PJRT plugin before any user code runs, so setting the JAX_PLATFORMS env var
here is too late — the platform must be overridden through jax.config.
XLA_FLAGS still takes effect because backends initialize lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
