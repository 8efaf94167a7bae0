"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware, and deterministically.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
forces jax_platforms='axon,cpu' at interpreter start, so the usual
JAX_PLATFORMS env var is not enough — we override the live jax config before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
