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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # speculative mitigation for a RARE jaxlib-0.9.0 segfault inside
    # backend_compile_and_load on very long suite runs (observed at
    # ~1e-3/compile; see the cache note below): serialize LLVM codegen
    # so the 2-core compile thread pool cannot race
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the jax persistent compilation cache here — this
# image's jaxlib 0.9.0 reliably ABORTS while serializing certain
# executables (put_executable_and_time, reproduced on the dual-rate and
# telemetry rollout programs). Separately, very long suite runs have a
# RARE in-compile segfault (backend_compile_and_load, ~1e-3/compile);
# if a full run dies with a faulthandler dump in jax compile internals,
# rerun — every test passes in isolation and in half-suite runs.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Clear jax's in-process compilation caches at module boundaries.

    The rare backend_compile_and_load segfault above became reliably
    reproducible once the suite grew past ~130 tests in one process
    (round 4: three consecutive full runs died inside compile, each at
    a different test, while every test passes in isolation and in
    half-suite shards). Dropping the accumulated executables between
    modules keeps the compile session short; the per-module recompiles
    cost ~1 min across the suite."""
    yield
    jax.clear_caches()
