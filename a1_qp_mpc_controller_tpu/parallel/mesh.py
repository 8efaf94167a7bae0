"""Device mesh helpers.

The reference is a single-robot, single-process controller; its concurrency
is two threads and a callback spinner (SURVEY.md §2). The TPU-native scaling
axis is the *scenario batch*: thousands of domain-randomized robots sharded
over a 1-D (or host x chip) mesh, each chip solving its scenario block
locally, with ICI collectives only for metric reductions — no per-solve
communication, which is what makes the throughput target reachable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def scenario_sharding(mesh: Mesh, axis_name: str = SCENARIO_AXIS
                      ) -> NamedSharding:
    """Shard the leading (scenario) axis of every array over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = SCENARIO_AXIS):
    """Device-put a pytree whose leaves have a leading scenario axis."""
    sh = scenario_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_host_chip_mesh(axis_names=("host", SCENARIO_AXIS)) -> Mesh:
    """2-D (hosts x local chips) mesh for multi-host pods: the scenario
    batch shards over BOTH axes (each chip still owns a local block), but
    keeping the host axis explicit lets metric reductions run as a local
    ICI psum followed by one small DCN reduction, instead of an
    all-to-all over DCN. On a single host this degenerates to (1, n)."""
    n_hosts = jax.process_count()
    devs = np.array(jax.devices()).reshape(n_hosts, -1)
    return Mesh(devs, axis_names)


def host_chip_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading scenario axis across hosts x chips jointly."""
    return NamedSharding(mesh, P(mesh.axis_names))


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for a multi-host run.

    With explicit arguments (coordinator ``host:port``, process count,
    process id) this MUST succeed — a bad cluster config raises. With no
    arguments it attempts environment auto-detection (TPU pods populate
    the cluster env) and silently no-ops in a single-process
    environment. On CPU the cross-process collective implementation is
    gloo (set before init; exercised for real by
    tests/test_distributed.py, 2 processes x 4 virtual devices)."""
    if coordinator_address is not None:
        # NOTE: must not touch the backend before initialize() (even
        # jax.default_backend() would initialize XLA). The CPU
        # collectives implementation only affects the CPU backend, so
        # setting gloo unconditionally is safe on TPU/GPU too — and a
        # plain CPU install with jax_platforms UNSET would otherwise
        # get no cross-process CPU collectives at all
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
