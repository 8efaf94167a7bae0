"""Benchmark: horizon-10 MPC solves/s/chip + single-scenario latency.

Runs on whatever accelerator JAX defaults to (the driver provides one real
TPU chip). Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured against the per-chip share of the BASELINE.json
target: >=100k horizon-10 MPC solves/s on a v5e-16 => 6250 solves/s/chip.

The benchmarked unit is the FULL control tick (sensor ingest, FK fan-out,
gait/swing planning, EKF update, condensed QP construction, warm-started
fixed-25-iteration ADMM solve — the count at which the steady-state
converged fraction at OSQP's default 1e-3 tolerances matches 50
iterations to within 1% (scripts/iter_study.py); the achieved fraction
is reported in extra — torque mapping) — one MPC solve per tick, so
ticks/s x batch == solves/s, and the number includes everything the
reference's two 400 Hz threads do per period. The batched path runs the
shared-basis Pallas route (parallel.batched_control_tick: GJ KKT-inverse
kernel + fused-ADMM kernel).

Latency is reported two ways: device-resident per-tick latency (a scan of
ticks on-device — what an on-robot TPU would see) and host-in-the-loop
p99 (which through this dev harness's axon tunnel includes ~28 ms RTT).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 100_000 / 16  # BASELINE.json: 100k solves/s on v5e-16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25, mpc_solver_mode="fixed")
    return cfg, params, control_tick, CtrlState, CtrlMem, SensorData, JoyCmd


def make_batch_state(cfg, params, batch):
    """Physical standing-pose batch (IK joint angles, plant-read sensors)
    — see parallel.batched.make_bench_state."""
    from a1_qp_mpc_controller_tpu.parallel.batched import make_bench_state

    return make_bench_state(cfg, jax.random.PRNGKey(0), batch, params)


def bench_throughput(batch: int, backend: str, ticks: int = 20,
                     reps: int = 3, kkt_backend: str = "gj") -> float:
    """Batched MPC control ticks/s on one chip (solves/s)."""
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick,
    )

    cfg, params, control_tick, *_ , JoyCmd = build()
    pb, cs, mem, sensors = make_batch_state(cfg, params, batch)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)

    if backend == "pallas_shared":
        def tick(cs, mem):
            return batched_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt,
                admm_backend="pallas_shared", kkt_block=32, admm_block=64,
                kkt_backend=kkt_backend)
    else:
        def tick(cs, mem):
            cs, mem, tq = jax.vmap(
                lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt)
            )(pb, cs, mem, sensors)
            return cs, mem, tq

    @jax.jit
    def run(cs, mem):
        def body(carry, _):
            cs, mem = carry
            cs, mem, _ = tick(cs, mem)
            return (cs, mem), None

        (cs, mem), _ = jax.lax.scan(body, (cs, mem), None, length=ticks)
        return cs, mem

    t0 = time.perf_counter()
    cs2, mem2 = run(cs, mem)
    cs2.joint_torques.block_until_ready()
    log(f"  compile+first run: {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        cs2, mem2 = run(cs, mem)
        cs2.joint_torques.block_until_ready()
        dt_wall = time.perf_counter() - t0
        best = max(best, batch * ticks / dt_wall)

    # solution-quality audit on the post-scan state: fraction of scenarios
    # meeting OSQP's default tolerances (eps_abs = eps_rel = 1e-3)
    conv = None
    if backend == "pallas_shared":
        _, _, _, stats = jax.jit(lambda c, m: batched_control_tick(
            cfg, pb, c, m, sensors, joy, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend=kkt_backend, return_stats=True))(cs2, mem2)
        conv = float(jnp.mean(stats["converged"].astype(jnp.float32)))
    return best, conv


def audit_trot_convergence(kkt_backend: str = "gj", batch: int = 1024,
                           ticks: int = 100) -> dict:
    """Honesty audit beyond the standing-phase number: run the batch
    through walk onset into the trot (gait counters live, contact flips
    staggered across scenarios) and report the per-tick converged
    fraction over the trot window — the solver quality the throughput
    number actually ships with."""
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick,
    )

    cfg, params, *_ , JoyCmd = build()
    pb, cs, mem, sensors = make_batch_state(cfg, params, batch)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def run(pb, cs, mem, sensors):
        def body(carry, _):
            cs, mem = carry
            cs, mem, _, stats = batched_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt,
                admm_backend="pallas_shared", kkt_block=32, admm_block=64,
                kkt_backend=kkt_backend, return_stats=True)
            return (cs, mem), jnp.mean(
                stats["converged"].astype(jnp.float32))
        return jax.lax.scan(body, (cs, mem), None, length=ticks)[1]

    frac = jax.device_get(run(pb, cs, mem, sensors))
    trot = frac[ticks // 2:]
    return {
        "ticks": ticks,
        "trot_window_mean": round(float(trot.mean()), 4),
        "trot_window_min": round(float(trot.min()), 4),
        "last_tick": round(float(frac[-1]), 4),
    }


def bench_stand_qp(batch: int = 4096, ticks: int = 20, reps: int = 3
                   ) -> float:
    """Batched 12-var stand-QP control ticks/s (BASELINE config 1: the
    reference's 500 Hz QP balance path, A1RobotControl.cpp:416-431).
    Fixed mode = warm-started adaptive-core solve (the 12-var while_loop
    is lock-step-bounded under vmap); full tick incl.
    ingest/EKF/plan/torques. Quality: golden-gated at frac 1.0 within
    2 N vs the f64 optimum (tests/test_golden.py)."""
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.parallel.batched import make_bench_state
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_qp")
    cfg = dataclasses.replace(cfg, mpc_solver_mode="fixed",
                              stand_qp_iters=100)
    pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0),
                                            batch, params)
    joy = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def run(pb, cs, mem, sensors):
        def body(carry, _):
            cs, mem = carry
            cs, mem, _ = jax.vmap(
                lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt)
            )(pb, cs, mem, sensors)
            return (cs, mem), None
        return jax.lax.scan(body, (cs, mem), None, length=ticks)[0]

    cs2, mem2 = run(pb, cs, mem, sensors)
    cs2.joint_torques.block_until_ready()
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        cs2, _ = run(pb, cs, mem, sensors)
        cs2.joint_torques.block_until_ready()
        best = max(best, batch * ticks / (time.perf_counter() - t0))
    return best


def bench_terrain_eval(n: int = 256, steps: int = 400) -> dict:
    """Batched domain-randomized terrain eval (BASELINE configs 3-5):
    randomized mass/inertia/friction/gait + flat/slope/stairs terrain,
    closed-loop controller+plant rollout; reports stability metrics and
    eval throughput."""
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_rollout, make_batch,
    )
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25, mpc_solver_mode="fixed")
    pb, terrain, carry = make_batch(cfg, jax.random.PRNGKey(1), n, params)
    joy_seq = cl.joy_schedule(steps, walk_after=steps // 4, velx=0.3)

    t0 = time.perf_counter()
    carry, errs, metrics = batched_rollout(cfg, pb, terrain, carry,
                                           joy_seq, steps)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry2, errs2, metrics = batched_rollout(cfg, pb, terrain, carry,
                                             joy_seq, steps)
    jax.block_until_ready(metrics)
    wall = time.perf_counter() - t0
    return {
        "scenarios": n,
        "steps": steps,
        "mean_height_err_m": round(float(metrics["mean_height_err"]), 4),
        "p95_height_err_m": round(float(metrics["p95_height_err"]), 4),
        "alive_frac": round(float(metrics["alive_frac"]), 4),
        "scenario_ticks_per_s": round(n * steps / wall, 1),
        "compile_s": round(compile_s, 1),
    }


def bench_scaling(base_batch: int = 1024, ticks: int = 20, reps: int = 3,
                  kkt_backend: str = "gj", interpret: bool = False,
                  max_devices: int | None = None) -> dict:
    """Multi-device scaling: shard the scenario batch over a mesh of
    1, 2, 4, ... N devices (weak scaling: base_batch per device) and
    report solves/s at each device count. On a 1-chip host this
    degenerates to the single-device number; on a CPU mesh
    (xla_force_host_platform_device_count) it exercises the sharded
    pallas_shared path via shard_map (BASELINE.md scaling points)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.parallel.mesh import make_mesh

    cfg, params, control_tick, *_, JoyCmd = build()
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)
    devs = jax.devices()
    n_max = min(len(devs), max_devices or len(devs))
    counts = []
    c = 1
    while c <= n_max:
        counts.append(c)
        c *= 2
    out = {}
    for ndev in counts:
        mesh = make_mesh(devs[:ndev])
        batch = base_batch * ndev
        pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0),
                                                batch, params)
        sh = NamedSharding(mesh, P("scenario"))
        pb, cs, mem, sensors = jax.device_put((pb, cs, mem, sensors),
                                              sh)

        def tick(pb, cs, mem, sensors):
            cs, mem, _ = batched_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt,
                admm_backend="pallas_shared", kkt_block=32, admm_block=64,
                kkt_backend=kkt_backend, interpret=interpret)
            return cs, mem

        # check_vma=False: the tick builds unvaried constants (eye,
        # iota, zeros) that mix with sharded operands — standard for a
        # per-shard numerical kernel
        sm_tick = jax.shard_map(tick, mesh=mesh,
                                in_specs=(P("scenario"),) * 4,
                                out_specs=(P("scenario"), P("scenario")),
                                check_vma=False)

        @jax.jit
        def run(pb, cs, mem, sensors):
            def body(carry, _):
                cs, mem = carry
                cs, mem = sm_tick(pb, cs, mem, sensors)
                return (cs, mem), None
            return jax.lax.scan(body, (cs, mem), None, length=ticks)[0]

        cs2, mem2 = run(pb, cs, mem, sensors)
        cs2.joint_torques.block_until_ready()
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            cs2, _ = run(pb, cs, mem, sensors)
            cs2.joint_torques.block_until_ready()
            best = max(best, batch * ticks / (time.perf_counter() - t0))
        out[str(ndev)] = {
            "solves_per_s": round(best, 1),
            "solves_per_s_per_chip": round(best / ndev, 1),
        }
        log(f"  scaling: {ndev} device(s): {best:,.0f} solves/s "
            f"({best / ndev:,.0f}/chip)")
    return out


def bench_latency_device(ticks: int = 400) -> float:
    """Device-resident per-tick latency (ms): a scan of sequential control
    ticks on-device, wall time / ticks. This is the per-solve latency an
    on-robot accelerator sees (no host round-trip per tick)."""
    cfg, params, control_tick, CtrlState, CtrlMem, SensorData, JoyCmd = \
        build()
    cs = CtrlState.init(cfg, params)
    cs = cs.replace(root_pos=jnp.array([0.0, 0.0, 0.3]),
                    foot_pos_abs=params.default_foot_pos,
                    contacts=jnp.array([True, False, False, True]))
    mem = CtrlMem.init(cfg, params)
    sensors = SensorData.zeros()
    joy = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def run(cs, mem):
        def body(carry, _):
            cs, mem = carry
            cs, mem, _ = control_tick(cfg, params, cs, mem, sensors, joy,
                                      dt)
            return (cs, mem), None
        (cs, mem), _ = jax.lax.scan(body, (cs, mem), None, length=ticks)
        return cs, mem

    cs2, mem2 = run(cs, mem)
    cs2.joint_torques.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cs2, mem2 = run(cs, mem)
        cs2.joint_torques.block_until_ready()
        best = min(best, (time.perf_counter() - t0) * 1e3 / ticks)
    return best


def bench_latency_host(n: int = 100) -> dict:
    """Host-in-the-loop per-tick latency (ms); through the axon dev tunnel
    this includes ~28 ms RTT per dispatch."""
    cfg, params, control_tick, CtrlState, CtrlMem, SensorData, JoyCmd = \
        build()
    cs = CtrlState.init(cfg, params)
    cs = cs.replace(root_pos=jnp.array([0.0, 0.0, 0.3]),
                    foot_pos_abs=params.default_foot_pos,
                    contacts=jnp.array([True, False, False, True]))
    mem = CtrlMem.init(cfg, params)
    sensors = SensorData.zeros()
    joy = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)

    step = jax.jit(lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt),
                   donate_argnums=(1, 2))
    cs_out, mem_out, _ = step(params, cs, mem, sensors)
    cs_out.joint_torques.block_until_ready()

    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        cs_out, mem_out, tq = step(params, cs_out, mem_out, sensors)
        tq.block_until_ready()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "p50_ms": times[len(times) // 2],
        "p99_ms": times[int(len(times) * 0.99)],
    }


def main():
    log(f"devices: {jax.devices()}")
    lat_dev = bench_latency_device()
    log(f"device-resident per-tick latency: {lat_dev:.3f} ms "
        f"(budget 2.5 ms)")
    lat_host = bench_latency_host()
    log(f"host-in-loop latency (incl. tunnel RTT): "
        f"p50={lat_host['p50_ms']:.2f} ms p99={lat_host['p99_ms']:.2f} ms")

    # pick the KKT-inverse backend empirically at batch 1024, then scale
    # the winner across batch sizes. Candidates: 'chol' (pure-XLA blocked
    # Cholesky, batched GEMMs — the round-3 addition) and 'gj' (flat
    # Pallas Gauss-Jordan). The transposed-layout kernels are dead on
    # this image: Mosaic crashes on ANY grid over the lane dimension
    # (isolated by scripts/probe_mosaic*.py, 2026-08-21), and the grid-1
    # variants measured 2x slower per scenario than flat GJ.
    import os
    candidates = tuple(
        os.environ.get("TPU_QMPC_BENCH_KKT", "chol,gj").split(","))
    best = 0.0
    best_batch = 0
    best_conv = None
    best_kkt = None
    for kkt in candidates:
        try:
            sps, conv = bench_throughput(1024, "pallas_shared",
                                         kkt_backend=kkt)
        except Exception as e:  # noqa: BLE001 - fall back to the other
            log(f"  pallas_shared kkt={kkt} batch=1024 failed: "
                f"{type(e).__name__}")
            continue
        log(f"  pallas_shared kkt={kkt} batch=1024: {sps:,.0f} solves/s "
            f"(converged frac {conv})")
        if sps > best:
            best, best_batch, best_conv, best_kkt = sps, 1024, conv, kkt
    # batch sweep kept short: 4096 measured within noise of 1024/2048 in
    # round 1, and every extra config is 2 more programs through a compile
    # queue that has taken up to 45 min per program. Guarded on a
    # successful 1024 measurement.
    if best_kkt is not None:
        for batch in (2048,):
            sps, conv = bench_throughput(batch, "pallas_shared",
                                         kkt_backend=best_kkt)
            log(f"  pallas_shared kkt={best_kkt} batch={batch}: "
                f"{sps:,.0f} solves/s (converged frac {conv})")
            if sps > best:
                best, best_batch, best_conv = sps, batch, conv
    log(f"best: {best:,.0f} solves/s/chip at batch={best_batch} "
        f"(kkt={best_kkt}); device-resident latency {lat_dev:.3f} ms")

    # multi-device scaling points (BASELINE.md): only when >1 device is
    # visible — on this 1-chip image the single-device number above IS
    # the 1-chip point; the sharded path is exercised by the CPU-mesh
    # test (tests/test_parallel.py::test_bench_scaling_cpu_mesh)
    if len(jax.devices()) > 1:
        scaling = bench_scaling(kkt_backend=best_kkt or "gj")
    else:
        scaling = {"1": {"solves_per_s": round(best, 1),
                         "solves_per_s_per_chip": round(best, 1)}}

    stand_sps = bench_stand_qp()
    log(f"stand-QP (12-var, fixed 100 it): {stand_sps:,.0f} solves/s")
    terrain = bench_terrain_eval()
    log(f"terrain eval: {terrain}")
    trot_conv = audit_trot_convergence(kkt_backend=best_kkt or "gj")
    log(f"trot-phase convergence audit: {trot_conv}")

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / PER_CHIP_TARGET, 3),
        "extra": {
            "latency_device_resident_ms": round(lat_dev, 3),
            "latency_host_p99_ms": round(lat_host["p99_ms"], 3),
            "latency_host_p50_ms": round(lat_host["p50_ms"], 3),
            "latency_budget_ms": 2.5,
            "best_batch": best_batch,
            "admm_iters_per_solve": 25,
            "batched_backend": "pallas_shared",
            "kkt_backend": best_kkt,
            "converged_frac_osqp_tol": best_conv,
            "converged_frac_trot_window": trot_conv,
            "scaling": scaling,
            "stand_qp_solves_per_s": round(stand_sps, 1),
            "terrain_eval": terrain,
        },
    }))


if __name__ == "__main__":
    main()
