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
                admm_backend="pallas_shared", kkt_block=16, admm_block=64,
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
            admm_backend="pallas_shared", kkt_block=16, admm_block=64,
            kkt_backend=kkt_backend, return_stats=True))(cs2, mem2)
        conv = float(jnp.mean(stats["converged"].astype(jnp.float32)))
    return best, conv


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

    # pick the KKT-inverse kernel empirically at batch 1024, then scale
    # the winner across batch sizes. The transposed-layout kernels are
    # NOT in the default candidate list: this image's Mosaic build
    # rejects them outright (tpu_compile_helper exit 1, 2026-08-21), and
    # a candidate that only fails after a queue round-trip costs real
    # wall time — re-enable via TPU_QMPC_BENCH_KKT=sweep_t,gj after a
    # toolchain update.
    import os
    candidates = tuple(
        os.environ.get("TPU_QMPC_BENCH_KKT", "gj").split(","))
    best = 0.0
    best_batch = 0
    best_conv = None
    best_kkt = "gj"
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
    # queue that has taken up to 45 min per program
    for batch in (2048,):
        sps, conv = bench_throughput(batch, "pallas_shared",
                                     kkt_backend=best_kkt)
        log(f"  pallas_shared kkt={best_kkt} batch={batch}: "
            f"{sps:,.0f} solves/s (converged frac {conv})")
        if sps > best:
            best, best_batch, best_conv = sps, batch, conv
    log(f"best: {best:,.0f} solves/s/chip at batch={best_batch} "
        f"(kkt={best_kkt}); device-resident latency {lat_dev:.3f} ms")

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
        },
    }))


if __name__ == "__main__":
    main()
