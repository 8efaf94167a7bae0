"""Benchmark: horizon-10 MPC solves/s/chip + single-scenario latency.

Runs on whatever accelerator JAX defaults to (the driver provides one real
TPU chip). Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured against the per-chip share of the BASELINE.json
target: >=100k horizon-10 MPC solves/s on a v5e-16 => 6250 solves/s/chip.

The benchmarked unit is the FULL CLOSED-LOOP control tick: sensor read
from the in-framework plant, ingest/FK fan-out, gait/swing planning, EKF
update, condensed QP construction, warm-started fixed-25-iteration ADMM
solve with a gathered flip-rescue pass, torque mapping, AND the plant
step — one MPC solve per tick, so ticks/s x batch == solves/s. Round 4
moved the protocol from static-held sensors to the closed loop because a
static sensor snapshot holds every foot force high forever, which makes
the early-contact rule manufacture synchronized all-4-stance windows —
an unphysical contact distribution that both hid flip dynamics and
overstated stance counts (a steady trot is 2-stance ~90% of ticks).
The batch is warmed ~1.25 s into the steady trot before timing.

The batched path runs the shared-basis Pallas route
(parallel.batched_control_tick). Round-5 production candidate:
kkt_backend='amortized' — the batched KKT factorization amortized
ACROSS ticks (per-tick capacity-bounded refresh, flips mandatory, then
oldest-first; stale scenarios solve with their carried inverse plus a
truncated-Neumann correction). 'full' (full-size refactor every tick,
the round-4 number) is the fallback candidate; selection stays
quality-first (converged frac, then solves/s).

Latency is reported two ways: device-resident per-tick latency (a scan
of ticks on-device — what an on-robot TPU would see) and host-in-the-loop
p99 (which through this dev harness's axon tunnel includes ~28 ms RTT).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 100_000 / 16  # BASELINE.json: 100k solves/s on v5e-16

# rescue pool: with the strided 32-tick cooldown window ~18% of a trot
# batch is flagged per tick (flips + dense window + stride members);
# 192 slots cover it. Flagged-but-converged scenarios get a cheap
# continuation (no refactor) on the amortized route, so the larger
# window costs iterations only.
RESCUE_CAPACITY = 192
RESCUE_ITERS = 150


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )

    cfg, params = load_profile("gazebo_mpc")
    # round-5 shipped schedule: fixed 25 iterations + strided post-flip
    # rescue window (dense 12 ticks, then every 4th out to 32) + the
    # 0.5 N drift-predictive trigger — together they close the dense
    # golden gate at frac 1.0 / max 0.70 N (probe_golden_tail.py,
    # 3600 every-tick samples; the window alone left 3 offenders, the
    # trigger alone closes but over-fires on natural touchdown ramps
    # without the window absorbing the post-flip share)
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25,
                              mpc_solver_mode="fixed",
                              mpc_cooldown_ticks=32,
                              mpc_cooldown_stride=4,
                              mpc_cooldown_dense=12,
                              mpc_drift_rescue_n=0.5)
    return cfg, params, control_tick, CtrlState, CtrlMem, SensorData, JoyCmd


# round-5 sweep (scripts/profile_amortized.py, v5e, batch 1024, two
# independent processes): full-refactor-every-tick 46.8k ->
# c256/c192/c160/c128 o2 = 59.4/61.4/63.7/63.7k, c96 o3 = 64.2k, all
# at converged frac 1.0 (narrow round-4 rescue window). With the
# round-5 golden-closing window (dense 12/stride 4/32) the same
# backends measure: full 44.0k, c128 o2 53.0k, c128 o3 53.1k — order
# 3 is free in the tick, so it ships for extra staleness margin.
# 128@1024 keeps ages <= ~8; force accuracy of the stale-corrected
# route is certified on-chip by the matched-staleness dense golden
# gate (GOLDEN_REPORT.json "amortized_batched").
AMORTIZE_CAPACITY = 128
AMORTIZE_REFINE_ORDER = 3


def _tick_kwargs(kkt_backend: str) -> dict:
    # 'full' = the full-size solve with the SAME rho-refactored 2-round
    # rescue machinery (the reduced route's fallback path, selected by
    # a reduced tier >= the block count). reduced-shape kernels fit
    # admm_block=128 in scoped VMEM (the route caps full-size branches
    # at 64 internally); full-size backends OOM above 64.
    # 'amortized' = the round-5 cross-tick amortized factorization
    # (flip-mandatory + oldest-first refresh of `capacity` scenarios per
    # tick, truncated-Neumann correction for the rest) — requires a
    # threaded KktCarry, handled by the bench runners below.
    if kkt_backend == "amortized":
        return dict(admm_backend="pallas_shared", kkt_block=32,
                    admm_block=64, kkt_backend="amortized",
                    kkt_amortize_capacity=AMORTIZE_CAPACITY,
                    kkt_refine_order=AMORTIZE_REFINE_ORDER,
                    rescue_capacity=RESCUE_CAPACITY,
                    rescue_iters=RESCUE_ITERS)
    nr = 128 if kkt_backend == "full" else 64
    backend = "reduced_admm" if kkt_backend == "full" else kkt_backend
    ablock = 128 if backend == "reduced_admm" else 64
    # big bucket: 3-4-stance scenarios are solved at full size inside
    # the reduced route; per-tick counts in the closed-loop trot peak
    # ~95-125 at batch 1024 (touchdown overlaps), so 160 covers with
    # margin and the overflow cond catches spikes correctly
    return dict(admm_backend="pallas_shared", kkt_block=32,
                admm_block=ablock, kkt_backend=backend,
                kkt_reduced_nr=nr,
                kkt_big_capacity=160, rescue_capacity=RESCUE_CAPACITY,
                rescue_iters=RESCUE_ITERS)


def _warm_trot(cfg, batch: int, stand_ticks: int = 120,
               walk_ticks: int = 380):
    """Flat-ground closed-loop batch warmed into the steady trot."""
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_flat_batch,
    )
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    _, params = load_profile("gazebo_mpc")
    pb, terr, carry = make_flat_batch(cfg, jax.random.PRNGKey(0), batch,
                                      params)
    joy_w = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                   velx=jnp.float32(0.3))
    joy_s = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def warm(carry, pb, terr):
        def body(c, t):
            j = jax.tree_util.tree_map(
                lambda a, b: jnp.where(t < stand_ticks, a, b),
                joy_s, joy_w)
            cr, pb2, terr2 = c
            cr = batched_closed_loop_step(cfg, pb2, terr2, cr, j, dt,
                                          **_tick_kwargs("gj"))
            return (cr, pb2, terr2), None
        return jax.lax.scan(body, (carry, pb, terr),
                            jnp.arange(stand_ticks + walk_ticks))[0][0]

    carry = warm(carry, pb, terr)
    jax.block_until_ready(carry.ps.root_pos)
    alive = float(jnp.mean(
        (~jnp.isnan(carry.ps.root_pos[:, 2])).astype(jnp.float32)))
    log(f"  warm: alive_frac={alive:.4f} "
        f"mean_z={float(jnp.nanmean(carry.ps.root_pos[:, 2])):.3f}")
    return pb, terr, carry, joy_w, dt, alive


def bench_throughput(batch: int, kkt_backend: str, warm_state,
                     ticks: int = 20, reps: int = 3):
    """Closed-loop MPC control ticks/s on one chip (solves/s) from a
    trot-warm state, plus the converged fraction over the timed window.

    The 'amortized' backend threads a KktCarry through the scan; its
    first timed window starts from a WARM carry (one untimed run seeds
    the factorizations), matching the steady-state schedule a long
    rollout sees."""
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_kkt_carry,
    )

    cfg, *_ = build()
    pb, terr, carry, joy, dt, _ = warm_state
    amortized = kkt_backend == "amortized"

    if amortized:
        kc0 = make_kkt_carry(cfg, batch)

        @jax.jit
        def run(carry, kc, pb, terr):
            def body(c, _):
                cr, k = c
                cr, k = batched_closed_loop_step(
                    cfg, pb, terr, cr, joy, dt, kkt_carry=k,
                    **_tick_kwargs(kkt_backend))
                return (cr, k), None
            return jax.lax.scan(body, (carry, kc), None,
                                length=ticks)[0]

        t0 = time.perf_counter()
        out, kc = run(carry, kc0, pb, terr)   # seeds the carry
        jax.block_until_ready(out.cs.joint_torques)
        log(f"  compile+first run: {time.perf_counter() - t0:.1f}s")
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            out2, _ = run(out, kc, pb, terr)
            jax.block_until_ready(out2.cs.joint_torques)
            best = max(best, batch * ticks / (time.perf_counter() - t0))

        @jax.jit
        def conv_audit(carry, kc, pb, terr):
            def body(c, _):
                cr, k = c
                cr, k, stats = batched_closed_loop_step(
                    cfg, pb, terr, cr, joy, dt, kkt_carry=k,
                    return_stats=True, **_tick_kwargs(kkt_backend))
                return (cr, k), jnp.mean(
                    stats["converged"].astype(jnp.float32))
            return jax.lax.scan(body, (carry, kc), None, length=10)[1]

        conv = jax.device_get(conv_audit(out, kc, pb, terr))
        return best, float(conv.mean())

    @jax.jit
    def run(carry, pb, terr):
        def body(c, _):
            cr, pb2, terr2 = c
            cr = batched_closed_loop_step(cfg, pb2, terr2, cr, joy, dt,
                                          **_tick_kwargs(kkt_backend))
            return (cr, pb2, terr2), None
        return jax.lax.scan(body, (carry, pb, terr), None,
                            length=ticks)[0][0]

    t0 = time.perf_counter()
    out = run(carry, pb, terr)
    jax.block_until_ready(out.cs.joint_torques)
    log(f"  compile+first run: {time.perf_counter() - t0:.1f}s")
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry, pb, terr)
        jax.block_until_ready(out.cs.joint_torques)
        best = max(best, batch * ticks / (time.perf_counter() - t0))

    @jax.jit
    def conv_audit(carry, pb, terr):
        def body(c, _):
            cr, pb2, terr2 = c
            cr, stats = batched_closed_loop_step(
                cfg, pb2, terr2, cr, joy, dt, return_stats=True,
                **_tick_kwargs(kkt_backend))
            return (cr, pb2, terr2), jnp.mean(
                stats["converged"].astype(jnp.float32))
        return jax.lax.scan(body, (carry, pb, terr), None,
                            length=10)[1]

    conv = jax.device_get(conv_audit(carry, pb, terr))
    return best, float(conv.mean())


def audit_trot_convergence(kkt_backend: str, warm_state,
                           ticks: int = 100) -> dict:
    """Per-tick converged fraction over a full closed-loop trot window
    (gait counters live, flips staggered across scenarios) — the solver
    quality the throughput number actually ships with."""
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_kkt_carry,
    )

    cfg, *_ = build()
    pb, terr, carry, joy, dt, _ = warm_state
    amortized = kkt_backend == "amortized"

    if amortized:
        batch = int(carry.cs.contacts.shape[0])
        kc0 = make_kkt_carry(cfg, batch)

        @jax.jit
        def run(carry, kc, pb, terr):
            def body(c, _):
                cr, k = c
                cr, k, stats = batched_closed_loop_step(
                    cfg, pb, terr, cr, joy, dt, kkt_carry=k,
                    return_stats=True, **_tick_kwargs(kkt_backend))
                return (cr, k), jnp.mean(
                    stats["converged"].astype(jnp.float32))
            return jax.lax.scan(body, (carry, kc), None,
                                length=ticks)[1]

        frac = jax.device_get(run(carry, kc0, pb, terr))
    else:
        @jax.jit
        def run(carry, pb, terr):
            def body(c, _):
                cr, pb2, terr2 = c
                cr, stats = batched_closed_loop_step(
                    cfg, pb2, terr2, cr, joy, dt, return_stats=True,
                    **_tick_kwargs(kkt_backend))
                return (cr, pb2, terr2), jnp.mean(
                    stats["converged"].astype(jnp.float32))
            return jax.lax.scan(body, (carry, pb, terr), None,
                                length=ticks)[1]

        frac = jax.device_get(run(carry, pb, terr))
    return {
        "ticks": ticks,
        "trot_window_mean": round(float(frac.mean()), 4),
        "trot_window_min": round(float(frac.min()), 4),
        "last_tick": round(float(frac[-1]), 4),
    }


def bench_stand_qp(batch: int = 4096, ticks: int = 20, reps: int = 3
                   ) -> float:
    """Batched 12-var stand-QP control ticks/s (BASELINE config 1: the
    reference's 500 Hz QP balance path, A1RobotControl.cpp:416-431).
    Round 4: the TRUE lock-step route — a fixed 100-iteration
    warm-started budget for every scenario plus a gathered fixed-budget
    rho-refactored rescue of flip scenarios
    (parallel.batched_stand_control_tick); full tick incl.
    ingest/EKF/plan/torques. Quality: dense per-tick golden gate at
    frac 1.0 (tests/test_golden.py::test_stand_qp_lockstep_batched_gate
    _dense)."""
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_stand_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_qp")
    cfg = dataclasses.replace(cfg, mpc_solver_mode="fixed",
                              stand_qp_iters=100)
    pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0),
                                            batch, params)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def run(pb, cs, mem, sensors):
        def body(carry, _):
            cs, mem = carry
            cs, mem, _ = batched_stand_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt,
                rescue_capacity=128)
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

    # per-terrain-kind breakdown (flat / slope / stairs): recover each
    # scenario's kind from the terrain params and split the steady-state
    # height error so the aggregate p95 is attributable
    import numpy as np
    errs_np = np.asarray(jax.device_get(errs2))          # (T, B)
    tail = errs_np[-steps // 4:]                         # steady window
    per_scen = tail.mean(axis=0)                         # (B,)
    pitch = np.asarray(jax.device_get(terrain.pitch))
    steph = np.asarray(jax.device_get(terrain.step_height))
    kinds = {"flat": (pitch == 0) & (steph == 0),
             "slope": pitch != 0, "stairs": steph != 0}
    by_kind = {}
    for k, m in kinds.items():
        if m.any():
            by_kind[k] = {
                "n": int(m.sum()),
                "mean_height_err_m": round(float(per_scen[m].mean()), 4),
                "p95_height_err_m": round(
                    float(np.percentile(tail[:, m], 95)), 4),
            }
    return {
        "scenarios": n,
        "steps": steps,
        "mean_height_err_m": round(float(metrics["mean_height_err"]), 4),
        "p95_height_err_m": round(float(metrics["p95_height_err"]), 4),
        "alive_frac": round(float(metrics["alive_frac"]), 4),
        "by_kind": by_kind,
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
    pallas_shared path via shard_map (BASELINE.md scaling points).
    A REAL 2-process jax.distributed run is exercised separately by
    tests/test_distributed.py."""
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

    # closed-loop throughput: warm the batch into the trot once, then
    # shoot out the KKT/solver backends. 'reduced_admm' (whole-solve
    # contact-pattern shape reduction) is the round-4 production
    # candidate; 'gj' is the full-size fallback.
    cfg, *_ = build()
    candidates = tuple(
        os.environ.get("TPU_QMPC_BENCH_KKT",
                       "amortized,full").split(","))
    batch = 1024
    warm_state = _warm_trot(cfg, batch)
    best = 0.0
    best_batch = 0
    best_conv = None
    best_kkt = None
    for kkt in candidates:
        try:
            sps, conv = bench_throughput(batch, kkt, warm_state)
        except Exception as e:  # noqa: BLE001 - fall back to the other
            log(f"  closed-loop kkt={kkt} batch={batch} failed: "
                f"{type(e).__name__}: {e}")
            continue
        log(f"  closed-loop kkt={kkt} batch={batch}: {sps:,.0f} solves/s "
            f"(converged frac {conv:.4f})")
        # quality-first selection: candidates differ in solver quality,
        # so pick by (converged frac rounded to 1e-3, then solves/s) —
        # a faster config may not buy its speed with unconverged solves
        if (round(conv, 3), sps) > (round(best_conv or 0.0, 3), best):
            best, best_batch, best_conv, best_kkt = sps, batch, conv, kkt
    log(f"best: {best:,.0f} solves/s/chip at batch={best_batch} "
        f"(kkt={best_kkt}); device-resident latency {lat_dev:.3f} ms")

    trot_conv = (audit_trot_convergence(best_kkt, warm_state)
                 if best_kkt else None)
    log(f"trot-phase convergence audit: {trot_conv}")

    # multi-device scaling points (BASELINE.md): only when >1 device is
    # visible — on this 1-chip image the single-device number above IS
    # the 1-chip point; the sharded path is exercised by the CPU-mesh
    # test and the 2-process jax.distributed test
    if len(jax.devices()) > 1:
        scaling = bench_scaling(kkt_backend="gj")
    else:
        scaling = {"1": {"solves_per_s": round(best, 1),
                         "solves_per_s_per_chip": round(best, 1)}}

    stand_sps = bench_stand_qp()
    log(f"stand-QP (12-var, lock-step fixed 100 it + rescue): "
        f"{stand_sps:,.0f} solves/s")
    terrain = bench_terrain_eval()
    log(f"terrain eval: {terrain}")

    # golden-gate quality of the BENCHED solver schedule (dense per-tick
    # f64-optimum force gate, regenerated by scripts/run_golden_dense.py)
    # so the driver sees the force-accuracy number next to the OSQP-
    # tolerance converged frac — they gate different things
    golden = {}
    try:
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "GOLDEN_REPORT.json")) as f:
            rep = json.load(f)
        g = rep["fixed_25it_rescue"]
        golden = {"golden_frac_within_2N": g["frac_within_tol"],
                  "golden_max_dev_N": round(g["max_dev_N"], 3)}
        ab = rep.get("amortized_batched")
        if ab:
            # the on-chip randomized-params batched force gate (harder:
            # includes low-mu/heavy domain-randomized draws)
            golden["golden_batched_randomized_frac"] = round(
                ab["frac_within_tol"], 4)
            golden["golden_batched_randomized_p95_N"] = round(
                ab["p95_dev_N"], 3)
    except (OSError, KeyError, ValueError) as e:  # report absence honestly
        golden = {"golden_frac_within_2N": None,
                  "golden_gate_error": f"{type(e).__name__}: {e}"}
    log(f"golden gate (shipped config): {golden}")

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / PER_CHIP_TARGET, 3),
        "extra": {
            "protocol": "closed-loop (plant in the loop), trot-warm "
                        "batch; round 3 used static-held sensors",
            "latency_device_resident_ms": round(lat_dev, 3),
            "latency_host_p99_ms": round(lat_host["p99_ms"], 3),
            "latency_host_p50_ms": round(lat_host["p50_ms"], 3),
            "latency_budget_ms": 2.5,
            "best_batch": best_batch,
            "admm_iters_per_solve": 25,
            "rescue": {"capacity": RESCUE_CAPACITY,
                       "iters": RESCUE_ITERS,
                       "trigger": "unconverged; contact flip; strided"
                                  " 32-tick cooldown window (dense 12,"
                                  " then every 4th tick); 0.5 N"
                                  " drift-predictive trigger."
                                  " Flagged-converged scenarios get a"
                                  " no-refactor continuation (+ overflow"
                                  " round); unconverged get a"
                                  " rho-refactored rescue, cond-skipped"
                                  " when clean"},
            "batched_backend": "pallas_shared",
            "kkt_backend": best_kkt,
            "amortized": ({"capacity": AMORTIZE_CAPACITY,
                           "refine_order": AMORTIZE_REFINE_ORDER}
                          if best_kkt == "amortized" else None),
            "converged_frac_osqp_tol": best_conv,
            "converged_frac_trot_window": trot_conv,
            **golden,
            "scaling": scaling,
            "stand_qp_solves_per_s": round(stand_sps, 1),
            "terrain_eval": terrain,
        },
    }))


if __name__ == "__main__":
    main()
