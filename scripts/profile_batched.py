"""Component timing for the batched MPC tick on the real chip.

Times, at a given batch size: problem build (condense+cost), scaled-KKT
assembly, the batched inverse (LU vs Pallas GJ), the 50-iteration ADMM
loop with a precomputed inverse, and the full batched tick — so we know
where the next kernel belongs. Run on TPU:

    python scripts/profile_batched.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best * 1e3:9.3f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.control.controller import (
        control_tick, control_tick_build,
    )
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import batched_inverse
    from a1_qp_mpc_controller_tpu.parallel.batched import randomize_params
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=args.iters,
                              mpc_solver_mode="fixed")
    key = jax.random.PRNGKey(0)
    pb = randomize_params(key, b, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(b))
    cs = cs.replace(
        root_pos=jnp.concatenate(
            [jax.random.uniform(key, (b, 2), minval=-0.05, maxval=0.05),
             jnp.full((b, 1), 0.3)], axis=1),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (b, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (b, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(b))
    sensors = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(b))
    sensors = sensors.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, 4)),
        foot_force=jnp.full((b, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)

    print(f"batch={b} iters={args.iters} device={jax.devices()[0]}")

    # 1. full vmapped tick
    tick = jax.jit(jax.vmap(
        lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt)))
    timeit(tick, pb, cs, mem, sensors, name="full tick (vmap control_tick)")

    # 2. problem build only
    build = jax.jit(jax.vmap(
        lambda p, c, m, s: control_tick_build(cfg, p, c, m, s, joy, dt)))
    cs2, mem2, prob = build(pb, cs, mem, sensors)
    scal2 = jax.jit(jax.vmap(grf.scaling_for_contacts))(
        mem2.mpc_scaling_table, cs2.contacts)
    jax.block_until_ready(prob.p_mat)
    timeit(build, pb, cs, mem, sensors, name="build (ingest..cost+bounds)")

    # 3. scaled KKT assembly
    kkt = jax.jit(jax.vmap(lambda pr, sc: qpx.scaled_kkt_matrix(
        pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, settings, pr.rho0, sc)))
    m_b = kkt(prob, scal2)
    jax.block_until_ready(m_b)
    timeit(kkt, prob, scal2, name="scaled KKT assembly")

    # 4. batched inverse: LU vs Pallas GJ
    lu = jax.jit(lambda m: jnp.linalg.inv(m))
    timeit(lu, m_b, name="KKT inverse (batched LU)")
    for blk in (8, 16, 32):
        try:
            gj = jax.jit(lambda m, blk=blk: batched_inverse(m, block=blk))
            timeit(gj, m_b, name=f"KKT inverse (Pallas GJ blk={blk})")
        except Exception as e:  # noqa: BLE001
            print(f"  Pallas GJ blk={blk} failed: {type(e).__name__}")
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_spd,
    )
    for blk in (8, 16, 32):
        try:
            sw = jax.jit(lambda m, blk=blk: batched_inverse_spd(
                m, block=blk))
            timeit(sw, m_b, name=f"KKT inverse (Pallas sweep blk={blk})")
        except Exception as e:  # noqa: BLE001
            print(f"  Pallas sweep blk={blk} failed: {type(e).__name__}")

    minv = lu(m_b)

    # 5. ADMM loop with precomputed inverse
    solve = jax.jit(jax.vmap(lambda pr, sc, mi: qpx.admm_solve_fixed(
        pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, args.iters, settings,
        x0=pr.warm_x, y0=pr.warm_y, rho0=pr.rho0, scaling=sc, kkt_inv=mi)))
    timeit(solve, prob, scal2, minv,
           name=f"ADMM {args.iters} iters (inv given)")

    # 6. fused-ADMM Pallas kernel (generic; superseded by shared)
    for blk in (8,):
        try:
            fsolve = jax.jit(lambda pr, sc, mi, blk=blk:
                             qpx.admm_solve_fixed_batched(
                                 pr.p_mat, pr.q_vec, pr.a_mat, pr.lb,
                                 pr.ub, args.iters, settings, pr.warm_x,
                                 pr.warm_y, pr.rho0, sc, mi, block=blk))
            timeit(fsolve, prob, scal2, minv,
                   name=f"fused-ADMM Pallas (blk={blk})")
        except Exception as e:  # noqa: BLE001
            print(f"  fused-ADMM blk={blk} failed: {type(e).__name__}: {e}")

    # 7. shared-structure pieces
    from a1_qp_mpc_controller_tpu.models import srb
    a0, a1 = srb.friction_constraint_basis(cfg.horizon)
    kkt_sh = jax.jit(lambda pr, mu, sc: qpx.scaled_kkt_matrix_shared(
        pr.p_mat, a0, a1, mu, pr.lb, pr.ub, settings, pr.rho0, sc))
    m_sh = kkt_sh(prob, pb.mu_mpc, scal2)
    jax.block_until_ready(m_sh)
    timeit(kkt_sh, prob, pb.mu_mpc, scal2,
           name="scaled KKT assembly (shared GEMM)")
    for blk in (16, 32, 64):
        try:
            fs = jax.jit(lambda pr, mu, sc, mi, blk=blk:
                         qpx.admm_solve_fixed_batched_shared(
                             pr.p_mat, pr.q_vec, a0, a1, mu, pr.lb, pr.ub,
                             args.iters, settings, pr.warm_x, pr.warm_y,
                             pr.rho0, sc, mi, block=blk))
            timeit(fs, prob, pb.mu_mpc, scal2, minv,
                   name=f"fused-ADMM shared (blk={blk})")
        except Exception as e:  # noqa: BLE001
            print(f"  fused-ADMM shared blk={blk} failed: "
                  f"{type(e).__name__}")

    # 8. full batched tick, pallas backends
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick,
    )
    tick_sh = jax.jit(lambda p, c, m, s: batched_control_tick(
        cfg, p, c, m, s, joy, dt, kkt_block=16,
        admm_backend="pallas_shared", admm_block=32))
    timeit(tick_sh, pb, cs, mem, sensors,
           name="full tick (sweep inv + shared ADMM)")


if __name__ == "__main__":
    main()
