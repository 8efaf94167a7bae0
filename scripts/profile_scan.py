"""Component timing via ON-DEVICE repetition (lax.scan with forced data
dependencies) — per-dispatch wall timing through the axon tunnel carries
~28 ms of RTT, so every component is timed as a scan of R dependent
repetitions inside ONE dispatch and reported per repetition.

    python scripts/profile_scan.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 10  # on-device repetitions per dispatch


def time_scan(step, init, name, reps=3):
    from a1_qp_mpc_controller_tpu.runtime.profiling import (
        time_scan as _ts,
    )
    return _ts(step, init, repeats=R, reps=reps, name=name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.control.controller import (
        control_tick, control_tick_build,
    )
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_spd,
    )
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick, randomize_params,
    )
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
    print(f"batch={b} iters={args.iters} device={jax.devices()[0]} "
          f"(scan x{R} on-device)")

    # full vmapped tick
    def tick_step(c):
        cs, mem = c
        cs, mem, _ = jax.vmap(lambda p, c1, m1, s: control_tick(
            cfg, p, c1, m1, s, joy, dt))(pb, cs, mem, sensors)
        return cs, mem
    time_scan(tick_step, (cs, mem), "full tick (vmap control_tick)")

    # full tick shared pallas
    for kb, ab in ((16, 32), (32, 64)):
        def tick_sh_step(c, kb=kb, ab=ab):
            cs, mem = c
            cs, mem, _ = batched_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt, kkt_block=kb,
                admm_backend="pallas_shared", admm_block=ab)
            return cs, mem
        time_scan(tick_sh_step, (cs, mem),
                  f"full tick shared (kkt={kb}, admm={ab})")

    # build
    def build_step(c):
        cs, mem = c
        cs, mem, prob = jax.vmap(lambda p, c1, m1, s: control_tick_build(
            cfg, p, c1, m1, s, joy, dt, with_a_mat=False))(
            pb, cs, mem, sensors)
        return cs, mem
    time_scan(build_step, (cs, mem), "build (no a_mat)")

    cs2, mem2, prob = jax.jit(jax.vmap(
        lambda p, c1, m1, s: control_tick_build(
            cfg, p, c1, m1, s, joy, dt, with_a_mat=False)))(
        pb, cs, mem, sensors)
    a0, a1 = srb.friction_constraint_basis(cfg.horizon)
    mu = pb.mu_mpc
    scal2 = jax.jit(jax.vmap(grf.scaling_for_contacts))(
        mem2.mpc_scaling_table, cs2.contacts)

    # KKT assembly (shared GEMM), dependency via rho0 no-op shift
    def kkt_step(m_prev):
        rho0 = prob.rho0 + 0.0 * m_prev[:, 0, 0]
        return qpx.scaled_kkt_matrix_shared(prob.p_mat, a0, a1, mu,
                                            prob.lb, prob.ub, settings,
                                            rho0, scal2)
    m_b = jax.jit(kkt_step)(jnp.zeros((b, 120, 120)))
    jax.block_until_ready(m_b)
    time_scan(kkt_step, m_b, "KKT assembly (shared GEMM)")

    # inverses (dependency: tiny additive feedback)
    eps = jnp.float32(1e-30)
    time_scan(lambda mi: jnp.linalg.inv(m_b + eps * mi), m_b,
              "KKT inverse (batched LU)")
    for blk in (8, 16, 32):
        time_scan(functools.partial(
            lambda mi, blk: batched_inverse(m_b + eps * mi, block=blk),
            blk=blk), m_b, f"KKT inverse (Pallas GJ blk={blk})")
        time_scan(functools.partial(
            lambda mi, blk: batched_inverse_spd(m_b + eps * mi, block=blk),
            blk=blk), m_b, f"KKT inverse (Pallas sweep blk={blk})")

    minv = jax.jit(jnp.linalg.inv)(m_b)
    jax.block_until_ready(minv)

    # ADMM loops (dependency: warm start from previous solution)
    def admm_xla_step(c):
        wx, wy, r = c
        sol = jax.vmap(lambda P, q, A, l, u, sc, mi, x0, y0, r0:
                       qpx.admm_solve_fixed(
                           P, q, A, l, u, args.iters, settings, x0=x0,
                           y0=y0, rho0=r0, scaling=sc, kkt_inv=mi))(
            prob.p_mat, prob.q_vec,
            jnp.broadcast_to(a0[None] + mu[:, None, None] * a1[None],
                             (b, 200, 120)),
            prob.lb, prob.ub, scal2, minv, wx, wy, r)
        return sol.x, sol.y, sol.rho
    time_scan(admm_xla_step, (prob.warm_x, prob.warm_y, prob.rho0),
              f"ADMM {args.iters} it (XLA, inv given)")

    for blk in (16, 32, 64):
        def admm_sh_step(c, blk=blk):
            wx, wy, r = c
            sol = qpx.admm_solve_fixed_batched_shared(
                prob.p_mat, prob.q_vec, a0, a1, mu, prob.lb, prob.ub,
                args.iters, settings, wx, wy, r, scal2, minv,
                block=blk)
            return sol.x, sol.y, sol.rho
        time_scan(admm_sh_step, (prob.warm_x, prob.warm_y, prob.rho0),
                  f"ADMM {args.iters} it (fused shared blk={blk})")


if __name__ == "__main__":
    main()
