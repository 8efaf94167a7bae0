"""CPU probe: how stale can a carried KKT inverse get along a real trot?

The round-4 verdict's top item: amortize the batched 120x120 KKT
factorization across ticks — refresh per-scenario every K ticks / on
contact flips, and between refreshes correct the stale inverse with a
truncated Neumann series ("operator refinement"):

    K_t^-1 = (I - C)^-1 M^-1 ~ (I + C + C^2 + ...) M^-1,  C = M^-1 (M - K_t)

where M is the KKT at the last refresh (same contact pattern, FROZEN
scaling d/e/c and rho — a preconditioner choice, not an approximation of
the problem). Validity requires ||C|| < 1; accuracy of the order-r
series is ||C||^(r+1).

This probe runs a single-scenario closed-loop trot (gazebo_mpc, fixed
mode — the bench config), rebuilds the per-tick scaled KKT matrix under
a refresh-every-K + refresh-on-flip policy, and reports the distribution
of ||C||_inf and the residual ||I - Minv_eff K||_inf for series orders
1 and 2, in f32 (the deployment dtype) with the refresh inverse also f32
(the Pallas GJ numerics class).

    python scripts/probe_amortize.py [K] [seconds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402


def main():
    period = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.control.controller import control_tick_jit
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
    from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25, mpc_solver_mode="fixed",
                              mpc_rescue_iters=150)
    terr = terrain_mod.Terrain.flat()
    n_steps = int(seconds / cfg.control_dt)
    walk_after = int(1.0 / cfg.control_dt)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=0.3)
    carry = cl.make_standing_start(cfg, params, terr)
    dt = jnp.float32(cfg.control_dt)
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    base_blk, slope_blk = srb.friction_basis_blocks(jnp.float32)

    def build_k(cs, mem, rho0, scal):
        """The scaled KKT matrix the batched route would assemble this
        tick at a GIVEN (rho, scaling) — mirrors batched_control_tick."""
        prob = grf.mpc_problem(cfg, params, cs, mem, dt, with_a_mat=False)
        m = qpx.scaled_kkt_matrix_blockdiag(
            prob.p_mat[None], base_blk, slope_blk,
            jnp.asarray([params.mu_mpc]), prob.lb[None], prob.ub[None],
            settings, jnp.asarray([rho0]), qpx.Scaling(
                d=scal.d[None], e=scal.e[None], c=scal.c[None]))
        return np.asarray(m[0], np.float32), prob

    cs, mem, ps = carry.cs, carry.mem, carry.ps
    prev = carry.ps.root_lin_vel

    refresh_state = None  # (minv_f32, m_used, age)
    prev_contacts = None
    rows = []
    # ROLLING refinement state: minv chained-updated every tick
    # (minv <- minv + minv (m_prev - K) minv, m_prev <- K), true refresh
    # only on flips. Tracks the f32 rounding floor of chained updates.
    roll = None  # (minv, m_prev, age, rho_used, scal_used)
    roll_rows = []
    for t in range(n_steps):
        j = jtu.tree_map(lambda a: a[t], joy)
        sensors = plant_mod.read_sensors(params, ps, prev, dt)
        cs, mem, tq = control_tick_jit(cfg, params, cs, mem, sensors, j, dt)
        prev = ps.root_lin_vel
        ps = plant_mod.plant_step(params, terr, ps, tq, dt)
        if t < walk_after:
            continue
        contacts = np.asarray(cs.contacts)
        # scaling/rho THIS tick would use (for a refresh)
        scal_now = qpx.rescale_cost(
            grf.mpc_problem(cfg, params, cs, mem, dt,
                            with_a_mat=False).p_mat,
            grf.mpc_problem(cfg, params, cs, mem, dt,
                            with_a_mat=False).q_vec,
            grf.scaling_for_contacts(mem.mpc_scaling_table, cs.contacts))
        rho_now = float(mem.mpc_rho)
        flip = (prev_contacts is None
                or (contacts != prev_contacts).any())
        prev_contacts = contacts

        # --- rolling-refinement branch
        if roll is None or flip:
            m_used_r, _ = build_k(cs, mem, rho_now, scal_now)
            minv_r = np.linalg.inv(m_used_r.astype(np.float32)).astype(
                np.float32)
            roll = (minv_r, m_used_r, 0, rho_now, scal_now)
        else:
            minv_r, m_prev, age_r, rho_u, scal_u = roll
            k_cur_r, _ = build_k(cs, mem, rho_u, scal_u)
            delta_r = (m_prev - k_cur_r).astype(np.float32)
            corr = (minv_r @ delta_r @ minv_r).astype(np.float32)
            minv_r = (minv_r + corr).astype(np.float32)
            eye = np.eye(k_cur_r.shape[0], dtype=np.float32)
            resid = np.abs(eye - minv_r @ k_cur_r).sum(axis=1).max()
            roll_rows.append((age_r + 1, resid))
            roll = (minv_r, k_cur_r, age_r + 1, rho_u, scal_u)

        if refresh_state is None or flip or refresh_state[2] >= period:
            m_used, _ = build_k(cs, mem, rho_now, scal_now)
            minv = np.linalg.inv(m_used.astype(np.float32)).astype(
                np.float32)
            refresh_state = (minv, m_used, 0, rho_now, scal_now)
            continue
        minv, m_used, age, rho_used, scal_used = refresh_state
        k_cur, _ = build_k(cs, mem, rho_used, scal_used)
        delta = (m_used - k_cur).astype(np.float32)
        c_mat = (minv @ delta).astype(np.float32)
        c_norm = np.abs(c_mat).sum(axis=1).max()       # inf operator norm
        eye = np.eye(k_cur.shape[0], dtype=np.float32)
        r0 = np.abs(eye - minv @ k_cur).sum(axis=1).max()
        m1 = (minv + c_mat @ minv).astype(np.float32)
        r1 = np.abs(eye - m1 @ k_cur).sum(axis=1).max()
        m2 = (minv + c_mat @ minv + c_mat @ (c_mat @ minv)).astype(
            np.float32)
        r2 = np.abs(eye - m2 @ k_cur).sum(axis=1).max()
        rows.append((age + 1, c_norm, r0, r1, r2))
        refresh_state = (minv, m_used, age + 1, rho_used, scal_used)

    rows = np.array(rows)
    print(f"period={period} samples={len(rows)}")
    for age in range(1, period + 1):
        sel = rows[rows[:, 0] == age]
        if not len(sel):
            continue
        print(f"  age={age:2d} n={len(sel):4d} "
              f"||C||inf p50={np.percentile(sel[:, 1], 50):.4f} "
              f"p99={np.percentile(sel[:, 1], 99):.4f} "
              f"max={sel[:, 1].max():.4f} | resid stale "
              f"p99={np.percentile(sel[:, 2], 99):.3f} "
              f"order1 p99={np.percentile(sel[:, 3], 99):.4f} "
              f"order2 p99={np.percentile(sel[:, 4], 99):.5f}")
    print(f"overall: ||C|| max={rows[:, 1].max():.4f}  "
          f"order1 resid max={rows[:, 3].max():.4f}  "
          f"order2 resid max={rows[:, 4].max():.5f}")

    rr = np.array(roll_rows)
    print(f"\nROLLING refinement ({len(rr)} samples, refresh on flip "
          f"only):")
    print(f"  resid p50={np.percentile(rr[:, 1], 50):.5f} "
          f"p99={np.percentile(rr[:, 1], 99):.5f} max={rr[:, 1].max():.5f}")
    old = rr[rr[:, 0] >= 10]
    if len(old):
        print(f"  at age>=10 (n={len(old)}): "
              f"p99={np.percentile(old[:, 1], 99):.5f} "
              f"max={old[:, 1].max():.5f} (no-compounding check)")
    print(f"  age max={int(rr[:, 0].max())}")


if __name__ == "__main__":
    main()
