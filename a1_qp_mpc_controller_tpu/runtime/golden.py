"""Golden-trajectory gate: force-trajectory match against the float64
reference solver along a closed-loop trot.

BASELINE.md requires a "bit-tolerant match to reference (OSQP) force
trajectories over a 10 s trot". OSQP itself is not available in this
environment, so the ground truth is the float64 NumPy ADMM solved to 1e-9
residuals (``ops/qp_ref`` — same algorithm family as OSQP with KKT
verification; a strictly convex QP has a unique optimum, so any solver
converged to tight KKT residuals yields the same forces).

The gate runs the f32 TPU control stack closed-loop, and at sampled ticks
rebuilds the exact QP the controller solved and re-solves it in float64.
Reported: per-solve first-step force deviation (N) and the fraction of
sampled solves within tolerance.

Run as a script:  python -m a1_qp_mpc_controller_tpu.runtime.golden
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from a1_qp_mpc_controller_tpu.config import GRAVITY, A1Config, RobotParams
from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.control.controller import control_tick_jit
from a1_qp_mpc_controller_tpu.models import srb
from a1_qp_mpc_controller_tpu.ops import qp_ref
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod


def rebuild_mpc_qp(cfg: A1Config, params: RobotParams, cs, dt):
    """Reconstruct the exact MPC QP compute_grf solved for this tick
    (mirrors control/grf.py's MPC branch)."""
    dtype = cs.root_pos.dtype
    mpc_states = jnp.concatenate([
        cs.root_euler, cs.root_pos, cs.root_ang_vel, cs.root_lin_vel,
        jnp.asarray([-GRAVITY], dtype)])
    lin_vel_d_world = cs.root_rot_mat @ cs.root_lin_vel_d
    x_ref = srb.build_reference_trajectory(
        cs.root_euler, cs.root_pos, cs.root_pos_d, cs.root_euler_d,
        cs.root_ang_vel_d, lin_vel_d_world, dt, cfg.horizon)
    a_c = srb.continuous_a(cs.root_euler)
    b_c = srb.continuous_b(params.robot_mass, params.trunk_inertia,
                           cs.root_rot_mat, cs.foot_pos_abs)
    _, b_d = srb.discretize(a_c, b_c, dt)
    b_d_list = jnp.broadcast_to(b_d, (cfg.horizon,) + b_d.shape)
    a_qp, b_qp = srb.condense(a_c, b_d_list, dt, cfg.horizon)
    p_mat, q_vec = srb.mpc_cost(a_qp, b_qp, params.q_weights,
                                params.r_weights, mpc_states, x_ref,
                                cfg.horizon)
    a_mat = srb.friction_constraint_matrix(params.mu_mpc, cfg.horizon,
                                           dtype)
    lb, ub = srb.mpc_bounds(cs.contacts, params.fz_min, params.fz_max,
                            cfg.horizon, dtype)
    return p_mat, q_vec, a_mat, lb, ub


def rebuild_stand_qp(cfg: A1Config, params: RobotParams, cs):
    """Reconstruct the 12-var stand QP compute_grf solved this tick
    (mirrors control/grf.py path 0 incl. the swing elimination)."""
    from a1_qp_mpc_controller_tpu.control import grf

    p_mat, q_vec = grf.stand_qp_matrices(params, cs)
    a_mat, lb, ub = grf.stand_qp_constraints(params, cs)
    s_var = jnp.repeat(cs.contacts, 3)
    sf = s_var.astype(p_mat.dtype)
    p_mat = p_mat * (sf[:, None] * sf[None, :]) + jnp.diag(1.0 - sf)
    q_vec = q_vec * sf
    row_mask = jnp.concatenate([cs.contacts, jnp.repeat(cs.contacts, 4)])
    inf = jnp.asarray(jnp.inf, p_mat.dtype)
    lb = jnp.where(row_mask, lb, -inf)
    ub = jnp.where(row_mask, ub, inf)
    return p_mat, q_vec, a_mat, lb, ub


def run_gate(seconds: float = 10.0, sample_every: int = 50,
             walk_after_s: float = 1.0, velx: float = 0.3,
             mpc_iters: int = 400, solver_mode: str = "adaptive",
             profile: str = "gazebo_mpc",
             terrain: Optional[terrain_mod.Terrain] = None,
             tol_newton: float = 2.0, verbose: bool = True,
             rescue_iters: int = 0, polish_every: int = 0,
             polish_iters: int = 0, cooldown_ticks: int = 4,
             cooldown_stride: int = 1, cooldown_dense: int = 4,
             drift_rescue_n: float = 0.0,
             ref_fidelity_baseline: bool = False) -> dict:
    cfg, params = load_profile(profile)
    cfg = dataclasses.replace(cfg, mpc_qp_iters=mpc_iters,
                              mpc_solver_mode=solver_mode,
                              mpc_rescue_iters=rescue_iters,
                              mpc_polish_every=polish_every,
                              mpc_polish_iters=polish_iters,
                              mpc_cooldown_ticks=cooldown_ticks,
                              mpc_cooldown_stride=cooldown_stride,
                              mpc_cooldown_dense=cooldown_dense,
                              mpc_drift_rescue_n=drift_rescue_n)
    terrain = terrain if terrain is not None else terrain_mod.Terrain.flat()
    n_steps = int(seconds / cfg.control_dt)
    walk_after = int(walk_after_s / cfg.control_dt)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=velx)
    carry = cl.make_standing_start(cfg, params, terrain)
    dt = jnp.float32(cfg.control_dt)

    cs, mem, ps = carry.cs, carry.mem, carry.ps
    prev = carry.prev_root_lin_vel
    devs = []
    ref_mags = []
    ref_devs = []   # reference-fidelity baseline (OSQP default eps)
    for t in range(n_steps):
        j = jtu.tree_map(lambda a: a[t], joy)
        sensors = plant_mod.read_sensors(params, ps, prev, dt)
        cs, mem, tq = control_tick_jit(cfg, params, cs, mem, sensors, j, dt)
        prev = ps.root_lin_vel
        ps = plant_mod.plant_step(params, terrain, ps, tq, dt)
        if t >= walk_after and (t - walk_after) % sample_every == 0:
            if cfg.stance_leg_control_type == 0:
                p_mat, q_vec, a_mat, lb, ub = rebuild_stand_qp(
                    cfg, params, cs)
            else:
                p_mat, q_vec, a_mat, lb, ub = rebuild_mpc_qp(
                    cfg, params, cs, dt)
            x64, _, _, info = qp_ref.solve_qp_ref(
                np.asarray(p_mat, np.float64), np.asarray(q_vec, np.float64),
                np.asarray(a_mat, np.float64), np.asarray(lb, np.float64),
                np.asarray(ub, np.float64), eps=1e-9)
            f_ref = x64[:12].reshape(4, 3)
            f_ours = np.asarray(cs.root_rot_mat) @ np.asarray(
                cs.foot_forces_grf).T  # body -> world, (3,4)
            dev = np.abs(f_ours.T - f_ref).max()
            devs.append(dev)
            ref_mags.append(np.abs(f_ref).max())
            if ref_fidelity_baseline:
                # how far the REFERENCE's solver itself sits from the
                # exact optimum: the same instance solved (in float64,
                # so generously) at OSQP's DEFAULT tolerances eps_abs =
                # eps_rel = 1e-3 — the settings the reference ships
                # (it sets neither, A1RobotControl.cpp:522-540). The
                # near-flat internal-force directions let a
                # tolerance-converged solve sit far from the optimum;
                # this column shows how much of that slack the
                # reference itself accepts every tick.
                x3, _, _, _ = qp_ref.solve_qp_ref(
                    np.asarray(p_mat, np.float64),
                    np.asarray(q_vec, np.float64),
                    np.asarray(a_mat, np.float64),
                    np.asarray(lb, np.float64),
                    np.asarray(ub, np.float64), eps=1e-3)
                ref_devs.append(
                    np.abs(x3[:12].reshape(4, 3) - f_ref).max())
            if verbose and len(devs) % 10 == 1:
                print(f"  t={t * cfg.control_dt:.2f}s dev={dev:.3f} N "
                      f"(ref max {ref_mags[-1]:.0f} N)", file=sys.stderr)
    devs = np.array(devs)
    report = {
        "samples": len(devs),
        "max_dev_N": float(devs.max()),
        "mean_dev_N": float(devs.mean()),
        "p95_dev_N": float(np.percentile(devs, 95)),
        "frac_within_tol": float((devs <= tol_newton).mean()),
        "tol_N": tol_newton,
        "final_x_m": float(ps.root_pos[0]),
        "final_z_m": float(ps.root_pos[2]),
        "nan": bool(np.isnan(np.asarray(ps.root_pos)).any()),
    }
    if ref_devs:
        rd = np.array(ref_devs)
        report["ref_osqp_default_max_dev_N"] = float(rd.max())
        report["ref_osqp_default_p95_dev_N"] = float(
            np.percentile(rd, 95))
        report["ref_osqp_default_frac_within_tol"] = float(
            (rd <= tol_newton).mean())
    return report


def run_stand_batched_gate(seconds: float = 1.5, sample_every: int = 2,
                           batch: int = 3, walk_after_s: float = 0.5,
                           velx: float = 0.3, stand_qp_iters: int = 100,
                           rescue_capacity: Optional[int] = None,
                           tol_newton: float = 2.0,
                           verbose: bool = False) -> dict:
    """Golden gate for the LOCK-STEP batched stand-QP route
    (parallel.batched.batched_stand_control_tick): closed-loop gazebo_qp
    trot with staggered gait phases across the batch (so flips land on
    different ticks), per-sample f64-optimum force comparison for every
    scenario. This is the quality certificate for the fixed-budget +
    gathered-rescue schedule the throughput bench ships."""
    import jax

    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_stand_control_tick, make_flat_batch,
    )

    cfg, params = load_profile("gazebo_qp")
    cfg = dataclasses.replace(cfg, mpc_solver_mode="fixed",
                              stand_qp_iters=stand_qp_iters)
    if rescue_capacity is None:
        # size the rescue to the one synchronized flip (walk onset,
        # where EVERY scenario flips on the same tick); steady-state
        # flips are staggered and need far less
        rescue_capacity = batch
    n_steps = int(seconds / cfg.control_dt)
    walk_after = int(walk_after_s / cfg.control_dt)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=velx)
    pb, terr, carry = make_flat_batch(cfg, jax.random.PRNGKey(7), batch,
                                      params)
    # stagger the gait phases so contact flips hit different ticks in
    # different scenarios (the hard case for a lock-step batch)
    offs = jnp.linspace(0.0, 110.0, batch)[:, None]
    carry = carry.replace(cs=carry.cs.replace(
        gait_counter=(carry.cs.gait_counter + offs) % 240.0))
    dt = jnp.float32(cfg.control_dt)

    @jax.jit
    def tick(carry, j):
        sensors = jax.vmap(
            lambda p, ps, pv: plant_mod.read_sensors(p, ps, pv, dt)
        )(pb, carry.ps, carry.prev_root_lin_vel)
        cs, mem, tq = batched_stand_control_tick(
            cfg, pb, carry.cs, carry.mem, sensors, j, dt,
            rescue_capacity=rescue_capacity)
        prev = carry.ps.root_lin_vel
        ps = jax.vmap(
            lambda p, t, s, q: plant_mod.plant_step(p, t, s, q, dt)
        )(pb, terr, carry.ps, tq)
        return cl.LoopCarry(cs=cs, mem=mem, ps=ps,
                            prev_root_lin_vel=prev)

    devs = []
    for t in range(n_steps):
        j = jtu.tree_map(lambda a: a[t], joy)
        carry = tick(carry, j)
        if t >= walk_after and (t - walk_after) % sample_every == 0:
            for i in range(batch):
                cs_i = jtu.tree_map(lambda a: a[i], carry.cs)
                p_i = jtu.tree_map(lambda a: a[i], pb)
                p_mat, q_vec, a_mat, lb, ub = rebuild_stand_qp(
                    cfg, p_i, cs_i)
                x64, _, _, _ = qp_ref.solve_qp_ref(
                    np.asarray(p_mat, np.float64),
                    np.asarray(q_vec, np.float64),
                    np.asarray(a_mat, np.float64),
                    np.asarray(lb, np.float64),
                    np.asarray(ub, np.float64), eps=1e-9)
                f_ref = x64.reshape(4, 3)
                f_ours = (np.asarray(cs_i.root_rot_mat)
                          @ np.asarray(cs_i.foot_forces_grf).T)
                dev = np.abs(f_ours.T - f_ref).max()
                devs.append(dev)
                if verbose and dev > tol_newton:
                    print(f"  t={t * cfg.control_dt:.3f}s scen {i} "
                          f"dev={dev:.3f} N", file=sys.stderr)
    devs = np.array(devs)
    root = np.asarray(carry.ps.root_pos)
    return {
        "samples": len(devs),
        "max_dev_N": float(devs.max()),
        "mean_dev_N": float(devs.mean()),
        "p95_dev_N": float(np.percentile(devs, 95)),
        "frac_within_tol": float((devs <= tol_newton).mean()),
        "tol_N": tol_newton,
        "nan": bool(np.isnan(root).any()),
    }


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    rep = run_gate(seconds=secs)
    print(rep)
