"""Stance-force computation: terrain adaptation + QP balance controller +
convex-MPC driver.

Functional re-design of ``A1RobotControl::compute_grf``
(A1RobotControl.cpp:321-564) and ``compute_walking_surface`` (:566-582).
Which path runs (0: stand QP, 1: MPC) is a *static* config choice, mirroring
the reference's launch-time ``stance_leg_control_type``; the jitted tick
contains exactly one solver.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import (
    A1Config, GRAVITY, NUM_LEG, RobotParams,
)
from a1_qp_mpc_controller_tpu.models import srb
from a1_qp_mpc_controller_tpu.ops import qp as qpx
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState
from a1_qp_mpc_controller_tpu.utils import mathx
from a1_qp_mpc_controller_tpu.utils.filters import filter_update_masked

# initial ADMM stepsize for the MPC problem family (after Ruiz scaling);
# adapted per-solve / carried across ticks thereafter. 1e-3 is tuned for
# the swing-eliminated problem family (kappa ~ 1e3; see mpc_problem) —
# measured to converge every captured contact-flip instance in <= 50
# fixed iterations, where the pinned family stalled at ~100 N.
_MPC_RHO0 = 3e-3
_QP_RHO0 = 0.1
# post-flip rescue window (ticks): force deviations decay over ~4 ticks
# after a contact flip while the relative tolerance reports converged
FLIP_COOLDOWN_TICKS = 4


def scaling_for_contacts(table, contacts: jnp.ndarray):
    """Select the precomputed equilibration matching a contact pattern
    from the 16-entry table (srb.reference_mpc_scaling_table).

    Implemented as a one-hot contraction, not an indexed gather: XLA's
    TPU gather lowering measured 2.4 ms for the batched (B,16,n) case
    at B=1024, while the equivalent one-hot matmul is noise-level."""
    idx = jnp.sum(contacts.astype(jnp.int32)
                  * jnp.array([8, 4, 2, 1], jnp.int32))
    onehot = (jnp.arange(16) == idx).astype(table.d.dtype)   # (16,)

    def sel(t):
        flat = t.reshape(16, -1)
        out = jnp.einsum("p,pn->n", onehot, flat,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(t.shape[1:])

    return jax.tree_util.tree_map(sel, table)


def compute_walking_surface(cs: CtrlState) -> jnp.ndarray:
    """LS plane fit z = a0 + a1 x + a2 y over the 4 recent contact points;
    returns the plane normal coefficient vector [a1, a2, -1]
    (A1RobotControl.cpp:566-582)."""
    w = jnp.concatenate([jnp.ones((NUM_LEG, 1), cs.foot_pos_abs.dtype),
                         cs.foot_pos_recent_contact[:, :2]], axis=1)
    z = cs.foot_pos_recent_contact[:, 2]
    a = mathx.pseudo_inverse_3x3(w.T @ w) @ (w.T @ z)
    return jnp.stack([a[1], a[2], -jnp.ones((), a.dtype)])


def terrain_adaptation(cfg: A1Config, cs: CtrlState, mem: CtrlMem
                       ) -> Tuple[CtrlState, CtrlMem]:
    """Estimate terrain pitch and (optionally) overwrite desired pitch
    (A1RobotControl.cpp:334-375). MPC path only."""
    surf_coef = compute_walking_surface(cs)
    flat = jnp.array([0.0, 0.0, 1.0], surf_coef.dtype)
    raw_angle = mathx.cal_dihedral_angle(flat, surf_coef)
    body_high = cs.root_pos[2] > 0.1
    t_filter, avg = filter_update_masked(mem.terrain_angle_filter, raw_angle,
                                         body_high)
    terrain_angle = jnp.where(body_high, avg, 0.0)
    terrain_angle = jnp.clip(terrain_angle, -0.5, 0.5)

    # front-vs-rear height difference decides the pitch sign
    z = cs.foot_pos_recent_contact[:, 2]
    f_r_diff = z[0] + z[1] - z[2] - z[3]
    pitch_d = jnp.where(f_r_diff > 0.05, -terrain_angle, terrain_angle)
    if cfg.use_terrain_adapt:
        root_euler_d = cs.root_euler_d.at[1].set(pitch_d)
    else:
        root_euler_d = cs.root_euler_d
    cs = cs.replace(root_euler_d=root_euler_d,
                    terrain_pitch_angle=terrain_angle)
    return cs, mem.replace(terrain_angle_filter=t_filter)


def _euler_error(cs: CtrlState) -> jnp.ndarray:
    err = cs.root_euler_d - cs.root_euler
    yaw_err = mathx.wrap_yaw_error(err[2], cs.root_euler_d[2],
                                   cs.root_euler[2])
    return err.at[2].set(yaw_err)


def stand_qp_matrices(params: RobotParams, cs: CtrlState):
    """Build the 12-var stand QP (A1RobotControl.cpp:377-431)."""
    dtype = cs.root_pos.dtype
    euler_error = _euler_error(cs)

    # desired 6-DoF root acceleration from PD (A1RobotControl.cpp:379-391)
    lin = params.kp_linear * (cs.root_pos_d - cs.root_pos)
    lin = lin + cs.root_rot_mat @ (params.kd_linear * (
        cs.root_lin_vel_d - cs.root_rot_mat.T @ cs.root_lin_vel))
    ang = params.kp_angular * euler_error
    ang = ang + params.kd_angular * (
        cs.root_ang_vel_d - cs.root_rot_mat.T @ cs.root_ang_vel)
    root_acc = jnp.concatenate([lin, ang])
    root_acc = root_acc.at[2].add(params.robot_mass * GRAVITY)

    # inertia_inv (6,12): [I3; Rz' skew(r_i)]  (A1RobotControl.cpp:394-399)
    top = jnp.tile(jnp.eye(3, dtype=dtype), (1, NUM_LEG))
    # (a, l, c) = Rz'[.,a->b] skew(r_l)[b,c]; columns grouped per leg
    bottom = jnp.einsum("ba,lbc->alc", cs.root_rot_mat_z,
                        mathx.skew(cs.foot_pos_abs)).reshape(3, NUM_LEG * 3)
    m_mat = jnp.concatenate([top, bottom], axis=0)

    q_diag = params.qp_q_weights
    p_mat = params.qp_r_weight * jnp.eye(12, dtype=dtype) + \
        m_mat.T @ (q_diag[:, None] * m_mat)
    q_vec = -(m_mat.T @ (q_diag * root_acc))
    return p_mat, q_vec


def stand_qp_constraints(params: RobotParams, cs: CtrlState):
    """(20,12) constraint matrix + contact-gated bounds
    (A1RobotControl.cpp:28-48, 409-413)."""
    dtype = cs.root_pos.dtype
    mu = params.mu_qp
    a = jnp.zeros((20, 12), dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    lb = jnp.zeros(20, dtype)
    ub = jnp.zeros(20, dtype)
    c = cs.contacts.astype(dtype)
    for i in range(NUM_LEG):
        a = a.at[i, 2 + 3 * i].set(1.0)
        base = NUM_LEG + 4 * i
        a = a.at[base, 3 * i].set(1.0)
        a = a.at[base, 2 + 3 * i].set(-mu)
        a = a.at[base + 1, 3 * i].set(-1.0)
        a = a.at[base + 1, 2 + 3 * i].set(-mu)
        a = a.at[base + 2, 1 + 3 * i].set(1.0)
        a = a.at[base + 2, 2 + 3 * i].set(-mu)
        a = a.at[base + 3, 1 + 3 * i].set(-1.0)
        a = a.at[base + 3, 2 + 3 * i].set(-mu)
        lb = lb.at[NUM_LEG + 4 * i:NUM_LEG + 4 * i + 4].set(-inf)
    lb = lb.at[:NUM_LEG].set(c * params.fz_min)
    ub = ub.at[:NUM_LEG].set(c * params.fz_max)
    return a, lb, ub


def compute_grf(cfg: A1Config, params: RobotParams, cs: CtrlState,
                mem: CtrlMem, dt: jnp.ndarray
                ) -> Tuple[CtrlState, CtrlMem]:
    """The per-tick stance-force solve. Returns body-frame GRFs in
    ``cs.foot_forces_grf`` and updated solver memory."""
    if cfg.stance_leg_control_type == 1:
        cs, mem = terrain_adaptation(cfg, cs, mem)

    if cfg.stance_leg_control_type == 0:
        # --- stand QP path (A1RobotControl.cpp:377-431); the build /
        # solve / apply split lives in stand_qp_problem /
        # stand_qp_apply so batched executors can swap the solver core
        # (parallel.batched.batched_stand_control_tick).
        prob = stand_qp_problem(cfg, params, cs, mem)
        # adaptive solve-to-tolerance core (the reference's OSQP runs
        # to tolerance every tick, A1RobotControl.cpp:428): at n=12 the
        # while_loop's refactorizations are unrolled 12x12 GJ inverses.
        # A pure fixed budget was measured to stall at contact flips
        # (~20 N transients at 100-300 iterations; the kappa ~1e6
        # family's flip-tick active-set discovery wants both rho
        # adaptation and a variable iteration count) — the batched
        # lock-step route therefore pairs a fixed budget with a
        # gathered fixed-budget rho-refactored RESCUE of flip
        # scenarios.
        sol = qpx.admm_solve(
            prob.p_mat, prob.q_vec, prob.a_mat, prob.lb, prob.ub,
            qpx.QPSettings(rho=_QP_RHO0, eps_abs=1e-4, eps_rel=1e-4,
                           max_iter=cfg.stand_qp_iters * 10,
                           check_every=cfg.qp_check_every),
            x0=prob.warm_x, y0=prob.warm_y, rho0=prob.rho0)
        return stand_qp_apply(cfg, cs, mem, sol)
    else:
        # --- convex MPC path (A1RobotControl.cpp:446-561)
        prob = mpc_problem(cfg, params, cs, mem, dt)
        scal = qpx.rescale_cost(
            prob.p_mat, prob.q_vec,
            scaling_for_contacts(mem.mpc_scaling_table, cs.contacts))
        if cfg.mpc_solver_mode == "fixed":
            sol = qpx.admm_solve_fixed(
                prob.p_mat, prob.q_vec, prob.a_mat, prob.lb, prob.ub,
                cfg.mpc_qp_iters, qpx.QPSettings(rho=_MPC_RHO0),
                x0=prob.warm_x, y0=prob.warm_y, rho0=prob.rho0,
                scaling=scal)
            if cfg.mpc_rescue_iters > 0:
                # flip-rescue: unconverged (or flip-tick) solves
                # continue warm-started for extra iterations at a
                # REFACTORED stepsize — the first pass's rho estimate.
                # Measured (round 4): stalled solves are primal-
                # dominant (rp ~ 0.1-1 with rd ~ 1e-6) because the
                # carried rho lags the instance by 2-3x; the refactor
                # is exactly OSQP's adaptive-rho move, paid only on
                # rescued ticks. Single-scenario form of the batched
                # gathered rescue (parallel.batched rescue_capacity).
                def _rescue(s):
                    # refactor rho only when the first pass failed (a
                    # rho jump transiently raises residuals; converged
                    # cooldown-window rescues just continue)
                    rho_r = jnp.where(
                        s.converged, prob.rho0,
                        jnp.clip(s.rho, 0.1 * _MPC_RHO0,
                                 100.0 * _MPC_RHO0))
                    return qpx.admm_solve_fixed(
                        prob.p_mat, prob.q_vec, prob.a_mat, prob.lb,
                        prob.ub, cfg.mpc_rescue_iters,
                        qpx.QPSettings(rho=_MPC_RHO0), x0=s.x, y0=s.y,
                        rho0=rho_r, scaling=scal)

                # flip and post-flip-window ticks are rescued even
                # when nominally converged (the loose relative
                # tolerance admits a few N there)
                sol = jax.lax.cond(sol.converged & ~prob.rescue_flag,
                                   lambda s: s, _rescue, sol)
            if cfg.mpc_polish_iters > 0 and cfg.mpc_polish_every > 0:
                # round-robin accuracy polish (round 5): every K-th
                # tick, continue the converged solve for extra
                # iterations at the SAME stepsize (no refactor). The
                # golden-gate tail (probe_golden_tail.py) is slow
                # warm-start drift in near-flat internal-force
                # directions with NO residual signature — only a
                # deterministic cadence bounds it. Skipped on ticks
                # the rescue already handled.
                due = ((mem.tick % cfg.mpc_polish_every) == 0)
                due = due & sol.converged & ~prob.rescue_flag

                def _polish(s):
                    return qpx.admm_solve_fixed(
                        prob.p_mat, prob.q_vec, prob.a_mat, prob.lb,
                        prob.ub, cfg.mpc_polish_iters,
                        qpx.QPSettings(rho=_MPC_RHO0), x0=s.x, y0=s.y,
                        rho0=prob.rho0, scaling=scal)

                sol = jax.lax.cond(due, _polish, lambda s: s, sol)
        else:
            sol = qpx.admm_solve(
                prob.p_mat, prob.q_vec, prob.a_mat, prob.lb, prob.ub,
                qpx.QPSettings(rho=_MPC_RHO0, eps_abs=1e-5, eps_rel=1e-5,
                               max_iter=cfg.mpc_qp_iters,
                               check_every=cfg.qp_check_every),
                x0=prob.warm_x, y0=prob.warm_y, rho0=prob.rho0,
                scaling=scal)
            # tail polish: 75 more fixed iterations past the tolerance
            # exit. The MPC cost is near-flat in internal-force
            # directions (r_weights ~1e-7, a preserved reference
            # quirk), so the 1e-5 RELATIVE tolerance can be satisfied
            # several N from the optimum (measured round 4: a fresh
            # converged-at-1e-5 solve 3.8 N off; +75 iterations pins it
            # to ~0.02 N; even float64 at 1e-5 sits 1 N off). The
            # reference's OSQP at its default 1e-3 ships far more
            # flat-direction slack — this pass makes the adaptive mode
            # strictly MORE accurate than the reference, at ~0.15 ms
            # single-scenario cost.
            sol = qpx.admm_solve_fixed(
                prob.p_mat, prob.q_vec, prob.a_mat, prob.lb, prob.ub,
                75, qpx.QPSettings(rho=_MPC_RHO0), x0=sol.x, y0=sol.y,
                rho0=prob.rho0, scaling=scal)
        return mpc_apply_solution(cfg, cs, mem, sol)


class StandQpProblem(struct.PyTreeNode):
    """One tick's 12-var stand QP + warm-start data. Produced by
    :func:`stand_qp_problem`, consumed by a solver, finished by
    :func:`stand_qp_apply` — the split lets batched executors run a
    lock-step fixed-budget solve with a gathered flip rescue
    (parallel.batched.batched_stand_control_tick)."""

    p_mat: jnp.ndarray   # (12,12)
    q_vec: jnp.ndarray   # (12,)
    a_mat: jnp.ndarray   # (20,12)
    lb: jnp.ndarray      # (20,)
    ub: jnp.ndarray      # (20,)
    warm_x: jnp.ndarray  # (12,)
    warm_y: jnp.ndarray  # (20,)
    rho0: jnp.ndarray    # ()


def stand_qp_problem(cfg: A1Config, params: RobotParams, cs: CtrlState,
                     mem: CtrlMem) -> StandQpProblem:
    """Build the tick's stand QP (A1RobotControl.cpp:377-431) with
    swing-leg variable elimination and (fixed mode) flip-masked warm
    start + cross-tick rho carry.

    Swing elimination: same mask trick as the MPC (srb.eliminate_swing)
    — with legs out of contact the reference's contact-gated bounds
    become equality pins that wreck the ADMM conditioning; elimination
    leaves the identical optimum with no equality rows. Row layout: 4
    Fz rows then 4x4 pyramid rows."""
    dtype = cs.root_pos.dtype
    p_mat, q_vec = stand_qp_matrices(params, cs)
    a_mat, lb, ub = stand_qp_constraints(params, cs)
    s_var = jnp.repeat(cs.contacts, 3)                   # (12,)
    sf = s_var.astype(dtype)
    p_mat = p_mat * (sf[:, None] * sf[None, :]) + jnp.diag(1.0 - sf)
    q_vec = q_vec * sf
    row_mask = jnp.concatenate([cs.contacts,
                                jnp.repeat(cs.contacts, 4)])  # (20,)
    inf = jnp.asarray(jnp.inf, dtype)
    lb = jnp.where(row_mask, lb, -inf)
    ub = jnp.where(row_mask, ub, inf)
    if cfg.mpc_solver_mode == "fixed":
        # warm start + rho carry on calm ticks; COLD restart (zero
        # x/y, rho re-seed) on any contact flip. Measured (round 4,
        # dense per-tick golden sampling): a flip-tick solve continued
        # from the surviving legs' warm iterates satisfies the 1e-4
        # relative tolerances ~10 N away from the optimum (the carried
        # duals encode the old active set), while a cold solve of the
        # same instance reaches 0.1 N in ~50 iterations — at n=12 the
        # warm start saves nothing worth that failure mode.
        any_flip = jnp.any(cs.contacts != mem.qp_prev_contacts)
        keep_v = (~any_flip) & s_var
        keep_r = (~any_flip) & row_mask
        warm_x = jnp.where(keep_v, mem.qp_warm_x, 0.0)
        warm_y = jnp.where(keep_r, mem.qp_warm_y, 0.0)
        rho0 = jnp.where(any_flip, jnp.asarray(_QP_RHO0, dtype),
                         mem.qp_rho)
    else:
        warm_x = jnp.zeros_like(q_vec)
        warm_y = jnp.zeros_like(lb)
        rho0 = jnp.asarray(_QP_RHO0, dtype)
    return StandQpProblem(p_mat=p_mat, q_vec=q_vec, a_mat=a_mat, lb=lb,
                          ub=ub, warm_x=warm_x, warm_y=warm_y, rho0=rho0)


def stand_qp_apply(cfg: A1Config, cs: CtrlState, mem: CtrlMem,
                   sol) -> Tuple[CtrlState, CtrlMem]:
    """Store stand-QP warm-start memory (fixed mode) and map the solved
    world-frame forces into body frame with the per-leg NaN guard
    (A1RobotControl.cpp:439-444)."""
    if cfg.mpc_solver_mode == "fixed":
        mem = mem.replace(qp_warm_x=sol.x, qp_warm_y=sol.y,
                          qp_prev_contacts=cs.contacts,
                          qp_rho=jnp.clip(sol.rho, 1e-3, 1.0))
    forces_world = sol.x.reshape(NUM_LEG, 3)
    forces_body = jnp.einsum("ba,lb->la", cs.root_rot_mat, forces_world)
    bad = jnp.isnan(jnp.sum(forces_body, axis=1))
    forces_body = jnp.where(bad[:, None], cs.foot_forces_grf, forces_body)
    return cs.replace(foot_forces_grf=forces_body), mem


class MpcProblem(struct.PyTreeNode):
    """One tick's condensed MPC QP + warm-start data. Produced by
    :func:`mpc_problem`, consumed by a solver, finished by
    :func:`mpc_apply_solution` — split out so batched executors can hoist
    the solve (e.g. the Pallas batched KKT inverse) out of ``vmap``.

    ``a_mat`` is None when built with ``with_a_mat=False`` (the
    shared-basis solver route never materializes the per-scenario
    constraint matrix: A = A0 + mu*A1, srb.friction_constraint_basis)."""

    p_mat: jnp.ndarray   # (120,120)
    q_vec: jnp.ndarray   # (120,)
    a_mat: jnp.ndarray | None   # (200,120) or None
    lb: jnp.ndarray      # (200,)
    ub: jnp.ndarray      # (200,)
    warm_x: jnp.ndarray  # (120,)
    warm_y: jnp.ndarray  # (200,)
    rho0: jnp.ndarray    # ()
    flipped: jnp.ndarray  # () bool — any contact flip THIS tick
    rescue_flag: jnp.ndarray  # () bool — rescue-eligible: flipped OR
    #                        within the post-flip cooldown window. Flip
    #                        and post-flip solves can satisfy the loose
    #                        relative tolerance several N off-optimum
    #                        (the error decays over ~4 ticks as the
    #                        warm start heals — measured round 4), so
    #                        the rescue pass stays armed through the
    #                        window even when 'converged'.


def mpc_problem(cfg: A1Config, params: RobotParams, cs: CtrlState,
                mem: CtrlMem, dt: jnp.ndarray,
                with_a_mat: bool = True) -> MpcProblem:
    """Build the tick's MPC QP (A1RobotControl.cpp:446-518 + warm-start
    bookkeeping). Pure — no state updates."""
    dtype = cs.root_pos.dtype
    mpc_states = jnp.concatenate([
        cs.root_euler, cs.root_pos, cs.root_ang_vel, cs.root_lin_vel,
        jnp.asarray([-GRAVITY], dtype)])
    # sim integrates with the measured dt; hardware pins 2.5 ms
    # (A1RobotControl.cpp:458-467)
    mpc_dt = dt if cfg.use_sim_time else jnp.asarray(0.0025, dtype)

    lin_vel_d_world = cs.root_rot_mat @ cs.root_lin_vel_d
    x_ref = srb.build_reference_trajectory(
        cs.root_euler, cs.root_pos, cs.root_pos_d, cs.root_euler_d,
        cs.root_ang_vel_d, lin_vel_d_world, mpc_dt, cfg.horizon)

    a_c = srb.continuous_a(cs.root_euler)
    if cfg.mpc_receding_footholds:
        # per-step B: feet recede relative to the body as it advances at
        # the commanded velocity (the reference's test-harness variant,
        # test_mpc.cpp:106-122; left commented out in production,
        # A1RobotControl.cpp:504-507)
        steps = jnp.arange(cfg.horizon, dtype=dtype) * mpc_dt  # (H,)
        feet_h = (cs.foot_pos_abs[None, :, :]
                  - steps[:, None, None] * lin_vel_d_world[None, None, :])
        b_c_list = jax.vmap(lambda fp: srb.continuous_b(
            params.robot_mass, params.trunk_inertia, cs.root_rot_mat, fp)
        )(feet_h)
        b_d_list = b_c_list * mpc_dt
        a_qp, b_qp = srb.condense(a_c, b_d_list, mpc_dt, cfg.horizon)
    else:
        b_c = srb.continuous_b(params.robot_mass, params.trunk_inertia,
                               cs.root_rot_mat, cs.foot_pos_abs)
        _, b_d = srb.discretize(a_c, b_c, mpc_dt)
        # production path: one B for the whole horizon
        # (A1RobotControl.cpp:498-514) — block-Toeplitz fast path
        a_qp, b_qp = srb.condense_same_b(a_c, b_d, mpc_dt, cfg.horizon)
    # swing-leg variable elimination: same optimum, no equality rows,
    # kappa ~5e4 -> ~1e3 (see srb.eliminate_swing for the full story).
    # The P/q masking is fused into the cost build (mpc_cost masks the
    # B_qp columns — one P-sized pass cheaper); the bounds are loosened
    # here.
    p_mat, q_vec = srb.mpc_cost(a_qp, b_qp, params.q_weights,
                                params.r_weights, mpc_states, x_ref,
                                cfg.horizon, contacts=cs.contacts)
    a_mat = (srb.friction_constraint_matrix(params.mu_mpc, cfg.horizon,
                                            dtype) if with_a_mat else None)
    lb, ub = srb.mpc_bounds(cs.contacts, params.fz_min, params.fz_max,
                            cfg.horizon, dtype)
    s_var = jnp.tile(jnp.repeat(cs.contacts, 3), cfg.horizon)    # (120,)
    s_row = jnp.tile(jnp.repeat(cs.contacts, 5), cfg.horizon)    # (200,)
    inf = jnp.asarray(jnp.inf, dtype)
    lb = jnp.where(s_row, lb, -inf)
    ub = jnp.where(s_row, ub, inf)

    # warm start with cross-tick rho carry — the deterministic equivalent
    # of the reference's persistent warm-started OSQP instance
    # (A1RobotControl.cpp:522-540)
    warm_x = jnp.where(mem.mpc_warm_started, mem.mpc_warm_x,
                       jnp.zeros_like(mem.mpc_warm_x))
    warm_y = jnp.where(mem.mpc_warm_started, mem.mpc_warm_y,
                       jnp.zeros_like(mem.mpc_warm_y))
    if cfg.mpc_warm_extrapolate > 0.0:
        # linear warm-start extrapolation (round 5): the optimum's
        # near-flat internal-force component drifts several N per tick
        # — faster than a fixed 25-iteration budget can track from last
        # tick's point (the golden-tail drift, probe_golden_tail.py).
        # Predict it one tick ahead from the last inter-tick delta;
        # flips are excluded (delta zeroed in mpc_apply_solution, and
        # the flip warm-start policy below overrides anyway).
        g = jnp.asarray(cfg.mpc_warm_extrapolate, dtype)
        warm_x = warm_x + g * mem.mpc_warm_dx
        warm_y = warm_y + g * mem.mpc_warm_dy
    rho0 = jnp.where(mem.mpc_warm_started, mem.mpc_rho,
                     jnp.asarray(_MPC_RHO0, dtype))
    # flipped legs' carried primal/duals refer to the other contact
    # configuration — zero them (unchanged legs keep theirs), mask the
    # warm start onto the current stance support, and re-seed the
    # stepsize: the carried rho is tuned for the previous active set
    # and was measured to stall the flip-tick solve when kept. With the
    # swing elimination above this is enough — no physics rescaling of
    # the surviving legs was measurably better (exp, round 3).
    leg_flip = cs.contacts != mem.mpc_prev_contacts      # (4,)
    var_keep = jnp.tile(jnp.repeat(~leg_flip, 3), cfg.horizon)
    row_keep = jnp.tile(jnp.repeat(~leg_flip, 5), cfg.horizon)
    wx = warm_x.reshape(cfg.horizon, NUM_LEG, 3)
    fz_before = jnp.sum(wx[:, :, 2] * mem.mpc_prev_contacts[None, :],
                        axis=1)                          # (H,)
    warm_x = jnp.where(var_keep & s_var, warm_x, 0.0)
    warm_y = jnp.where(row_keep & s_row, warm_y, 0.0)
    # preserve total vertical support per horizon step: when a stance
    # pair lifts off, the surviving legs must carry DOUBLE the load —
    # starting them at the old half-load leaves a large primal gap the
    # fixed budget cannot close (17 N at a captured exit flip, < 3 N
    # with the rescale)
    wx2 = warm_x.reshape(cfg.horizon, NUM_LEG, 3)
    fz_after = jnp.sum(wx2[:, :, 2], axis=1)
    scale = jnp.clip(fz_before / jnp.maximum(fz_after, 1.0), 1.0, 4.0)
    scale = jnp.where(jnp.any(leg_flip), scale, 1.0)
    warm_x = (wx2 * scale[:, None, None]).reshape(-1)
    rho0 = jnp.where(jnp.any(leg_flip),
                     jnp.asarray(_MPC_RHO0, dtype), rho0)
    flipped = jnp.any(leg_flip) & mem.mpc_warm_started
    # rescue window: dense for the first 4 post-flip ticks, then strided
    # out to cfg.mpc_cooldown_ticks (see config for the round-5 golden-
    # tail rationale). cooldown counts DOWN from mpc_cooldown_ticks.
    cd = mem.mpc_flip_cooldown
    dense = cd > max(0, cfg.mpc_cooldown_ticks - cfg.mpc_cooldown_dense)
    if cfg.mpc_cooldown_stride > 1:
        strided = (cd > 0) & (
            (mem.tick % cfg.mpc_cooldown_stride) == 0)
    else:
        strided = cd > 0
    rescue_flag = flipped | dense | strided
    if cfg.mpc_drift_rescue_n > 0.0:
        # drift-predictive trigger: last tick's first-step force slew
        # (mem.mpc_warm_dx is zeroed at flips / cold starts)
        slew = jnp.max(jnp.abs(mem.mpc_warm_dx[:12]))
        rescue_flag = rescue_flag | (
            (slew > cfg.mpc_drift_rescue_n) & mem.mpc_warm_started)
    if cfg.mpc_solver_mode != "fixed":
        # adaptive mode: COLD restart on flip ticks. Measured (round 4,
        # dense per-tick golden sampling): the masked+rescaled warm
        # start can satisfy the relative tolerances ~5 N from the
        # optimum at a flip, while a cold solve of the same instance
        # converges to ~0.2 N in ~100 adaptive iterations — the
        # early-exit while_loop absorbs the extra iterations only on
        # the flip tick. (The fixed-budget mode keeps the rescaled warm
        # start — 25 cold iterations are NOT enough — and closes flips
        # with the rescue pass instead.)
        warm_x = jnp.where(flipped, 0.0, warm_x)
        warm_y = jnp.where(flipped, 0.0, warm_y)
    return MpcProblem(p_mat=p_mat, q_vec=q_vec, a_mat=a_mat, lb=lb, ub=ub,
                      warm_x=warm_x, warm_y=warm_y, rho0=rho0,
                      flipped=flipped, rescue_flag=rescue_flag)


def mpc_apply_solution(cfg: A1Config, cs: CtrlState, mem: CtrlMem,
                       sol) -> Tuple[CtrlState, CtrlMem]:
    """Store warm-start state and map the solved world-frame forces into
    body frame with the per-leg NaN guard (A1RobotControl.cpp:555-561)."""
    # carry the post-solve rho estimate into the next tick, CLAMPED to
    # the healthy band of the cost-normalized family: after a tightly
    # converged solve the residual ratio in the estimate is pure noise,
    # and the unconditional carry was measured to random-walk rho down
    # to ~1e-6 — the next disturbed tick then cannot restore primal
    # feasibility within a fixed budget (rp ~ 4 N with rd ~ 1e-6)
    rho_carry = jnp.clip(sol.rho, 0.1 * _MPC_RHO0, 100.0 * _MPC_RHO0)
    # gate on warm_started like mpc_problem's flip detection: the init
    # prev_contacts are all-ones, so the first real tick would
    # otherwise spuriously arm the cooldown
    flipped_now = (jnp.any(cs.contacts != mem.mpc_prev_contacts)
                   & mem.mpc_warm_started)
    cooldown = jnp.where(flipped_now,
                         jnp.int32(max(cfg.mpc_cooldown_ticks,
                                       FLIP_COOLDOWN_TICKS)),
                         jnp.maximum(mem.mpc_flip_cooldown - 1, 0))
    # inter-tick solution delta for warm-start extrapolation: valid only
    # between two same-contact-configuration solves from a warm start
    ok_delta = mem.mpc_warm_started & ~flipped_now
    mem = mem.replace(mpc_warm_x=sol.x, mpc_warm_y=sol.y,
                      mpc_warm_dx=jnp.where(ok_delta,
                                            sol.x - mem.mpc_warm_x, 0.0),
                      mpc_warm_dy=jnp.where(ok_delta,
                                            sol.y - mem.mpc_warm_y, 0.0),
                      mpc_rho=rho_carry,
                      mpc_warm_started=jnp.asarray(True),
                      mpc_prev_contacts=cs.contacts,
                      mpc_flip_cooldown=cooldown)
    forces_world = sol.x[:12].reshape(NUM_LEG, 3)
    forces_body = jnp.einsum("ba,lb->la", cs.root_rot_mat, forces_world)
    bad = jnp.isnan(jnp.sum(forces_body, axis=1))
    forces_body = jnp.where(bad[:, None], cs.foot_forces_grf, forces_body)
    return cs.replace(foot_forces_grf=forces_body), mem
