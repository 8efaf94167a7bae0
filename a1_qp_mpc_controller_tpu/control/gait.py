"""Gait phase machine + Raibert-heuristic foothold planner.

Functional re-design of ``A1RobotControl::update_plan``
(A1RobotControl.cpp:148-202): per-leg phase counters advance modulo one gait
cycle; the first half is stance, the second swing; foothold targets come from
the Raibert heuristic with per-axis clamps. All branches become masked
arithmetic so the function vmaps over a scenario batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    A1Config, FOOT_DELTA_X_LIMIT, FOOT_DELTA_Y_LIMIT, GRAVITY, RobotParams,
)
from a1_qp_mpc_controller_tpu.types import CtrlState, trot_gait_counter_reset


def update_plan(cfg: A1Config, params: RobotParams, cs: CtrlState,
                dt: jnp.ndarray) -> CtrlState:
    dtype = cs.gait_counter.dtype
    walking = cs.movement_mode == 1

    # phase counters (A1RobotControl.cpp:150-165)
    advanced = jnp.mod(cs.gait_counter + params.gait_counter_speed,
                       cfg.counter_per_gait)
    gait_counter = jnp.where(walking, advanced,
                             trot_gait_counter_reset(dtype))
    plan_contacts = jnp.where(walking,
                              gait_counter <= cfg.counter_per_swing,
                              jnp.ones(4, bool))

    # Raibert heuristic (A1RobotControl.cpp:168-201)
    lin_vel_rel = cs.root_rot_mat_z.T @ cs.root_lin_vel
    k_cap = jnp.sqrt(jnp.abs(params.default_foot_pos[0, 2]) / GRAVITY)
    swing_time = (cfg.counter_per_swing / params.gait_counter_speed
                  ) * cfg.control_dt  # (4,)
    delta_xy = (k_cap * (lin_vel_rel[:2] - cs.root_lin_vel_d[:2])[None, :]
                + 0.5 * swing_time[:, None] * cs.root_lin_vel_d[None, :2])
    limits = jnp.array([FOOT_DELTA_X_LIMIT, FOOT_DELTA_Y_LIMIT], dtype)
    delta_xy = jnp.clip(delta_xy, -limits, limits)

    target_rel = params.default_foot_pos.at[:, :2].add(delta_xy)
    target_abs = jnp.einsum("ab,lb->la", cs.root_rot_mat, target_rel)
    target_world = target_abs + cs.root_pos[None, :]

    return cs.replace(
        counter=cs.counter + 1,
        gait_counter=gait_counter,
        plan_contacts=plan_contacts,
        foot_pos_target_rel=target_rel,
        foot_pos_target_abs=target_abs,
        foot_pos_target_world=target_world,
    )
