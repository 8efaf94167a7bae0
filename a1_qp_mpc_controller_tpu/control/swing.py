"""Swing-leg trajectory control + contact resolution.

Functional re-design of ``A1RobotControl::generate_swing_legs_ctrl``
(A1RobotControl.cpp:204-287): Bezier swing targets, finite-difference foot
velocities, per-foot PD forces, early-contact detection, and the
recent-contact moving-window filters.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    A1Config, FOOT_FORCE_LOW, RobotParams,
)
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState
from a1_qp_mpc_controller_tpu.utils.bezier import swing_foot_pos
from a1_qp_mpc_controller_tpu.utils.filters import filter_update_per_leg


def generate_swing_legs_ctrl(cfg: A1Config, params: RobotParams,
                             cs: CtrlState, mem: CtrlMem, dt: jnp.ndarray
                             ) -> Tuple[CtrlState, CtrlMem]:
    dtype = cs.foot_pos_abs.dtype

    # current foot position in the yaw-aligned body frame
    # (A1RobotControl.cpp:224)
    foot_pos_cur = jnp.einsum("ba,lb->la", cs.root_rot_mat_z, cs.foot_pos_abs)

    in_stance_phase = cs.gait_counter <= cfg.counter_per_swing  # (4,)
    spline_time = jnp.where(
        in_stance_phase, jnp.zeros(4, dtype),
        (cs.gait_counter - cfg.counter_per_swing) / cfg.counter_per_swing)
    # stance feet keep refreshing their swing start point
    # (A1RobotControl.cpp:230-232)
    foot_pos_start = jnp.where(in_stance_phase[:, None], foot_pos_cur,
                               cs.foot_pos_start)

    # Bezier target; the reference passes terrain pitch 0.0 here
    # (A1RobotControl.cpp:238-241)
    foot_pos_target = swing_foot_pos(spline_time, foot_pos_start,
                                     cs.foot_pos_target_rel,
                                     jnp.zeros((), dtype))

    # finite-difference velocities (A1RobotControl.cpp:243-247)
    foot_vel_cur = (foot_pos_cur - cs.foot_pos_rel_last_time) / dt
    foot_vel_target = (foot_pos_target - cs.foot_pos_target_last_time) / dt

    pos_err = foot_pos_target - foot_pos_cur
    vel_err = foot_vel_target - foot_vel_cur
    foot_forces_kin = pos_err * params.kp_foot + vel_err * params.kd_foot

    # early contact detection (A1RobotControl.cpp:259-271)
    early = cs.early_contacts
    early = jnp.where(cs.gait_counter <= cfg.counter_per_swing * 1.5,
                      jnp.zeros(4, bool), early)
    hit = ((~cs.plan_contacts)
           & (cs.gait_counter > cfg.counter_per_swing * 1.5)
           & (cs.foot_force > FOOT_FORCE_LOW))
    early = early | hit
    contacts = cs.plan_contacts | early

    # recent-contact position filters, pushed only for contact legs
    # (A1RobotControl.cpp:274-281)
    rc_filter, rc_avg = filter_update_per_leg(
        mem.recent_contact_filter, cs.foot_pos_abs, contacts)
    recent_contact = jnp.where(contacts[:, None], rc_avg,
                               cs.foot_pos_recent_contact)

    cs = cs.replace(
        foot_pos_start=foot_pos_start,
        foot_pos_cur=foot_pos_cur,
        foot_pos_rel_last_time=foot_pos_cur,
        foot_pos_target_last_time=foot_pos_target,
        foot_forces_kin=foot_forces_kin,
        early_contacts=early,
        contacts=contacts,
        foot_pos_recent_contact=recent_contact,
        joint_torques=jnp.zeros(12, dtype),  # cleared like the reference
    )
    return cs, mem.replace(recent_contact_filter=rc_filter)
