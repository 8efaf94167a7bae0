"""Joystick-command semantics + stand/walk mode FSM.

Functional re-design of the adapter-level logic in
``GazeboA1ROS::main_update`` (GazeboA1ROS.cpp:117-188): body-height
integration with clamps, desired-velocity/attitude mapping, the stand<->walk
mode machine, and xy position locking.
"""

from __future__ import annotations

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    A1Config, JOY_CMD_BODY_HEIGHT_MAX, JOY_CMD_BODY_HEIGHT_MIN, RobotParams,
)
from a1_qp_mpc_controller_tpu.types import CtrlState, JoyCmd


def joystick_update(cfg: A1Config, params: RobotParams, cs: CtrlState,
                    joy: JoyCmd, dt: jnp.ndarray) -> CtrlState:
    dtype = cs.root_pos.dtype

    # body height integration (GazeboA1ROS.cpp:124-130)
    height = jnp.clip(cs.joy_body_height + joy.velz * dt,
                      JOY_CMD_BODY_HEIGHT_MIN, JOY_CMD_BODY_HEIGHT_MAX)

    prev_state = cs.joy_ctrl_state
    ctrl_state = joy.ctrl_state.astype(jnp.int32)

    root_lin_vel_d = jnp.stack([joy.velx, joy.vely, joy.velz]).astype(dtype)
    root_ang_vel_d = jnp.stack([joy.roll_rate, joy.pitch_rate,
                                joy.yaw_rate]).astype(dtype)
    root_euler_d = cs.root_euler_d + root_ang_vel_d * dt
    root_pos_d = cs.root_pos_d.at[2].set(height)

    # kill switch (reference: joystick LB -> thread exit + ros::shutdown,
    # GazeboA1ROS.cpp:405-408; here: latch standstill + zero velocity)
    walking = (ctrl_state == 1) & (~joy.exit)
    leaving_walk = (~walking) & (prev_state == 1)
    movement_mode = jnp.where(walking, 1, 0).astype(jnp.int32)
    root_lin_vel_d = jnp.where(joy.exit, 0.0, root_lin_vel_d)
    root_ang_vel_d = jnp.where(joy.exit, 0.0, root_ang_vel_d)

    # position locking (GazeboA1ROS.cpp:167-188)
    lock_gains = params.kp_linear_lock_xy.astype(dtype)
    has_vel_cmd = jnp.linalg.norm(root_lin_vel_d[:2]) > 0.05
    kp_xy = cs.kp_linear[:2]
    pos_xy = root_pos_d[:2]
    # leaving walk: lock current position once
    pos_xy = jnp.where(leaving_walk, cs.root_pos[:2], pos_xy)
    kp_xy = jnp.where(leaving_walk, lock_gains, kp_xy)
    # walking with a velocity command: chase current position, zero xy gains
    chase = walking & has_vel_cmd
    pos_xy = jnp.where(chase, cs.root_pos[:2], pos_xy)
    kp_xy = jnp.where(chase, jnp.zeros(2, dtype), kp_xy)
    # walking without velocity command: hold with lock gains
    hold = walking & (~has_vel_cmd)
    kp_xy = jnp.where(hold, lock_gains, kp_xy)

    return cs.replace(
        joy_body_height=height,
        joy_ctrl_state=ctrl_state,
        prev_joy_ctrl_state=prev_state,
        movement_mode=movement_mode,
        root_lin_vel_d=root_lin_vel_d,
        root_ang_vel_d=root_ang_vel_d,
        root_euler_d=root_euler_d,
        root_pos_d=root_pos_d.at[:2].set(pos_xy),
        kp_linear=cs.kp_linear.at[:2].set(kp_xy),
    )
