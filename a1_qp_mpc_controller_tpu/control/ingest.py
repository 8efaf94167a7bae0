"""Sensor ingestion: raw sensor snapshot -> controller state fields.

Functional re-design of the reference's async ROS callbacks / UDP receive
path (GazeboA1ROS.cpp:235-381, HardwareA1ROS.cpp:245-378): quaternion
fan-out, per-leg FK/Jacobian fan-out, IMU moving-average smoothing. Instead
of callbacks mutating a shared blackboard concurrently, ingestion is one
pure function at the top of the tick.

Note the reference's estimation loop: ground-truth odometry supplies only
the *orientation*; root position and linear velocity always come from the
EKF (GazeboA1ROS.cpp:241-247 are commented out in the reference; EKF writes
them back at A1BasicEKF.cpp:159-163). World-frame foot quantities computed
here therefore use the previous tick's estimated root state, exactly like
the reference's callbacks racing the estimator.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.models import kinematics as kin
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState, SensorData
from a1_qp_mpc_controller_tpu.utils import mathx
from a1_qp_mpc_controller_tpu.utils.filters import filter_update


def ingest_sensors(cfg: A1Config, params: RobotParams, cs: CtrlState,
                   mem: CtrlMem, sensors: SensorData
                   ) -> Tuple[CtrlState, CtrlMem]:
    # orientation fan-out (GazeboA1ROS.cpp:256-262)
    quat = sensors.root_quat
    rot = mathx.quat_to_rot(quat)
    euler = mathx.quat_to_euler(quat)
    rot_z = mathx.rot_z(euler[2])

    # IMU smoothing: 5-tap moving averages (GazeboA1ROS.cpp:100-109,284-300)
    acc_f, acc_avg = filter_update(mem.imu_acc_filter, sensors.imu_acc)
    gyro_f, gyro_avg = filter_update(mem.imu_gyro_filter,
                                     sensors.imu_ang_vel)
    root_ang_vel = rot @ gyro_avg  # world frame (GazeboA1ROS.cpp:299)

    # FK fan-out (GazeboA1ROS.cpp:264-281)
    foot_pos_rel, jacs, foot_vel_rel = kin.foot_fanout(
        sensors.joint_pos, sensors.joint_vel, params.rho_opt, params.rho_fix)
    foot_pos_abs = jnp.einsum("ab,lb->la", rot, foot_pos_rel)
    foot_vel_abs = jnp.einsum("ab,lb->la", rot, foot_vel_rel)
    # world frame uses the previous tick's estimated root state
    foot_pos_world = foot_pos_abs + cs.root_pos[None, :]
    foot_vel_world = foot_vel_abs + cs.root_lin_vel[None, :]

    cs = cs.replace(
        root_quat=quat,
        root_rot_mat=rot,
        root_euler=euler,
        root_rot_mat_z=rot_z,
        root_ang_vel=root_ang_vel,
        imu_acc=acc_avg,
        imu_ang_vel=gyro_avg,
        joint_pos=sensors.joint_pos,
        joint_vel=sensors.joint_vel,
        foot_force=sensors.foot_force,
        foot_pos_rel=foot_pos_rel,
        foot_pos_abs=foot_pos_abs,
        foot_pos_world=foot_pos_world,
        foot_vel_rel=foot_vel_rel,
        foot_vel_abs=foot_vel_abs,
        foot_vel_world=foot_vel_world,
        j_foot=jacs,
    )
    return cs, mem.replace(imu_acc_filter=acc_f, imu_gyro_filter=gyro_f)
