"""Top-level control tick: the functional composition of the reference's two
400 Hz threads + async callbacks (SURVEY.md §3).

One jitted, vmappable function runs per control period:

    sensors -> ingest -> joystick/FSM -> gait plan -> swing ctrl
            -> state estimation (EKF) -> GRF solve (QP or MPC)
            -> joint torques

The reference splits this across Thread 1 (compute_grf), Thread 2
(main_update + send_cmd) and a 12-thread callback spinner mutating one
shared blackboard; since both threads run at the same 2.5 ms period
(A1Params.h:10-11), the deterministic serialization below computes the same
quantities once per tick with no races. A dual-rate schedule (separate
``grf_step`` / ``main_step``) is exposed for latency benchmarking.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.control import fsm, gait, grf, swing, torque
from a1_qp_mpc_controller_tpu.control.ingest import ingest_sensors
from a1_qp_mpc_controller_tpu.models import estimator
from a1_qp_mpc_controller_tpu.types import (
    CtrlMem, CtrlState, JoyCmd, SensorData,
)


def control_tick(cfg: A1Config, params: RobotParams, cs: CtrlState,
                 mem: CtrlMem, sensors: SensorData, joy: JoyCmd,
                 dt: jnp.ndarray) -> Tuple[CtrlState, CtrlMem, jnp.ndarray]:
    """Full control step. Returns (state, memory, joint torques (12,))."""
    cs, mem = ingest_sensors(cfg, params, cs, mem, sensors)
    if not cfg.use_estimator:
        # ground-truth root feed (Isaac gt-pose mode, IsaacA1ROS.cpp:189)
        cs = cs.replace(root_pos=sensors.root_pos,
                        root_lin_vel=sensors.root_lin_vel)
    cs = fsm.joystick_update(cfg, params, cs, joy, dt)
    cs = gait.update_plan(cfg, params, cs, dt)
    cs, mem = swing.generate_swing_legs_ctrl(cfg, params, cs, mem, dt)
    if cfg.use_estimator:
        ekf, cs = estimator.step(cfg, params, cs, mem.ekf, dt)
        mem = mem.replace(ekf=ekf)
    cs, mem = grf.compute_grf(cfg, params, cs, mem, dt)
    cs, mem = torque.compute_joint_torques(cfg, params, cs, mem)
    return cs, mem, cs.joint_torques


@partial(jax.jit, static_argnames=("cfg",))
def control_tick_jit(cfg: A1Config, params: RobotParams, cs: CtrlState,
                     mem: CtrlMem, sensors: SensorData, joy: JoyCmd,
                     dt: jnp.ndarray):
    return control_tick(cfg, params, cs, mem, sensors, joy, dt)


# --- split tick (batched-executor decomposition) --------------------------
# The MPC solve's KKT factorization wants to run as ONE batched Pallas
# kernel, which cannot live inside vmap. The split exposes the tick as
# build -> (external solve) -> finish; `parallel.batched_tick` composes
# vmap(build) + pallas-batched solve + vmap(finish). Single-scenario
# semantics are identical to control_tick.

def control_tick_build(cfg: A1Config, params: RobotParams, cs: CtrlState,
                       mem: CtrlMem, sensors: SensorData, joy: JoyCmd,
                       dt: jnp.ndarray, with_a_mat: bool = True):
    """Everything before the MPC solve; returns (cs, mem, MpcProblem).
    MPC profiles only. ``with_a_mat=False`` skips materializing the
    per-scenario constraint matrix (shared-basis solver route)."""
    assert cfg.stance_leg_control_type == 1, "split tick is MPC-only"
    cs, mem = ingest_sensors(cfg, params, cs, mem, sensors)
    if not cfg.use_estimator:
        cs = cs.replace(root_pos=sensors.root_pos,
                        root_lin_vel=sensors.root_lin_vel)
    cs = fsm.joystick_update(cfg, params, cs, joy, dt)
    cs = gait.update_plan(cfg, params, cs, dt)
    cs, mem = swing.generate_swing_legs_ctrl(cfg, params, cs, mem, dt)
    if cfg.use_estimator:
        ekf, cs = estimator.step(cfg, params, cs, mem.ekf, dt)
        mem = mem.replace(ekf=ekf)
    cs, mem = grf.terrain_adaptation(cfg, cs, mem)
    prob = grf.mpc_problem(cfg, params, cs, mem, dt, with_a_mat=with_a_mat)
    return cs, mem, prob


def control_tick_finish(cfg: A1Config, params: RobotParams, cs: CtrlState,
                        mem: CtrlMem, sol):
    """Apply an externally computed MPC solution and map torques."""
    cs, mem = grf.mpc_apply_solution(cfg, cs, mem, sol)
    cs, mem = torque.compute_joint_torques(cfg, params, cs, mem)
    return cs, mem, cs.joint_torques


def control_tick_build_qp(cfg: A1Config, params: RobotParams,
                          cs: CtrlState, mem: CtrlMem,
                          sensors: SensorData, joy: JoyCmd,
                          dt: jnp.ndarray):
    """Everything before the stand-QP solve; returns (cs, mem,
    StandQpProblem). QP profiles only — the stand-QP analog of
    :func:`control_tick_build`, letting batched executors run the
    12-var solve lock-step with a gathered flip rescue."""
    assert cfg.stance_leg_control_type == 0, "build_qp is stand-QP-only"
    cs, mem = ingest_sensors(cfg, params, cs, mem, sensors)
    if not cfg.use_estimator:
        cs = cs.replace(root_pos=sensors.root_pos,
                        root_lin_vel=sensors.root_lin_vel)
    cs = fsm.joystick_update(cfg, params, cs, joy, dt)
    cs = gait.update_plan(cfg, params, cs, dt)
    cs, mem = swing.generate_swing_legs_ctrl(cfg, params, cs, mem, dt)
    if cfg.use_estimator:
        ekf, cs = estimator.step(cfg, params, cs, mem.ekf, dt)
        mem = mem.replace(ekf=ekf)
    prob = grf.stand_qp_problem(cfg, params, cs, mem)
    return cs, mem, prob


def control_tick_finish_qp(cfg: A1Config, params: RobotParams,
                           cs: CtrlState, mem: CtrlMem, sol):
    """Apply an externally computed stand-QP solution and map torques."""
    cs, mem = grf.stand_qp_apply(cfg, cs, mem, sol)
    cs, mem = torque.compute_joint_torques(cfg, params, cs, mem)
    return cs, mem, cs.joint_torques


# --- sensor-rate estimation split (hardware schedule) ---------------------
# The reference's hardware stack runs the EKF inside the 500 Hz UDP
# receive thread (HardwareA1ROS.cpp:336-341, HARDWARE_FEEDBACK_FREQUENCY
# = 2 ms, A1Params.h:12) while control runs at 400 Hz. These two pieces
# reproduce that dual-rate schedule: `estimate_step` at the sensor rate,
# `control_tick_noest` at the control rate consuming the latest estimate.

def estimate_step(cfg: A1Config, params: RobotParams, cs: CtrlState,
                  mem: CtrlMem, sensors: SensorData, dt: jnp.ndarray
                  ) -> Tuple[CtrlState, CtrlMem]:
    """Sensor-rate work (the reference's receive thread): ingest + EKF.
    ``dt`` is the SENSOR period (2 ms on hardware), not the control
    period. Touches only estimation-owned memory (IMU filters + EKF);
    merge with control-owned memory via :func:`merge_estimate_mem`."""
    cs, mem = ingest_sensors(cfg, params, cs, mem, sensors)
    if cfg.use_estimator:
        ekf, cs = estimator.step(cfg, params, cs, mem.ekf, dt)
        mem = mem.replace(ekf=ekf)
    else:
        cs = cs.replace(root_pos=sensors.root_pos,
                        root_lin_vel=sensors.root_lin_vel)
    return cs, mem


def merge_estimate_mem(est_mem: CtrlMem, ctrl_mem: CtrlMem) -> CtrlMem:
    """Combine the estimation thread's memory fields (EKF carry + IMU
    ingest filters) with the control thread's (warm starts, gait/terrain
    filters, tick counter) — the race-free functional replacement for the
    reference's shared-blackboard writes from two threads."""
    return ctrl_mem.replace(ekf=est_mem.ekf,
                            imu_acc_filter=est_mem.imu_acc_filter,
                            imu_gyro_filter=est_mem.imu_gyro_filter)


def merge_estimate_cs(est_cs: CtrlState, ctrl_cs: CtrlState) -> CtrlState:
    """Publish only the estimation-owned CtrlState fields (ingested
    sensors, FK fan-out, EKF root state) into the control thread's
    current state. The reference's receive thread writes exactly these
    blackboard fields (HardwareA1ROS.cpp:245-378); publishing the whole
    snapshot instead would silently discard any control-tick planning
    update (gait counters, FSM state, swing targets) that interleaved
    the estimate — a lost-update race, not mere staleness."""
    return ctrl_cs.replace(
        # ingest_sensors fields
        root_quat=est_cs.root_quat,
        root_rot_mat=est_cs.root_rot_mat,
        root_euler=est_cs.root_euler,
        root_rot_mat_z=est_cs.root_rot_mat_z,
        root_ang_vel=est_cs.root_ang_vel,
        imu_acc=est_cs.imu_acc,
        imu_ang_vel=est_cs.imu_ang_vel,
        joint_pos=est_cs.joint_pos,
        joint_vel=est_cs.joint_vel,
        foot_force=est_cs.foot_force,
        foot_pos_rel=est_cs.foot_pos_rel,
        foot_pos_abs=est_cs.foot_pos_abs,
        foot_pos_world=est_cs.foot_pos_world,
        foot_vel_rel=est_cs.foot_vel_rel,
        foot_vel_abs=est_cs.foot_vel_abs,
        foot_vel_world=est_cs.foot_vel_world,
        j_foot=est_cs.j_foot,
        # estimator.step fields
        estimated_contacts=est_cs.estimated_contacts,
        estimated_root_pos=est_cs.estimated_root_pos,
        estimated_root_vel=est_cs.estimated_root_vel,
        root_pos=est_cs.root_pos,
        root_lin_vel=est_cs.root_lin_vel,
    )


def control_tick_noest(cfg: A1Config, params: RobotParams, cs: CtrlState,
                       mem: CtrlMem, joy: JoyCmd, dt: jnp.ndarray
                       ) -> Tuple[CtrlState, CtrlMem, jnp.ndarray]:
    """Control-rate work when estimation runs at the sensor rate: FSM,
    plan, swing, GRF solve, torques — consuming the freshest
    ingested+estimated ``cs`` (no re-ingest, no EKF)."""
    cs = fsm.joystick_update(cfg, params, cs, joy, dt)
    cs = gait.update_plan(cfg, params, cs, dt)
    cs, mem = swing.generate_swing_legs_ctrl(cfg, params, cs, mem, dt)
    cs, mem = grf.compute_grf(cfg, params, cs, mem, dt)
    cs, mem = torque.compute_joint_torques(cfg, params, cs, mem)
    return cs, mem, cs.joint_torques


estimate_step_jit = partial(jax.jit, static_argnames=("cfg",))(estimate_step)
control_tick_noest_jit = partial(jax.jit,
                                 static_argnames=("cfg",))(control_tick_noest)


# --- dual-rate decomposition (mirrors the reference's thread split) -------

def main_step(cfg: A1Config, params: RobotParams, cs: CtrlState,
              mem: CtrlMem, sensors: SensorData, joy: JoyCmd,
              dt: jnp.ndarray):
    """Thread-2 work: ingest, FSM, plan, swing, estimate, torques
    (MainGazebo.cpp:86-119). Uses the most recent GRF solution in
    ``cs.foot_forces_grf``."""
    cs, mem = ingest_sensors(cfg, params, cs, mem, sensors)
    cs = fsm.joystick_update(cfg, params, cs, joy, dt)
    cs = gait.update_plan(cfg, params, cs, dt)
    cs, mem = swing.generate_swing_legs_ctrl(cfg, params, cs, mem, dt)
    ekf, cs = estimator.step(cfg, params, cs, mem.ekf, dt)
    mem = mem.replace(ekf=ekf)
    cs, mem = torque.compute_joint_torques(cfg, params, cs, mem)
    return cs, mem, cs.joint_torques


def grf_step(cfg: A1Config, params: RobotParams, cs: CtrlState,
             mem: CtrlMem, dt: jnp.ndarray):
    """Thread-1 work: the stance-force solve (MainGazebo.cpp:47-80)."""
    return grf.compute_grf(cfg, params, cs, mem, dt)


main_step_jit = partial(jax.jit, static_argnames=("cfg",))(main_step)
grf_step_jit = partial(jax.jit, static_argnames=("cfg",))(grf_step)
