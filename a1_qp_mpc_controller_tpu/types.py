"""Core state pytrees.

The reference keeps all controller state in one ~90-field mutable blackboard
(``A1CtrlStates.h``) shared lock-free across threads and ROS callbacks. Here
the same information is an immutable pytree threaded through pure functions —
races are eliminated by construction, and the whole controller state vmaps
over a scenario batch.

All per-foot arrays are ``(4, 3)`` = (leg, xyz), leg order FL, FR, RL, RR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import (
    NUM_LEG, NUM_DOF, MPC_STATE_DIM, PLAN_HORIZON, A1Config, RobotParams,
    IMU_FILTER_WINDOW, RECENT_CONTACT_FILTER_WINDOW, TERRAIN_FILTER_WINDOW,
)
from a1_qp_mpc_controller_tpu.utils.filters import (
    WindowFilter, make_filter, make_filter_bank,
)


class SensorData(struct.PyTreeNode):
    """Raw per-tick sensor snapshot (what the ROS callbacks / UDP receive
    thread ingest in the reference, GazeboA1ROS.cpp:235-381)."""

    root_quat: jnp.ndarray      # (4,) w,x,y,z body orientation
    root_pos: jnp.ndarray       # (3,) ground-truth / estimated position feed
    root_lin_vel: jnp.ndarray   # (3,) world-frame linear velocity feed
    imu_acc: jnp.ndarray        # (3,) body-frame accelerometer
    imu_ang_vel: jnp.ndarray    # (3,) body-frame gyro
    joint_pos: jnp.ndarray      # (12,)
    joint_vel: jnp.ndarray      # (12,)
    foot_force: jnp.ndarray     # (4,) contact sensor normal force

    @classmethod
    def zeros(cls, dtype=jnp.float32) -> "SensorData":
        z = lambda *s: jnp.zeros(s, dtype)
        return cls(
            root_quat=jnp.array([1.0, 0, 0, 0], dtype),
            root_pos=z(3), root_lin_vel=z(3), imu_acc=z(3), imu_ang_vel=z(3),
            joint_pos=z(12), joint_vel=z(12), foot_force=z(4),
        )


class JoyCmd(struct.PyTreeNode):
    """Joystick command (axes already mapped to physical units, clamped by the
    adapter — GazeboA1ROS.cpp:383-409)."""

    velx: jnp.ndarray        # () m/s desired body-frame forward velocity
    vely: jnp.ndarray        # ()
    velz: jnp.ndarray        # () body height rate
    roll_rate: jnp.ndarray   # ()
    pitch_rate: jnp.ndarray  # ()
    yaw_rate: jnp.ndarray    # ()
    ctrl_state: jnp.ndarray  # () int32: 0 stand, 1 walk
    exit: jnp.ndarray        # () bool kill switch

    @classmethod
    def zeros(cls, dtype=jnp.float32) -> "JoyCmd":
        s = lambda v=0.0: jnp.asarray(v, dtype)
        return cls(velx=s(), vely=s(), velz=s(), roll_rate=s(), pitch_rate=s(),
                   yaw_rate=s(), ctrl_state=jnp.int32(0),
                   exit=jnp.asarray(False))


class CtrlState(struct.PyTreeNode):
    """The functional equivalent of ``A1CtrlStates`` (A1CtrlStates.h:13-447):
    everything the control pipeline reads/writes each tick."""

    # mode / gait (A1CtrlStates.h:329-344)
    movement_mode: jnp.ndarray       # () int32: 0 standstill, 1 walk
    counter: jnp.ndarray             # () int32 tick counter
    gait_counter: jnp.ndarray        # (4,) phase counters in [0, 240)

    # desired root state (A1CtrlStates.h:347-352)
    root_pos_d: jnp.ndarray          # (3,)
    root_euler_d: jnp.ndarray        # (3,)
    root_lin_vel_d: jnp.ndarray      # (3,) body frame
    root_ang_vel_d: jnp.ndarray      # (3,) body frame
    root_lin_vel_d_world: jnp.ndarray  # (3,)

    # actual root state (A1CtrlStates.h:372-379)
    root_pos: jnp.ndarray            # (3,)
    root_quat: jnp.ndarray           # (4,) w,x,y,z
    root_euler: jnp.ndarray          # (3,) roll,pitch,yaw
    root_rot_mat: jnp.ndarray        # (3,3)
    root_rot_mat_z: jnp.ndarray      # (3,3) yaw-only rotation
    root_lin_vel: jnp.ndarray        # (3,) world frame
    root_ang_vel: jnp.ndarray        # (3,) world frame

    # sensors (A1CtrlStates.h:381-388, 436-439)
    imu_acc: jnp.ndarray             # (3,)
    imu_ang_vel: jnp.ndarray         # (3,)
    joint_pos: jnp.ndarray           # (12,)
    joint_vel: jnp.ndarray           # (12,)
    foot_force: jnp.ndarray          # (4,)

    # foot kinematics fan-out (A1CtrlStates.h:393-409); all (4,3)
    foot_pos_rel: jnp.ndarray        # body frame
    foot_pos_abs: jnp.ndarray        # world-aligned, body-centered
    foot_pos_world: jnp.ndarray
    foot_vel_rel: jnp.ndarray
    foot_vel_abs: jnp.ndarray
    foot_vel_world: jnp.ndarray
    j_foot: jnp.ndarray              # (4,3,3) per-leg Jacobians

    # swing plan state (A1CtrlStates.h:393-405)
    foot_pos_target_rel: jnp.ndarray
    foot_pos_target_abs: jnp.ndarray
    foot_pos_target_world: jnp.ndarray
    foot_pos_start: jnp.ndarray
    foot_pos_rel_last_time: jnp.ndarray
    foot_pos_target_last_time: jnp.ndarray
    foot_pos_cur: jnp.ndarray
    foot_pos_recent_contact: jnp.ndarray

    # contact flags (A1CtrlStates.h:411-413, 441)
    contacts: jnp.ndarray            # (4,) bool
    plan_contacts: jnp.ndarray       # (4,) bool
    early_contacts: jnp.ndarray      # (4,) bool
    estimated_contacts: jnp.ndarray  # (4,) bool

    # forces / torques (A1CtrlStates.h:382-383, 434)
    foot_forces_kin: jnp.ndarray     # (4,3) swing PD forces, body frame
    foot_forces_grf: jnp.ndarray     # (4,3) stance GRF, body frame
    joint_torques: jnp.ndarray       # (12,)

    # gains that the FSM mutates at runtime (position locking,
    # GazeboA1ROS.cpp:171-188)
    kp_linear: jnp.ndarray           # (3,)

    # terrain estimation
    terrain_pitch_angle: jnp.ndarray  # ()

    # estimator outputs (A1CtrlStates.h:442-443)
    estimated_root_pos: jnp.ndarray  # (3,)
    estimated_root_vel: jnp.ndarray  # (3,)

    # joystick integration state (lives in the adapter in the reference,
    # GazeboA1ROS.h:121-135)
    joy_body_height: jnp.ndarray     # ()
    joy_ctrl_state: jnp.ndarray      # () int32
    prev_joy_ctrl_state: jnp.ndarray  # () int32

    @classmethod
    def init(cls, cfg: A1Config, params: RobotParams,
             dtype=jnp.float32) -> "CtrlState":
        z = lambda *s: jnp.zeros(s, dtype)
        feet = lambda: z(NUM_LEG, 3)
        flags = lambda v=False: jnp.full((NUM_LEG,), v)
        return cls(
            movement_mode=jnp.int32(0),
            counter=jnp.int32(0),
            gait_counter=trot_gait_counter_reset(dtype),
            root_pos_d=z(3),
            root_euler_d=z(3),
            root_lin_vel_d=z(3),
            root_ang_vel_d=z(3),
            root_lin_vel_d_world=z(3),
            root_pos=z(3),
            root_quat=jnp.array([1.0, 0, 0, 0], dtype),
            root_euler=z(3),
            root_rot_mat=jnp.eye(3, dtype=dtype),
            root_rot_mat_z=jnp.eye(3, dtype=dtype),
            root_lin_vel=z(3),
            root_ang_vel=z(3),
            imu_acc=z(3),
            imu_ang_vel=z(3),
            joint_pos=z(12),
            joint_vel=z(12),
            foot_force=z(4),
            foot_pos_rel=feet(),
            foot_pos_abs=feet(),
            foot_pos_world=feet(),
            foot_vel_rel=feet(),
            foot_vel_abs=feet(),
            foot_vel_world=feet(),
            j_foot=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                    (NUM_LEG, 3, 3)),
            foot_pos_target_rel=feet(),
            foot_pos_target_abs=feet(),
            foot_pos_target_world=feet(),
            foot_pos_start=feet(),
            foot_pos_rel_last_time=feet(),
            foot_pos_target_last_time=feet(),
            foot_pos_cur=feet(),
            foot_pos_recent_contact=feet(),
            contacts=flags(),
            plan_contacts=flags(),
            early_contacts=flags(),
            estimated_contacts=flags(),
            foot_forces_kin=feet(),
            foot_forces_grf=feet(),
            joint_torques=z(12),
            kp_linear=params.kp_linear.astype(dtype),
            terrain_pitch_angle=z(),
            estimated_root_pos=z(3),
            estimated_root_vel=z(3),
            joy_body_height=jnp.full((), 0.3, dtype),  # strong-typed: keeps
            # the tick signature stable (no recompile after the first step)
            joy_ctrl_state=jnp.int32(0),
            prev_joy_ctrl_state=jnp.int32(0),
        )


def trot_gait_counter_reset(dtype=jnp.float32) -> jnp.ndarray:
    """Trot phase offsets (A1CtrlStates.h:322-326): FL/RR in phase, FR/RL
    half a gait ahead."""
    return jnp.array([0.0, 120.0, 120.0, 0.0], dtype)


class EKFState(struct.PyTreeNode):
    """Kalman filter carry (A1BasicEKF.h:36-39): 18-dim mean (body pos, body
    vel, 4x foot pos) + covariance."""

    x: jnp.ndarray            # (18,)
    P: jnp.ndarray            # (18,18)
    initialized: jnp.ndarray  # () bool — reference lazily inits on first tick


class CtrlMem(struct.PyTreeNode):
    """Controller-internal persistent memory that is NOT part of the
    blackboard in the reference: moving-window filters owned by
    A1RobotControl / the adapters, the OSQP warm-start vectors, the
    MPC tick counter, and the EKF carry."""

    terrain_angle_filter: WindowFilter          # window 100, scalar
    recent_contact_filter: WindowFilter         # 4 independent (3,)-channel
    #                                             filters, window 60
    imu_acc_filter: WindowFilter                # window 5, (3,)
    imu_gyro_filter: WindowFilter               # window 5, (3,)
    mpc_warm_x: jnp.ndarray                     # (120,) primal warm start
    mpc_warm_y: jnp.ndarray                     # (200,) dual warm start
    mpc_warm_dx: jnp.ndarray                    # (120,) last inter-tick
    #   solution delta, for linear warm-start extrapolation
    #   (cfg.mpc_warm_extrapolate); zeroed at flips
    mpc_warm_dy: jnp.ndarray                    # (200,) dual delta
    mpc_rho: jnp.ndarray                        # () carried ADMM stepsize
    mpc_warm_started: jnp.ndarray               # () bool
    mpc_prev_contacts: jnp.ndarray              # (4,) bool: contact pattern
    #   of the previous solve — a flip invalidates the dual warm start
    mpc_flip_cooldown: jnp.ndarray              # () int32: ticks remaining
    #   in the post-flip rescue window (force deviations decay over ~4
    #   ticks after a flip while the relative tolerance reports
    #   converged — measured round 4; the rescue pass stays armed)
    qp_warm_x: jnp.ndarray                      # (12,) stand-QP warm start
    qp_warm_y: jnp.ndarray                      # (20,) (fixed mode only —
    #   adaptive keeps the reference's fresh-solver-per-tick semantics,
    #   A1RobotControl.cpp:416-431)
    qp_prev_contacts: jnp.ndarray               # (4,) bool
    qp_rho: jnp.ndarray                         # () carried stand-QP rho
    mpc_scaling_table: "object"                 # ops.qp.Scaling with a
    #   leading (16,) per-contact-pattern axis (srb.
    #   reference_mpc_scaling_table); select with
    #   grf.scaling_for_contacts(table, contacts)
    tick: jnp.ndarray                           # () int32 (mpc_init_counter)
    ekf: EKFState

    @classmethod
    def init(cls, cfg: A1Config, params: "RobotParams | None" = None,
             dtype=jnp.float32) -> "CtrlMem":
        from a1_qp_mpc_controller_tpu.ops.qp import Scaling
        nv = NUM_DOF * cfg.horizon
        nc = 5 * NUM_LEG * cfg.horizon
        if params is not None and cfg.stance_leg_control_type == 1:
            from a1_qp_mpc_controller_tpu.models.srb import (
                reference_mpc_scaling_table,
            )
            scaling = reference_mpc_scaling_table(params, cfg.horizon,
                                                  dtype)
        else:
            scaling = jax.tree_util.tree_map(
                lambda t: jnp.broadcast_to(t, (16,) + t.shape),
                Scaling.identity(nv, nc, dtype))
        return cls(
            mpc_scaling_table=scaling,
            terrain_angle_filter=make_filter((), TERRAIN_FILTER_WINDOW, dtype),
            recent_contact_filter=make_filter_bank(
                NUM_LEG, (3,), RECENT_CONTACT_FILTER_WINDOW, dtype),
            imu_acc_filter=make_filter((3,), IMU_FILTER_WINDOW, dtype),
            imu_gyro_filter=make_filter((3,), IMU_FILTER_WINDOW, dtype),
            mpc_warm_x=jnp.zeros((nv,), dtype),
            mpc_warm_y=jnp.zeros((nc,), dtype),
            mpc_warm_dx=jnp.zeros((nv,), dtype),
            mpc_warm_dy=jnp.zeros((nc,), dtype),
            qp_warm_x=jnp.zeros((NUM_DOF,), dtype),
            qp_warm_y=jnp.zeros((5 * NUM_LEG,), dtype),
            qp_prev_contacts=jnp.ones((NUM_LEG,), bool),
            qp_rho=jnp.asarray(0.1, dtype),
            mpc_rho=jnp.asarray(1e-4, dtype),
            mpc_warm_started=jnp.asarray(False),
            mpc_prev_contacts=jnp.ones((NUM_LEG,), bool),
            mpc_flip_cooldown=jnp.int32(0),
            tick=jnp.int32(0),
            ekf=EKFState(x=jnp.zeros((18,), dtype),
                         P=3.0 * jnp.eye(18, dtype=dtype),
                         initialized=jnp.asarray(False)),
        )
