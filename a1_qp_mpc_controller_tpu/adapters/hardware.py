"""Hardware adapter: Unitree SDK LowState/LowCmd wire format.

Parity with HardwareA1ROS (HardwareA1ROS.{h,cpp}):

- the wire orders legs FR,FL,RR,RL; the controller orders FL,FR,RL,RR.
  Joints swap via (3,4,5,0,1,2,9,10,11,6,7,8) and feet via (1,0,3,2)
  (HardwareA1ROS.cpp:78-79) — both are involutions, so the same mapping
  serves ingest and egress;
- foot forces are smoothed with a per-foot 5-sample ring-buffer average
  (FOOT_FILTER_WINDOW_SIZE, HardwareA1ROS.h:42, HardwareA1ROS.cpp:293-304);
- root position/velocity are never filled from the wire
  (HardwareA1ROS.cpp:272-273) — the EKF estimates them (in the reference
  the EKF runs inside this 500 Hz receive path, HardwareA1ROS.cpp:336-341;
  here `runtime.realtime` provides the same dual-rate schedule);
- egress: LOWLEVEL LowCmd, servo mode 0x0A, position/velocity control shut
  off (PosStopF/VelStopF), torque-only, reordered to wire order, then the
  PositionLimit/PowerProtect safety filters (HardwareA1ROS.cpp:177-197) —
  our torque-mode analogs live in control/safety.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.control import safety
from a1_qp_mpc_controller_tpu.types import SensorData
from a1_qp_mpc_controller_tpu.utils.filters import (
    WindowFilter, filter_update, make_filter,
)

# wire <-> controller index maps (involutions), HardwareA1ROS.cpp:78-79
SWAP_JOINT_INDICES = safety.SWAP_JOINT_INDICES
SWAP_FOOT_INDICES = jnp.array([1, 0, 3, 2])

FOOT_FILTER_WINDOW_SIZE = 5   # HardwareA1ROS.h:42

MOTOR_MODE_SERVO = 0x0A
POS_STOP_F = 2.146e9          # UNITREE_LEGGED_SDK::PosStopF
VEL_STOP_F = 16000.0          # UNITREE_LEGGED_SDK::VelStopF


class LowState(struct.PyTreeNode):
    """The subset of UNITREE_LEGGED_SDK::LowState the reference reads
    (HardwareA1ROS.cpp:262-305). Arrays are in WIRE order."""

    imu_quat: jnp.ndarray       # (4,) w,x,y,z
    imu_gyro: jnp.ndarray       # (3,)
    imu_acc: jnp.ndarray        # (3,)
    motor_q: jnp.ndarray        # (12,) wire order
    motor_dq: jnp.ndarray       # (12,) wire order
    foot_force: jnp.ndarray     # (4,) wire order


def make_foot_force_filter(dtype=jnp.float32) -> WindowFilter:
    """Per-foot 5-sample moving average (HardwareA1ROS.cpp:293-304).
    NOTE the reference divides by the full window size even while the
    ring is still filling; `filter_update` divides by the sample count —
    the steady-state behavior (after 5 frames, ~10 ms) is identical."""
    return make_filter((4,), FOOT_FILTER_WINDOW_SIZE, dtype)


def ingest(state: LowState, foot_filter: WindowFilter
           ) -> Tuple[SensorData, WindowFilter]:
    """LowState (wire order) -> SensorData (controller order) + updated
    foot-force filter. Mirrors receive_low_state's data path
    (HardwareA1ROS.cpp:262-305) minus the inlined EKF, which the runtime
    schedules explicitly."""
    joint_pos = state.motor_q[SWAP_JOINT_INDICES]
    joint_vel = state.motor_dq[SWAP_JOINT_INDICES]
    raw_force = state.foot_force[SWAP_FOOT_INDICES]
    foot_filter, force_avg = filter_update(foot_filter, raw_force)
    z3 = jnp.zeros(3, state.imu_acc.dtype)
    return SensorData(
        root_quat=state.imu_quat,
        root_pos=z3,              # never filled from the wire
        root_lin_vel=z3,
        imu_acc=state.imu_acc,
        imu_ang_vel=state.imu_gyro,
        joint_pos=joint_pos,
        joint_vel=joint_vel,
        foot_force=force_avg,
    ), foot_filter


class LowCmd(struct.PyTreeNode):
    """The torque-only LOWLEVEL command (HardwareA1ROS.cpp:177-193).
    Arrays are in WIRE order."""

    mode: jnp.ndarray  # (12,) int32, 0x0A servo
    q: jnp.ndarray     # (12,) PosStopF: position control off
    dq: jnp.ndarray    # (12,) VelStopF: velocity control off
    kp: jnp.ndarray    # (12,) zero
    kd: jnp.ndarray    # (12,) zero
    tau: jnp.ndarray   # (12,)


def egress(joint_torques: jnp.ndarray, joint_pos: jnp.ndarray,
           joint_vel: jnp.ndarray, power_level: int = 5) -> LowCmd:
    """Controller torques -> safety-filtered wire-order LowCmd.

    Safety runs in controller order (limits are defined per controller
    joint), then the result is reordered for the wire — equivalent to the
    reference's reorder-then-Safety because the SDK's checks are
    per-joint."""
    tau = safety.apply_all(joint_torques, joint_pos, joint_vel, power_level)
    tau_wire = tau[SWAP_JOINT_INDICES]
    dtype = joint_torques.dtype
    return LowCmd(
        mode=jnp.full((12,), MOTOR_MODE_SERVO, jnp.int32),
        q=jnp.full((12,), POS_STOP_F, dtype),
        dq=jnp.full((12,), VEL_STOP_F, dtype),
        kp=jnp.zeros(12, dtype),
        kd=jnp.zeros(12, dtype),
        tau=tau_wire,
    )
