"""Force -> joint torque mapping (A1RobotControl::compute_joint_torques,
A1RobotControl.cpp:289-319).

Stance legs: tau = J' (-F_grf). Swing legs: the reference deliberately solves
``J tau = km * F_kin`` (an LU solve, NOT the transpose mapping —
A1RobotControl.cpp:306-307); we preserve that quirk. Plus gravity
feed-forward, per-element NaN guard, and the 10-tick zero-torque warmup.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState
from a1_qp_mpc_controller_tpu.utils import mathx


def compute_joint_torques(cfg: A1Config, params: RobotParams, cs: CtrlState,
                          mem: CtrlMem) -> Tuple[CtrlState, CtrlMem]:
    jacs = cs.j_foot  # (4,3,3)
    stance_tau = jnp.einsum("lba,lb->la", jacs, -cs.foot_forces_grf)
    swing_force = params.km_foot[None, :] * cs.foot_forces_kin
    swing_tau = mathx.solve3(jacs, swing_force)
    tau = jnp.where(cs.contacts[:, None], stance_tau, swing_tau).reshape(12)
    tau = tau + params.torques_gravity

    # NaN guard: keep the cleared (zero) value for NaN entries
    # (A1RobotControl.cpp:314-317)
    tau = jnp.where(jnp.isnan(tau), cs.joint_torques, tau)
    # first ticks: zero torque while filters/solvers warm up
    # (A1RobotControl.cpp:292-295)
    warm = mem.tick < cfg.torque_warmup_ticks
    tau = jnp.where(warm, jnp.zeros_like(tau), tau)
    if cfg.apply_safety:
        # hardware profiles: Safety::PositionLimit/PowerProtect analogs
        # before the command leaves (HardwareA1ROS.cpp:194-197)
        from a1_qp_mpc_controller_tpu.control import safety
        tau = safety.apply_all(tau, cs.joint_pos, cs.joint_vel,
                               cfg.power_level)
    return (cs.replace(joint_torques=tau),
            mem.replace(tick=mem.tick + 1))
