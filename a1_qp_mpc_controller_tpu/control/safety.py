"""Command safety filters: the functional equivalent of the Unitree SDK's
``Safety::PositionLimit`` and ``Safety::PowerProtect`` the reference applies
before every hardware send (HardwareA1ROS.cpp:194-197), plus the joint
reordering used on the hardware wire.

All filters are pure and vmappable; they run as the last stage before
torques leave the controller.
"""

from __future__ import annotations

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import NUM_LEG

# A1 joint limits (radians), per leg [hip, thigh, calf] — from the A1 URDF
JOINT_POS_MIN = jnp.tile(jnp.array([-0.802, -1.05, -2.70]), NUM_LEG)
JOINT_POS_MAX = jnp.tile(jnp.array([0.802, 4.19, -0.916]), NUM_LEG)
# actuator torque limit (N m)
TORQUE_LIMIT = 33.5
# soft margin (rad) over which the position guard ramps in
POSITION_GUARD_MARGIN = 0.05

# hardware wire order swaps the front pairs: FR,FL,RR,RL <-> FL,FR,RL,RR
# (HardwareA1ROS.cpp:78-79: swap_joint_indices 3,4,5,0,1,2,9,10,11,6,7,8)
SWAP_JOINT_INDICES = jnp.array([3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8])


def reorder_for_wire(x: jnp.ndarray) -> jnp.ndarray:
    """Controller (FL,FR,RL,RR) -> wire (FR,FL,RR,RL) order; involution."""
    return x[..., SWAP_JOINT_INDICES]


def torque_limit(tau: jnp.ndarray,
                 limit: float = TORQUE_LIMIT) -> jnp.ndarray:
    return jnp.clip(tau, -limit, limit)


def position_limit(tau: jnp.ndarray, joint_pos: jnp.ndarray,
                   margin: float = POSITION_GUARD_MARGIN) -> jnp.ndarray:
    """Ramp torque that drives a joint further past its limit down to zero
    (the torque-mode analog of Safety::PositionLimit, which clamps position
    commands)."""
    over_max = jnp.clip((joint_pos - (JOINT_POS_MAX - margin)) / margin,
                        0.0, 1.0)
    under_min = jnp.clip(((JOINT_POS_MIN + margin) - joint_pos) / margin,
                         0.0, 1.0)
    # scale positive torque near the max limit, negative near the min
    scale_pos = 1.0 - over_max
    scale_neg = 1.0 - under_min
    return jnp.where(tau > 0, tau * scale_pos, tau * scale_neg)


def power_protect(tau: jnp.ndarray, joint_vel: jnp.ndarray,
                  power_level: int = 5) -> jnp.ndarray:
    """Scale the whole torque vector down when estimated mechanical power
    exceeds the level budget (level 1-10, 10 = full power; budget ramps
    linearly to ~1 kW at level 10).

    HONESTY NOTE: this is an INVENTED torque-mode analog of the SDK's
    ``Safety::PowerProtect`` (the reference calls it with a configurable
    power_level, HardwareA1ROS.cpp:194-196). The SDK's actual semantics
    (per-motor current/temperature model inside the closed-source
    library) are not published; the linear ~100 W/level whole-body
    mechanical-power budget here is a plausible stand-in, validated only
    in simulation — recalibrate against the real SDK before any
    hardware deployment."""
    level = jnp.clip(power_level, 1, 10)
    budget = 100.0 * level  # watts
    power = jnp.sum(jnp.abs(tau * joint_vel))
    scale = jnp.minimum(1.0, budget / jnp.maximum(power, 1e-6))
    return tau * scale


def apply_all(tau: jnp.ndarray, joint_pos: jnp.ndarray,
              joint_vel: jnp.ndarray, power_level: int = 5) -> jnp.ndarray:
    tau = torque_limit(tau)
    tau = position_limit(tau, joint_pos)
    tau = power_protect(tau, joint_vel, power_level)
    return tau
