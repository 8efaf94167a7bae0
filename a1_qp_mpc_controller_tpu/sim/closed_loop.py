"""Closed-loop rollout: controller + plant under ``lax.scan``.

Replaces the reference's Gazebo-in-the-loop validation workflow
(README.md:160-187) with a fully on-device scan that jits, vmaps over
scenario batches, and shards over a device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.control.controller import control_tick
from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState, JoyCmd


class LoopCarry(struct.PyTreeNode):
    cs: CtrlState
    mem: CtrlMem
    ps: plant_mod.PlantState          # or joint_plant.JointPlantState
    prev_root_lin_vel: jnp.ndarray


class Trace(struct.PyTreeNode):
    """Per-tick telemetry captured by the rollout."""

    root_pos: jnp.ndarray          # (T,3) true body position
    root_euler_est: jnp.ndarray    # (T,3) controller's view
    est_root_pos: jnp.ndarray      # (T,3) estimator output
    foot_forces_grf: jnp.ndarray   # (T,4,3) commanded GRFs (body frame)
    joint_torques: jnp.ndarray     # (T,12)
    contacts: jnp.ndarray          # (T,4)
    foot_force_sensor: jnp.ndarray  # (T,4)
    root_lin_vel: jnp.ndarray      # (T,3) true body velocity
    # per-foot swing tracking (the reference publishes swing start/end/
    # path markers + foot-pose error topics, A1RobotControl.cpp:65-144,
    # A1RobotControl.h:83-96) — yaw-aligned body frame
    swing_target: jnp.ndarray      # (T,4,3) Bezier target this tick
    swing_actual: jnp.ndarray      # (T,4,3) actual foot position
    swing_err: jnp.ndarray         # (T,4) per-foot |target - actual|


def make_standing_start(cfg: A1Config, params: RobotParams,
                        terrain: terrain_mod.Terrain,
                        height: float = 0.3,
                        plant=plant_mod) -> LoopCarry:
    """``plant`` selects the physics backend: ``sim.plant`` (SRB +
    massless legs, default) or ``sim.joint_plant`` (18-DoF articulated)."""
    ps = plant.init_standing(params, terrain, height)
    cs = CtrlState.init(cfg, params)
    # seed the controller's root state with the true pose so the first ticks
    # (before the EKF converges) are sane
    cs = cs.replace(root_pos=ps.root_pos,
                    joy_body_height=jnp.full((), height, jnp.float32))
    mem = CtrlMem.init(cfg, params)
    return LoopCarry(cs=cs, mem=mem, ps=ps,
                     prev_root_lin_vel=ps.root_lin_vel)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "substeps", "plant"))
def rollout(cfg: A1Config, params: RobotParams,
            terrain: terrain_mod.Terrain, carry: LoopCarry,
            joy_seq: JoyCmd, n_steps: int,
            substeps: int = 5, plant=plant_mod) -> Tuple[LoopCarry, Trace]:
    """Run ``n_steps`` control periods. ``joy_seq`` fields have leading (T,)
    axis (scanned) — build with :func:`joy_schedule`. ``plant`` selects the
    physics backend module (must match the carry's plant state)."""
    dt = jnp.asarray(cfg.control_dt, jnp.float32)

    def body(c: LoopCarry, joy: JoyCmd):
        sensors = plant.read_sensors(params, c.ps,
                                     c.prev_root_lin_vel, dt)
        cs, mem, torques = control_tick(cfg, params, c.cs, c.mem, sensors,
                                        joy, dt)
        prev_vel = c.ps.root_lin_vel
        ps = plant.plant_step(params, terrain, c.ps, torques, dt,
                              substeps)
        trace = Trace(
            root_pos=ps.root_pos,
            root_euler_est=cs.root_euler,
            est_root_pos=cs.estimated_root_pos,
            foot_forces_grf=cs.foot_forces_grf,
            joint_torques=torques,
            contacts=cs.contacts,
            foot_force_sensor=ps.foot_force_n,
            root_lin_vel=ps.root_lin_vel,
            swing_target=cs.foot_pos_target_last_time,
            swing_actual=cs.foot_pos_cur,
            swing_err=jnp.linalg.norm(
                cs.foot_pos_target_last_time - cs.foot_pos_cur, axis=-1),
        )
        return LoopCarry(cs=cs, mem=mem, ps=ps,
                         prev_root_lin_vel=prev_vel), trace

    return jax.lax.scan(body, carry, joy_seq)


def joy_schedule(n_steps: int, *, walk_after: Optional[int] = None,
                 velx: float = 0.0, vely: float = 0.0, yaw_rate: float = 0.0,
                 dtype=jnp.float32) -> JoyCmd:
    """Build a (T,)-leading JoyCmd sequence: stand until ``walk_after``,
    then walk with the given velocity command."""
    t = jnp.arange(n_steps)
    if walk_after is None:
        walking = jnp.zeros(n_steps, bool)
    else:
        walking = t >= walk_after
    z = jnp.zeros(n_steps, dtype)
    w = walking.astype(dtype)
    return JoyCmd(
        velx=w * velx, vely=w * vely, velz=z,
        roll_rate=z, pitch_rate=z, yaw_rate=w * yaw_rate,
        ctrl_state=walking.astype(jnp.int32),
        exit=jnp.zeros(n_steps, bool),
    )
