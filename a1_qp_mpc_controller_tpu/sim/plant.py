"""In-framework plant: single-rigid-body trunk + massless legs with virtual
foot masses and constraint-based (pinned) ground contact.

The reference closes its loop against Gazebo (SURVEY.md §4 — there is no
in-repo plant); this module supplies the missing piece so the whole
controller stack can be validated and benchmarked end-to-end on TPU,
batched over thousands of scenarios.

Model:
- Trunk: 6-DoF rigid body (mass + trunk inertia from RobotParams),
  quaternion attitude, semi-implicit Euler at a substep of the control
  period.
- Legs: massless force transmitters. Given joint torques tau, the force the
  leg applies at its foot endpoint is F_app = R J^-T tau (world frame,
  manipulator convention tau = J' F_app); the trunk feels the reaction
  -F_app of every grounded foot.
- Contact is CONSTRAINT-BASED, like Gazebo's ODE solver: a foot that
  touches the terrain while descending becomes pinned (position frozen, no
  penetration, no slip) and stays pinned while the ground normal force
  N_z = -F_app_z + m_f g is non-negative; when the leg actively pulls the
  foot up, the pin releases and the foot flies as a virtual point mass
  under the leg force + gravity. A compliant-spring contact model was
  tried first and rejected: the energy stored in stiff tangential springs
  forms a ~50 Hz yaw resonance across the stance feet that a discrete
  400 Hz controller (with the reference's 5-tap IMU filter lag)
  destabilizes — a failure mode constraint-based engines don't have.
- Sensors: accelerometer reads specific force R'(a - g); gyro reads R' w;
  joint angles via Newton IK from simulated foot positions (warm-started on
  the previous joint state); the foot force sensor reads the ground normal
  force (what Gazebo's contact wrench supplies, GazeboA1ROS.cpp:367-381).

Limitation (v1): pinned contact means infinite friction — stance feet
never slip. The controllers constrain their forces inside the friction
cone anyway; slip physics can be layered on later.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import NUM_LEG, RobotParams
from a1_qp_mpc_controller_tpu.models import kinematics as kin
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import SensorData
from a1_qp_mpc_controller_tpu.utils import mathx

GRAV = jnp.array([0.0, 0.0, -9.81])

FOOT_MASS = 0.3   # virtual foot mass (kg), swing-phase dynamics only
# pin releases when the leg pulls up harder than the foot's weight
RELEASE_FORCE = FOOT_MASS * 9.81

# The controller's SRB model deliberately uses the TRUNK inertia only
# (matching the reference's a1_trunk_inertia); the physical robot's
# rotational inertia is dominated by the four ~1.8 kg legs hanging at
# ~0.15-0.2 m from the COM (about 0.2-0.25 kg m^2 per axis — 5x the
# trunk). Gazebo simulates the full URDF, so the reference controller
# always ran against the larger plant inertia; without it the discrete
# 400 Hz attitude-rate loops (e.g. kd_yaw*dt/Izz_trunk = 1.6 > 1) are
# unstable. The plant therefore adds the leg contribution.
LEG_INERTIA = jnp.diag(jnp.array([0.20, 0.22, 0.25]))


class PlantState(struct.PyTreeNode):
    root_pos: jnp.ndarray        # (3,) world
    root_quat: jnp.ndarray       # (4,) w,x,y,z
    root_lin_vel: jnp.ndarray    # (3,) world
    root_ang_vel: jnp.ndarray    # (3,) world
    foot_pos: jnp.ndarray        # (4,3) world foot points
    foot_vel: jnp.ndarray        # (4,3) world
    in_contact: jnp.ndarray      # (4,) bool: foot currently pinned
    foot_force_n: jnp.ndarray    # (4,) ground normal force (sensor)
    joint_pos: jnp.ndarray       # (12,) IK cache (sensor + warm start)


def init_standing(params: RobotParams, terrain: terrain_mod.Terrain,
                  height: float = 0.3, dtype=jnp.float32) -> PlantState:
    """Robot standing at the default stance, feet pinned on the terrain."""
    foot_xy = params.default_foot_pos[:, :2]
    foot_z = terrain_mod.height(terrain, foot_xy[:, 0], foot_xy[:, 1])
    foot_pos = jnp.concatenate([foot_xy, foot_z[:, None]], axis=1)
    root_pos = jnp.array([0.0, 0.0, height], dtype) + jnp.array(
        [0.0, 0.0, 1.0], dtype) * jnp.mean(foot_z)
    rel = foot_pos - root_pos[None, :]
    q = kin.ik_all_legs(rel, params.rho_opt, params.rho_fix, None, 12)
    return PlantState(
        root_pos=root_pos,
        root_quat=jnp.array([1.0, 0, 0, 0], dtype),
        root_lin_vel=jnp.zeros(3, dtype),
        root_ang_vel=jnp.zeros(3, dtype),
        foot_pos=foot_pos,
        foot_vel=jnp.zeros((NUM_LEG, 3), dtype),
        in_contact=jnp.ones(NUM_LEG, bool),
        foot_force_n=jnp.full((NUM_LEG,), 0.25 * 15.0 * 9.81, dtype),
        joint_pos=q.reshape(-1),
    )


def _quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray,
                    dt: jnp.ndarray) -> jnp.ndarray:
    """q_{t+1} = exp(omega dt / 2) (x) q, world-frame angular velocity."""
    angle = jnp.linalg.norm(omega_world) * dt
    axis = omega_world / jnp.maximum(jnp.linalg.norm(omega_world), 1e-9)
    half = 0.5 * angle
    dq = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    w1, v1 = dq[0], dq[1:]
    w2, v2 = q[0], q[1:]
    w = w1 * w2 - v1 @ v2
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    out = jnp.concatenate([w[None], v])
    return out / jnp.linalg.norm(out)


def _substep(params: RobotParams, terrain: terrain_mod.Terrain,
             ps: PlantState, leg_force_world: jnp.ndarray,
             dt: jnp.ndarray) -> PlantState:
    """One physics substep. ``leg_force_world`` (4,3): force each leg applies
    at its foot endpoint, world frame (constant over the control period)."""
    gz = terrain_mod.height(terrain, ps.foot_pos[:, 0], ps.foot_pos[:, 1])

    # --- contact state machine
    # pinned feet: ground constraint force balances leg force + foot weight
    n_pinned = -leg_force_world[:, 2] + RELEASE_FORCE
    release = ps.in_contact & (n_pinned < 0.0)
    touchdown = (~ps.in_contact) & (ps.foot_pos[:, 2] <= gz) & (
        ps.foot_vel[:, 2] <= 0.0)
    in_contact = (ps.in_contact & ~release) | touchdown

    # --- finite-friction stick/slip (Coulomb cone on the pin)
    # the ground can supply at most mu_ground * N tangentially; a contact
    # foot whose leg pushes outside that cone SLIDES: z stays pinned on
    # the surface, xy integrates under (applied tangential force +
    # kinetic friction opposing slip). The reference validated against
    # Gazebo's friction-capable ODE contacts (README.md:154-187); the
    # nominal mu_ground = 0.8 exceeds every controller cone so
    # cone-respecting forces never slip.
    n_pos = jnp.maximum(n_pinned, 0.0)                    # (4,)
    cap = params.mu_ground * n_pos
    f_t = leg_force_world[:, :2]                          # applied tangential
    ft_mag = jnp.linalg.norm(f_t, axis=1)
    slipping = in_contact & (ft_mag > cap + 1e-6)
    v_t = ps.foot_vel[:, :2]
    v_mag = jnp.linalg.norm(v_t, axis=1, keepdims=True)
    # kinetic friction opposes slip; at incipient slip (v ~ 0) it opposes
    # the applied tangential force
    slip_dir = jnp.where(v_mag > 1e-4, v_t / jnp.maximum(v_mag, 1e-9),
                         f_t / jnp.maximum(ft_mag, 1e-9)[:, None])
    fric = -cap[:, None] * slip_dir
    slip_vel = v_t + dt * (f_t + fric) / FOOT_MASS
    slip_pos = ps.foot_pos[:, :2] + dt * slip_vel

    # --- foot states
    # pinned-static: frozen at the surface; slipping: xy slides on the
    # surface; swing: virtual point mass
    foot_acc = GRAV[None, :] + leg_force_world / FOOT_MASS
    free_vel = ps.foot_vel + dt * foot_acc
    free_pos = ps.foot_pos + dt * free_vel
    pin_pos = ps.foot_pos.at[:, 2].set(jnp.where(touchdown, gz,
                                                 ps.foot_pos[:, 2]))
    pin_pos = jnp.where(slipping[:, None],
                        jnp.concatenate([slip_pos, pin_pos[:, 2:]], axis=1),
                        pin_pos)
    pin_vel = jnp.where(slipping[:, None],
                        jnp.concatenate(
                            [slip_vel, jnp.zeros_like(slip_vel[:, :1])],
                            axis=1),
                        jnp.zeros((NUM_LEG, 3), ps.foot_vel.dtype))
    foot_pos = jnp.where(in_contact[:, None], pin_pos, free_pos)
    foot_vel = jnp.where(in_contact[:, None], pin_vel, free_vel)
    fn = jnp.where(in_contact, n_pos, 0.0)

    # --- trunk dynamics: reaction of contact legs; the tangential
    # reaction a slipping foot transmits is CAPPED at mu*N (the ground
    # cannot push back harder) — this is what makes a cone-violating
    # controller lose traction instead of silently succeeding
    react_t = jnp.where(slipping[:, None], -cap[:, None] * slip_dir, -f_t)
    reaction = jnp.concatenate([react_t, -leg_force_world[:, 2:]], axis=1)
    transmit = in_contact[:, None]
    body_force = jnp.sum(jnp.where(transmit, reaction, 0.0), axis=0)
    r = ps.foot_pos - ps.root_pos[None, :]
    body_torque = jnp.sum(
        jnp.where(transmit, jnp.cross(r, reaction), 0.0), axis=0)

    rot = mathx.quat_to_rot(ps.root_quat)
    inertia_w = rot @ (params.trunk_inertia + LEG_INERTIA) @ rot.T
    lin_acc = body_force / params.robot_mass + GRAV
    ang_acc = mathx.solve3(
        inertia_w,
        body_torque - jnp.cross(ps.root_ang_vel,
                                inertia_w @ ps.root_ang_vel))
    root_lin_vel = ps.root_lin_vel + dt * lin_acc
    root_pos = ps.root_pos + dt * root_lin_vel
    root_ang_vel = ps.root_ang_vel + dt * ang_acc
    root_quat = _quat_integrate(ps.root_quat, root_ang_vel, dt)

    return ps.replace(
        root_pos=root_pos, root_quat=root_quat,
        root_lin_vel=root_lin_vel, root_ang_vel=root_ang_vel,
        foot_pos=foot_pos, foot_vel=foot_vel,
        in_contact=in_contact, foot_force_n=fn,
    )


@partial(jax.jit, static_argnames=("substeps",))
def plant_step(params: RobotParams, terrain: terrain_mod.Terrain,
               ps: PlantState, joint_torques: jnp.ndarray,
               dt: jnp.ndarray, substeps: int = 5) -> PlantState:
    """Advance the plant one control period under constant joint torques."""
    rot = mathx.quat_to_rot(ps.root_quat)
    # joint angles tracking the simulated feet (warm-started IK)
    rel = jnp.einsum("ba,lb->la", rot,
                     ps.foot_pos - ps.root_pos[None, :])
    # 2 Newton iterations suffice warm-started: feet move <~3 mm per
    # control period and the damped-Newton IK converges quadratically
    # (measured: 2 mm perturbation -> 6e-8 m foot error after 2 iters)
    q = kin.ik_all_legs(rel, params.rho_opt, params.rho_fix,
                        ps.joint_pos.reshape(NUM_LEG, 3), 2)
    jacs = kin.jac_all_legs(q, params.rho_opt, params.rho_fix)
    tau = joint_torques.reshape(NUM_LEG, 3)
    # massless leg: force the leg applies at its endpoint. tau = J' F_app
    # (manipulator convention, matching the controller's
    # tau = J'(-F_grf) stance mapping) => F_app = J^-T tau.
    f_ee_body = mathx.solve3(jacs.transpose(0, 2, 1), tau)
    leg_force_world = jnp.einsum("ab,lb->la", rot, f_ee_body)

    sub_dt = dt / substeps

    def body(carry, _):
        return _substep(params, terrain, carry, leg_force_world, sub_dt), None

    ps, _ = jax.lax.scan(body, ps, None, length=substeps)
    return ps.replace(joint_pos=q.reshape(-1))


@jax.jit
def read_sensors(params: RobotParams, ps: PlantState,
                 prev_root_lin_vel: jnp.ndarray,
                 dt: jnp.ndarray) -> SensorData:
    """Synthesize the sensor snapshot the adapters would ingest."""
    rot = mathx.quat_to_rot(ps.root_quat)
    # accelerometer: specific force in body frame
    acc_world = (ps.root_lin_vel - prev_root_lin_vel) / dt
    imu_acc = rot.T @ (acc_world - GRAV)
    imu_gyro = rot.T @ ps.root_ang_vel
    q = ps.joint_pos.reshape(NUM_LEG, 3)
    jacs = kin.jac_all_legs(q, params.rho_opt, params.rho_fix)
    rel_vel = jnp.einsum(
        "ba,lb->la", rot, ps.foot_vel - ps.root_lin_vel[None, :]
        - jnp.cross(ps.root_ang_vel[None, :], ps.foot_pos
                    - ps.root_pos[None, :]))
    joint_vel = mathx.solve3(jacs, rel_vel)
    return SensorData(
        root_quat=ps.root_quat,
        root_pos=ps.root_pos,
        root_lin_vel=ps.root_lin_vel,
        imu_acc=imu_acc,
        imu_ang_vel=imu_gyro,
        joint_pos=ps.joint_pos,
        joint_vel=joint_vel.reshape(-1),
        foot_force=ps.foot_force_n,
    )
