"""Tests for the 18-DoF articulated joint-space plant (sim/joint_plant.py)
— the in-framework stand-in for Gazebo's full-URDF physics (the reference
validates against Gazebo, SURVEY.md §4; we assert instead of eyeballing).

Covers plant physics sanity (free fall, torque saturation, pinned-contact
consistency) and closed-loop capabilities on the articulated plant: stand
(gazebo_qp / hardware_qp / isaac_mpc), trot (gazebo_mpc).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.sim import joint_plant as jp
from a1_qp_mpc_controller_tpu.sim import terrain as tr


def _run(profile, n_steps, walk_after=None, velx=0.0, height=0.3,
         mpc_iters=400, substeps=5):
    cfg, params = load_profile(profile)
    cfg = dataclasses.replace(cfg, mpc_qp_iters=mpc_iters)
    terrain = tr.Terrain.flat()
    carry = cl.make_standing_start(cfg, params, terrain, height=height,
                                   plant=jp)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=velx)
    return cl.rollout(cfg, params, terrain, carry, joy, n_steps,
                      substeps=substeps, plant=jp)


# ---------------------------------------------------------------- physics


def test_free_fall_com_acceleration():
    """With no contact and zero torque the COM must accelerate at -g."""
    _, params = load_profile("gazebo_mpc")
    terrain = tr.Terrain.flat()
    ps = jp.init_standing(params, terrain, height=0.3)
    # lift the robot well above ground and release all pins
    ps = ps.replace(root_pos=ps.root_pos + jnp.array([0.0, 0.0, 5.0]),
                    foot_pos=ps.foot_pos + jnp.array([0.0, 0.0, 5.0]),
                    in_contact=jnp.zeros(4, bool))
    dt = jnp.float32(0.0025)
    tau = jnp.zeros(12)
    n = 40
    z0, v0 = float(ps.root_pos[2]), float(ps.root_lin_vel[2])
    for _ in range(n):
        ps = jp.plant_step(params, terrain, ps, tau, dt, substeps=2)
    t = n * 0.0025
    # trunk z follows a ballistic arc (legs swing under gravity, so allow
    # a small internal-motion tolerance on the trunk itself)
    z_expect = z0 + v0 * t - 0.5 * 9.81 * t * t
    assert abs(float(ps.root_pos[2]) - z_expect) < 0.01
    assert not bool(jnp.isnan(ps.root_pos).any())


def test_torque_saturation_clamps_actuation():
    """Commanded torques beyond the A1 URDF effort limit (33.5 N m) must
    act exactly like the clamped command — Gazebo/Isaac enforce effort
    limits at the joint, so the plant must too."""
    _, params = load_profile("gazebo_mpc")
    terrain = tr.Terrain.flat()
    ps0 = jp.init_standing(params, terrain, height=0.3)
    dt = jnp.float32(0.0025)
    big = jnp.full((12,), 1e6)
    clamped = jnp.full((12,), jp.TORQUE_LIMIT)
    a = jp.plant_step(params, terrain, ps0, big, dt, substeps=5)
    b = jp.plant_step(params, terrain, ps0, clamped, dt, substeps=5)
    np.testing.assert_allclose(np.asarray(a.joint_vel),
                               np.asarray(b.joint_vel), rtol=1e-5, atol=1e-6)
    assert not bool(jnp.isnan(a.root_pos).any())


def test_standing_equilibrium_forces():
    """Pinned standing with gravity-compensating stance torques
    (tau = J' (-F), F = weight/4 up per foot, the controller's stance map):
    constraint normal forces must sum to ~weight and feet must not move."""
    from a1_qp_mpc_controller_tpu.models import kinematics as kin

    _, params = load_profile("gazebo_mpc")
    terrain = tr.Terrain.flat()
    ps = jp.init_standing(params, terrain, height=0.3)
    dt = jnp.float32(0.0025)
    weight = float(params.robot_mass) * 9.81
    f_grf = jnp.array([0.0, 0.0, weight / 4.0])  # body frame ~ world here
    jacs = kin.jac_all_legs(ps.joint_pos.reshape(4, 3), params.rho_opt,
                            params.rho_fix)
    tau = jnp.einsum("lba,b->la", jacs, -f_grf).reshape(12)
    feet0 = np.asarray(ps.foot_pos)
    for _ in range(20):
        ps = jp.plant_step(params, terrain, ps, tau, dt, substeps=5)
    total_n = float(jnp.sum(ps.foot_force_n))
    assert abs(total_n - weight) / weight < 0.12
    # pinned feet stay put, trunk barely moves
    np.testing.assert_allclose(np.asarray(ps.foot_pos), feet0, atol=2e-3)
    assert abs(float(ps.root_pos[2]) - 0.3) < 0.01


def test_read_sensors_shapes_and_gravity():
    _, params = load_profile("gazebo_mpc")
    terrain = tr.Terrain.flat()
    ps = jp.init_standing(params, terrain, height=0.3)
    s = jp.read_sensors(params, ps, ps.root_lin_vel, jnp.float32(0.0025))
    assert s.joint_pos.shape == (12,)
    # at rest the accelerometer reads +g in the body frame
    np.testing.assert_allclose(np.asarray(s.imu_acc),
                               np.array([0.0, 0.0, 9.81]), atol=1e-3)


# ------------------------------------------------------------ closed loop


@pytest.mark.parametrize("profile,height",
                         [("gazebo_qp", 0.3), ("hardware_qp", 0.3),
                          ("isaac_mpc", 0.35)])
def test_stand_on_articulated_plant(profile, height):
    _, trace = _run(profile, 600, height=height, mpc_iters=120)
    rp = np.asarray(trace.root_pos)
    assert not np.isnan(rp).any()
    # holds height near command over the last 0.5 s
    assert np.abs(rp[-200:, 2] - height).max() < 0.05
    assert np.abs(rp[-1, :2]).max() < 0.06


def test_trot_on_articulated_plant():
    """gazebo_mpc trots forward on the full articulated dynamics."""
    _, trace = _run("gazebo_mpc", 1400, walk_after=400, velx=0.3,
                    mpc_iters=120)
    rp = np.asarray(trace.root_pos)
    assert not np.isnan(rp).any()
    # forward progress: >= 0.4 m over 2.5 s of commanded 0.3 m/s
    assert rp[-1, 0] > 0.4
    # keeps its feet: body stays in a sane height band while walking
    assert rp[600:, 2].min() > 0.22
    assert rp[600:, 2].max() < 0.40


def test_isaac_profiles_survive_walk_onset():
    """The Isaac swing gains (kp_foot 3250-4250 through the J^-1(km∘F)
    map) saturate the actuators at walk onset; with the plant-side effort
    clamp the rollout must stay finite (the reference relies on Isaac Sim
    enforcing the same URDF effort limits)."""
    _, trace = _run("isaac_mpc", 900, walk_after=400, velx=0.2,
                    height=0.35, mpc_iters=120)
    assert not np.isnan(np.asarray(trace.root_pos)).any()
