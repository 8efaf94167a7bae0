"""Plant + terrain unit tests."""

import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.sim import plant as pl
from a1_qp_mpc_controller_tpu.sim import terrain as tr


def test_terrain_flat():
    t = tr.Terrain.flat()
    z = tr.height(t, jnp.array([0.0, 1.0, -5.0]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(z), 0.0)


def test_terrain_slope():
    t = tr.Terrain.slope(0.2, start=1.0, length=2.0)
    xs = jnp.array([0.0, 1.0, 2.0, 3.0, 10.0])
    z = np.asarray(tr.height(t, xs, jnp.zeros(5)))
    g = np.tan(0.2)
    np.testing.assert_allclose(z, [0, 0, g, 2 * g, 2 * g], atol=1e-6)


def test_terrain_stairs():
    t = tr.Terrain.stairs(step_height=0.09, step_len=0.25, start=0.5,
                          n_steps=3)
    xs = jnp.array([0.0, 0.5, 0.76, 1.01, 2.0])
    z = np.asarray(tr.height(t, xs, jnp.zeros(5)))
    np.testing.assert_allclose(z, [0, 0, 0.09, 0.18, 0.27], atol=1e-6)


def setup():
    cfg, params = load_profile("gazebo_mpc")
    terr = tr.Terrain.flat()
    ps = pl.init_standing(params, terr, 0.3)
    return params, terr, ps


def test_init_standing_consistent():
    params, terr, ps = setup()
    np.testing.assert_allclose(np.asarray(ps.root_pos), [0, 0, 0.3],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps.foot_pos[:, 2]), 0.0,
                               atol=1e-6)
    # IK joint angles reproduce the foot positions
    from a1_qp_mpc_controller_tpu.models import kinematics as kin
    rel = np.asarray(ps.foot_pos) - np.asarray(ps.root_pos)
    fk = np.asarray(kin.fk_all_legs(ps.joint_pos.reshape(4, 3),
                                    params.rho_opt, params.rho_fix))
    np.testing.assert_allclose(fk, rel, atol=1e-4)


def test_zero_torque_body_falls_feet_pinned():
    params, terr, ps = setup()
    dt = jnp.float32(0.0025)
    for _ in range(40):
        ps = pl.plant_step(params, terr, ps, jnp.zeros(12), dt, 5)
    # body in free fall: z drop ~ 0.5 g t^2, t = 0.1 s
    drop = 0.3 - float(ps.root_pos[2])
    assert 0.03 < drop < 0.07
    # feet stay pinned at ground (no pull-up force)
    np.testing.assert_allclose(np.asarray(ps.foot_pos[:, 2]), 0.0,
                               atol=1e-6)


def test_supporting_torques_hold_body():
    """Torques implementing F = mg/4 upward per leg keep the body still."""
    import jax
    from a1_qp_mpc_controller_tpu.models import kinematics as kin
    params, terr, ps = setup()
    dt = jnp.float32(0.0025)
    fz = float(params.robot_mass) * 9.81 / 4.0
    for _ in range(80):
        q = ps.joint_pos.reshape(4, 3)
        jacs = kin.jac_all_legs(q, params.rho_opt, params.rho_fix)
        # leg pushes down on ground: F_app = (0,0,-fz); tau = J' F_app
        f_app = jnp.tile(jnp.array([0.0, 0.0, -fz]), (4, 1))
        tau = jax.vmap(lambda J, f: J.T @ f)(jacs, f_app).reshape(-1)
        ps = pl.plant_step(params, terr, ps, tau, dt, 5)
    assert abs(float(ps.root_pos[2]) - 0.3) < 5e-3
    assert np.abs(np.asarray(ps.root_lin_vel)).max() < 0.05
    # sensor reads the supporting force
    np.testing.assert_allclose(np.asarray(ps.foot_force_n),
                               fz + pl.RELEASE_FORCE, rtol=0.1)


def test_pull_up_releases_foot():
    import jax
    from a1_qp_mpc_controller_tpu.models import kinematics as kin
    params, terr, ps = setup()
    dt = jnp.float32(0.0025)
    q = ps.joint_pos.reshape(4, 3)
    jacs = kin.jac_all_legs(q, params.rho_opt, params.rho_fix)
    # leg 0 pulls its foot up hard; others support
    f_app = jnp.array([[0.0, 0, 50.0], [0, 0, -60.0], [0, 0, -60.0],
                       [0, 0, -60.0]])
    tau = jax.vmap(lambda J, f: J.T @ f)(jacs, f_app).reshape(-1)
    ps2 = pl.plant_step(params, terr, ps, tau, dt, 5)
    assert not bool(ps2.in_contact[0])
    assert float(ps2.foot_pos[0, 2]) > 0.0
    assert bool(ps2.in_contact[1])


def test_sensors_consistency():
    params, terr, ps = setup()
    s = pl.read_sensors(params, ps, ps.root_lin_vel, jnp.float32(0.0025))
    # at rest: accelerometer reads +g in body z, gyro zero
    np.testing.assert_allclose(np.asarray(s.imu_acc), [0, 0, 9.81],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s.imu_ang_vel), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.joint_vel), 0.0, atol=1e-5)
