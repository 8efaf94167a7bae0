"""EKF tests: structure, static convergence, and tracking under noise."""

import numpy as np
import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.models import estimator
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState


def setup():
    cfg, params = load_profile("gazebo_mpc")
    cs = CtrlState.init(cfg, params)
    mem = CtrlMem.init(cfg)
    return cfg, params, cs, mem


def test_observation_matrix_structure():
    c = np.asarray(estimator.observation_matrix())
    assert c.shape == (28, 18)
    # FK residual rows: -I on body pos, +I on that foot's position states
    np.testing.assert_allclose(c[0:3, 0:3], -np.eye(3))
    np.testing.assert_allclose(c[3:6, 9:12], np.eye(3))
    # velocity rows observe body velocity
    np.testing.assert_allclose(c[12:15, 3:6], np.eye(3))
    # height rows observe foot z
    assert c[24, 8] == 1.0 and c[27, 17] == 1.0


def test_lazy_init_then_update():
    cfg, params, cs, mem = setup()
    cs = cs.replace(foot_pos_rel=params.default_foot_pos)
    ekf, cs1 = estimator.step(cfg, params, cs, mem.ekf, jnp.float32(0.0025))
    assert bool(ekf.initialized)
    # init places body at z=0.09 and feet from FK (A1BasicEKF.cpp:61-67)
    np.testing.assert_allclose(np.asarray(ekf.x[0:3]), [0, 0, 0.09],
                               atol=1e-6)
    # the init tick must not write root state back (reference behavior)
    np.testing.assert_allclose(np.asarray(cs1.root_pos),
                               np.asarray(cs.root_pos))


def test_static_convergence():
    """Standing still with consistent measurements: estimate converges to
    the kinematically-consistent height."""
    cfg, params, cs, mem = setup()
    true_z = 0.3
    foot_rel = params.default_foot_pos.at[:, 2].set(-true_z)
    cs = cs.replace(
        foot_pos_rel=foot_rel,
        foot_vel_rel=jnp.zeros((4, 3)),
        imu_acc=jnp.array([0.0, 0.0, 9.81]),  # specific force at rest
        imu_ang_vel=jnp.zeros(3),
        foot_force=jnp.full((4,), 100.0),
        movement_mode=jnp.int32(0),
    )
    ekf, cs = estimator.step(cfg, params, cs, mem.ekf, jnp.float32(0.0025))
    for _ in range(500):
        ekf, cs = estimator.step(cfg, params, cs, ekf, jnp.float32(0.0025))
    assert abs(float(cs.root_pos[2]) - true_z) < 5e-3
    assert np.abs(np.asarray(cs.root_lin_vel)).max() < 1e-2


def test_tracking_under_noise(rng):
    """Constant-velocity motion with noisy IMU: velocity estimate tracks."""
    cfg, params, cs, mem = setup()
    v = np.array([0.3, 0.0, 0.0])
    dt = 0.0025
    foot_rel0 = np.asarray(params.default_foot_pos.at[:, 2].set(-0.3))
    ekf = mem.ekf
    pos = np.zeros(3)
    est_v = []
    for k in range(800):
        pos = pos + v * dt
        # feet fixed in world while body moves: rel = foot_w - pos
        foot_rel = foot_rel0.copy()
        foot_rel[:, :2] -= pos[None, :2] * 0  # feet re-planted; keep simple
        foot_vel_rel = -np.tile(v, (4, 1))
        acc_noise = rng.normal(0, 0.3, 3)
        cs = cs.replace(
            foot_pos_rel=jnp.asarray(foot_rel, jnp.float32),
            foot_vel_rel=jnp.asarray(foot_vel_rel, jnp.float32),
            imu_acc=jnp.asarray([0, 0, 9.81] + acc_noise, jnp.float32),
            imu_ang_vel=jnp.zeros(3),
            foot_force=jnp.full((4,), 100.0),
            movement_mode=jnp.int32(0),
        )
        ekf, cs = estimator.step(cfg, params, cs, ekf, jnp.float32(dt))
        est_v.append(np.asarray(cs.root_lin_vel))
    est_v = np.stack(est_v)
    # after convergence the x-velocity estimate should be near 0.3
    assert abs(est_v[-100:, 0].mean() - 0.3) < 0.05


def test_covariance_stays_symmetric_psd():
    cfg, params, cs, mem = setup()
    cs = cs.replace(foot_pos_rel=params.default_foot_pos,
                    imu_acc=jnp.array([0.0, 0.0, 9.81]),
                    foot_force=jnp.full((4,), 100.0))
    ekf, cs = estimator.step(cfg, params, cs, mem.ekf, jnp.float32(0.0025))
    for _ in range(200):
        ekf, cs = estimator.step(cfg, params, cs, ekf, jnp.float32(0.0025))
    p = np.asarray(ekf.P, np.float64)
    np.testing.assert_allclose(p, p.T, atol=1e-5)
    eigs = np.linalg.eigvalsh(p)
    assert eigs.min() > -1e-5


def test_non_flat_ground_mode_ignores_height_rows():
    """assume_flat_ground=False inflates the foot-height measurement noise
    to 1e5 (A1BasicEKF.cpp:49-53): on non-flat terrain the z estimate then
    follows leg odometry instead of being pulled to z=0."""
    import dataclasses
    cfg, params = load_profile("gazebo_mpc")
    cfg_off = dataclasses.replace(cfg, assume_flat_ground=False)
    true_z = 0.3
    foot_rel = params.default_foot_pos.at[:, 2].set(-true_z)
    # feet are actually 0.2 m above world zero (standing on a ledge)
    base = CtrlState.init(cfg, params).replace(
        foot_pos_rel=foot_rel,
        imu_acc=jnp.array([0.0, 0.0, 9.81]),
        foot_force=jnp.full((4,), 100.0),
        movement_mode=jnp.int32(0),
    )
    for cfg_i, expect_pull in ((cfg, True), (cfg_off, False)):
        cs = base
        ekf, cs = estimator.step(cfg_i, params, cs, CtrlMem.init(cfg_i).ekf,
                                 jnp.float32(0.0025))
        # seed the body z estimate high (as if on a ledge)
        ekf = ekf.replace(x=ekf.x.at[2].set(0.5).at[8::3].set(0.2))
        for _ in range(400):
            ekf, cs = estimator.step(cfg_i, params, cs, ekf,
                                     jnp.float32(0.0025))
        z = float(cs.root_pos[2])
        if expect_pull:
            # flat-ground rows drag foot z (and thus body z) toward 0
            assert z < 0.45
        else:
            # without them the ledge height persists
            assert z > 0.45


def test_vmaps_over_batch():
    cfg, params, cs, mem = setup()
    batch = 3
    css = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), cs)
    ekfs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), mem.ekf)
    step = jax.vmap(lambda c, e: estimator.step(cfg, params, c, e,
                                                jnp.float32(0.0025)))
    out_ekf, out_cs = step(css, ekfs)
    assert out_ekf.x.shape == (batch, 18)
