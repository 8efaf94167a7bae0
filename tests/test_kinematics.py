import numpy as np
import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import default_robot_params
from a1_qp_mpc_controller_tpu.models import kinematics as kin


def params():
    return default_robot_params()


def test_fk_neutral_posture():
    """q = 0: leg fully extended straight down the z axis from the hip."""
    p = params()
    q = jnp.zeros(3)
    for leg in range(4):
        pos = np.asarray(kin.fk(q, p.rho_opt[leg], p.rho_fix[leg]))
        ox, oy, d, lu, ll = np.asarray(p.rho_fix[leg])
        np.testing.assert_allclose(pos, [ox, oy + d, -(lu + ll)], atol=1e-6)


def test_fk_hip_roll_only():
    """Pure hip roll rotates the leg about the body x axis."""
    p = params()
    ang = 0.3
    q = jnp.array([ang, 0.0, 0.0])
    pos = np.asarray(kin.fk(q, p.rho_opt[0], p.rho_fix[0]))
    ox, oy, d, lu, ll = np.asarray(p.rho_fix[0])
    y0, z0 = oy + d, -(lu + ll)
    # rotate (y - oy, z) about x by ang
    c, s = np.cos(ang), np.sin(ang)
    y_in, z_in = d, -(lu + ll)
    np.testing.assert_allclose(
        pos, [ox, oy + c * y_in - s * z_in, s * y_in + c * z_in], atol=1e-6)
    del y0, z0


def test_fk_knee_bend_shortens_leg():
    p = params()
    q = jnp.array([0.0, 0.8, -1.6])
    pos = np.asarray(kin.fk(q, p.rho_opt[1], p.rho_fix[1]))
    ox, oy, d, lu, ll = np.asarray(p.rho_fix[1])
    # distance from hip-pitch axis point must match the 2-link reach
    reach = np.sqrt(lu**2 + ll**2 + 2 * lu * ll * np.cos(1.6))
    dist = np.linalg.norm(pos - np.array([ox, oy + d, 0.0]))
    np.testing.assert_allclose(dist, reach, atol=1e-5)


def test_jacobian_matches_finite_difference(rng):
    p = params()
    for leg in range(4):
        q = jnp.asarray(rng.uniform(-1.0, 1.0, 3), jnp.float32)
        J = np.asarray(kin.jac(q, p.rho_opt[leg], p.rho_fix[leg]))
        eps = 1e-4
        for k in range(3):
            dq = np.zeros(3, np.float32)
            dq[k] = eps
            fp = np.asarray(kin.fk(q + dq, p.rho_opt[leg], p.rho_fix[leg]))
            fm = np.asarray(kin.fk(q - dq, p.rho_opt[leg], p.rho_fix[leg]))
            np.testing.assert_allclose(J[:, k], (fp - fm) / (2 * eps),
                                       atol=2e-3)


def test_calibration_derivative_shapes(rng):
    p = params()
    q = jnp.asarray(rng.uniform(-1.0, 1.0, 3), jnp.float32)
    assert kin.dfk_drho(q, p.rho_opt[0], p.rho_fix[0]).shape == (3, 3)
    assert kin.dJ_dq(q, p.rho_opt[0], p.rho_fix[0]).shape == (9, 3)
    assert kin.dJ_drho(q, p.rho_opt[0], p.rho_fix[0]).shape == (9, 3)


def test_calibration_derivatives_match_finite_difference(rng):
    """The autodiff replacements for the reference's MATLAB-generated
    dJ_dq / dfk_drho / dJ_drho (A1Kinematics.h:22-30) against central
    finite differences."""
    p = params()
    q = jnp.asarray(rng.uniform(-0.8, 0.8, 3), jnp.float32)
    eps = 1e-3
    djdq = np.asarray(kin.dJ_dq(q, p.rho_opt[0], p.rho_fix[0]))
    dfk = np.asarray(kin.dfk_drho(q, p.rho_opt[0], p.rho_fix[0]))
    djr = np.asarray(kin.dJ_drho(q, p.rho_opt[0], p.rho_fix[0]))
    for k in range(3):
        dq = np.zeros(3, np.float32)
        dq[k] = eps
        jp = np.asarray(kin.jac(q + dq, p.rho_opt[0], p.rho_fix[0]))
        jm = np.asarray(kin.jac(q - dq, p.rho_opt[0], p.rho_fix[0]))
        np.testing.assert_allclose(((jp - jm) / (2 * eps)).reshape(-1),
                                   djdq[:, k], atol=2e-2)
        dr = jnp.zeros(3).at[k].set(eps)
        fp = np.asarray(kin.fk(q, p.rho_opt[0] + dr, p.rho_fix[0]))
        fm = np.asarray(kin.fk(q, p.rho_opt[0] - dr, p.rho_fix[0]))
        np.testing.assert_allclose((fp - fm) / (2 * eps), dfk[:, k],
                                   atol=2e-2)
        jp = np.asarray(kin.jac(q, p.rho_opt[0] + dr, p.rho_fix[0]))
        jm = np.asarray(kin.jac(q, p.rho_opt[0] - dr, p.rho_fix[0]))
        np.testing.assert_allclose(((jp - jm) / (2 * eps)).reshape(-1),
                                   djr[:, k], atol=2e-2)


def test_rho_opt_offset_moves_foot():
    """Contact offset rho_opt displaces the foot by exactly that vector in
    the calf frame (rotated by the leg chain)."""
    p = params()
    q = jnp.zeros(3)
    base = np.asarray(kin.fk(q, p.rho_opt[0], p.rho_fix[0]))
    shifted = np.asarray(kin.fk(q, jnp.array([0.0, 0.0, 0.01]),
                                p.rho_fix[0]))
    # at q=0 the calf frame z aligns with body z
    np.testing.assert_allclose(shifted - base, [0, 0, 0.01], atol=1e-6)


def test_foot_fanout_shapes(rng):
    p = params()
    jp = jnp.asarray(rng.uniform(-0.5, 0.5, 12), jnp.float32)
    jv = jnp.asarray(rng.uniform(-1, 1, 12), jnp.float32)
    pos, jacs, vel = kin.foot_fanout(jp, jv, p.rho_opt, p.rho_fix)
    assert pos.shape == (4, 3) and jacs.shape == (4, 3, 3)
    np.testing.assert_allclose(
        np.asarray(vel[2]),
        np.asarray(jacs[2]) @ np.asarray(jv[6:9]), atol=1e-5)


def test_ik_inverts_fk(rng):
    p = params()
    for leg in range(4):
        q_true = jnp.asarray(rng.uniform([-0.4, 0.2, -2.2], [0.4, 1.2, -0.8]),
                             jnp.float32)
        target = kin.fk(q_true, p.rho_opt[leg], p.rho_fix[leg])
        q_sol = kin.ik(target, p.rho_opt[leg], p.rho_fix[leg])
        back = kin.fk(q_sol, p.rho_opt[leg], p.rho_fix[leg])
        np.testing.assert_allclose(np.asarray(back), np.asarray(target),
                                   atol=1e-4)


def test_fk_vmaps_over_batch(rng):
    p = params()
    qb = jnp.asarray(rng.uniform(-1, 1, (7, 3)), jnp.float32)
    out = jax.vmap(lambda q: kin.fk(q, p.rho_opt[0], p.rho_fix[0]))(qb)
    assert out.shape == (7, 3)


def test_calibrate_foot_positions_recovers_offsets():
    """Gauss-Newton on FK residuals with the analytic dfk_drho recovers
    an injected contact offset from noisy observations — the use-case
    the reference's calibration derivative matrices exist for
    (A1Kinematics.h:16-19)."""
    from a1_qp_mpc_controller_tpu.config import default_robot_params
    from a1_qp_mpc_controller_tpu.models import calibration, kinematics

    params = default_robot_params()
    rho_fix = params.rho_fix[0]
    rho_true = jnp.array([0.012, -0.008, 0.02], jnp.float32)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-0.6, 0.6, (40, 3)), jnp.float32)
    p = jax.vmap(lambda qq: kinematics.fk(qq, rho_true, rho_fix))(q)
    p = p + jnp.asarray(rng.normal(0, 2e-4, p.shape), jnp.float32)
    rho_est, rms = calibration.calibrate_foot_positions(q, p, rho_fix)
    np.testing.assert_allclose(np.asarray(rho_est),
                               np.asarray(rho_true), atol=2e-3)
    assert float(rms) < 1e-3


def test_calibrate_leg_odometry_recovers_offsets():
    """Self-supervised variant: stance-phase J q_dot observations
    (synthesized with a true offset) constrain rho_opt linearly through
    dJ_drho."""
    from a1_qp_mpc_controller_tpu.config import default_robot_params
    from a1_qp_mpc_controller_tpu.models import calibration, kinematics

    params = default_robot_params()
    rho_fix = params.rho_fix[0]
    rho_true = jnp.array([0.01, -0.006, 0.015], jnp.float32)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-0.6, 0.6, (60, 3)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-3.0, 3.0, (60, 3)), jnp.float32)
    b = jax.vmap(lambda qq, dd: kinematics.jac(qq, rho_true, rho_fix)
                 @ dd)(q, qd)
    rho_est = calibration.calibrate_leg_odometry(q, qd, b, rho_fix)
    # linearization around rho=0: first-order accurate
    np.testing.assert_allclose(np.asarray(rho_est),
                               np.asarray(rho_true), atol=2e-3)
