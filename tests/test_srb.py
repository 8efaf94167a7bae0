import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    MPC_STATE_DIM, NUM_DOF, PLAN_HORIZON, default_robot_params,
)
from a1_qp_mpc_controller_tpu.models import srb
from a1_qp_mpc_controller_tpu.utils import mathx


def stand_state(rng):
    p = default_robot_params()
    euler = jnp.asarray(rng.uniform(-0.1, 0.1, 3), jnp.float32)
    rot = mathx.quat_to_rot(mathx.euler_to_quat(euler))
    foot_pos = p.default_foot_pos
    return p, euler, rot, foot_pos


def test_continuous_a_structure(rng):
    _, euler, _, _ = stand_state(rng)
    a = np.asarray(srb.continuous_a(euler))
    assert a.shape == (13, 13)
    cy, sy = np.cos(float(euler[2])), np.sin(float(euler[2]))
    np.testing.assert_allclose(a[0:3, 6:9],
                               [[cy, sy, 0], [-sy, cy, 0], [0, 0, 1]],
                               atol=1e-6)
    np.testing.assert_allclose(a[3:6, 9:12], np.eye(3), atol=1e-6)
    assert a[11, 12] == 1.0
    # everything else zero
    mask = np.zeros_like(a, dtype=bool)
    mask[0:3, 6:9] = mask[3:6, 9:12] = True
    mask[11, 12] = True
    assert np.abs(a[~mask]).max() == 0.0


def test_continuous_a_nilpotent(rng):
    _, euler, _, _ = stand_state(rng)
    a = np.asarray(srb.continuous_a(euler), np.float64)
    a3 = a @ a @ a
    assert np.abs(a3).max() < 1e-12
    a2 = a @ a
    # only surviving entry: gravity integrating into z position
    assert abs(a2[5, 12] - 1.0) < 1e-6
    a2[5, 12] = 0
    assert np.abs(a2).max() < 1e-12


def test_a_d_powers_match_repeated_multiplication(rng):
    _, euler, _, _ = stand_state(rng)
    a_c = np.asarray(srb.continuous_a(euler), np.float64)
    dt = 0.0025
    a_d = np.eye(13) + a_c * dt
    powers = np.asarray(srb.a_d_powers(srb.continuous_a(euler),
                                       jnp.float32(dt), PLAN_HORIZON))
    ref = np.eye(13)
    for k in range(PLAN_HORIZON + 1):
        np.testing.assert_allclose(powers[k], ref, atol=1e-6)
        ref = ref @ a_d


def test_continuous_b_force_rows(rng):
    p, euler, rot, foot_pos = stand_state(rng)
    b = np.asarray(srb.continuous_b(p.robot_mass, p.trunk_inertia, rot,
                                    foot_pos), np.float64)
    assert b.shape == (13, 12)
    for i in range(4):
        np.testing.assert_allclose(b[9:12, 3 * i:3 * i + 3],
                                   np.eye(3) / float(p.robot_mass),
                                   atol=1e-6)
        # torque block = I_w^-1 [r]x
        iw = np.asarray(rot, np.float64) @ np.asarray(
            p.trunk_inertia, np.float64) @ np.asarray(rot, np.float64).T
        r = np.asarray(foot_pos[i], np.float64)
        sk = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
        np.testing.assert_allclose(b[6:9, 3 * i:3 * i + 3],
                                   np.linalg.inv(iw) @ sk, atol=1e-5)
    # rows 0-5 and 12 are zero
    assert np.abs(b[0:6]).max() == 0.0
    assert np.abs(b[12]).max() == 0.0


def condense_reference(a_d, b_d_list, horizon):
    """Direct float64 transcription of the reference's sequential loop
    (ConvexMpc.cpp:184-202) as ground truth."""
    n, m = a_d.shape[0], b_d_list.shape[2]
    a_qp = np.zeros((horizon * n, n))
    b_qp = np.zeros((horizon * n, horizon * m))
    for i in range(horizon):
        if i == 0:
            a_qp[0:n] = a_d
        else:
            a_qp[i * n:(i + 1) * n] = a_qp[(i - 1) * n:i * n] @ a_d
        for j in range(i + 1):
            if i == j:
                blk = b_d_list[j]
            else:
                blk = a_qp[(i - j - 1) * n:(i - j) * n] @ b_d_list[j]
            b_qp[i * n:(i + 1) * n, j * m:(j + 1) * m] = blk
    return a_qp, b_qp


def test_condense_matches_reference_loop(rng):
    p, euler, rot, foot_pos = stand_state(rng)
    a_c = srb.continuous_a(euler)
    b_c = srb.continuous_b(p.robot_mass, p.trunk_inertia, rot, foot_pos)
    dt = jnp.float32(0.0025)
    a_d, b_d = srb.discretize(a_c, b_c, dt)
    # production path: same B for all horizon steps
    b_d_list = jnp.broadcast_to(b_d, (PLAN_HORIZON,) + b_d.shape)
    a_qp, b_qp = srb.condense(a_c, b_d_list, dt)
    a_ref, b_ref = condense_reference(np.asarray(a_d, np.float64),
                                      np.asarray(b_d_list, np.float64),
                                      PLAN_HORIZON)
    np.testing.assert_allclose(np.asarray(a_qp), a_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_qp), b_ref, atol=1e-6)


def test_condense_same_b_fast_path_matches_general(rng):
    p, euler, rot, foot_pos = stand_state(rng)
    a_c = srb.continuous_a(euler)
    b_c = srb.continuous_b(p.robot_mass, p.trunk_inertia, rot, foot_pos)
    dt = jnp.float32(0.0025)
    _, b_d = srb.discretize(a_c, b_c, dt)
    b_d_list = jnp.broadcast_to(b_d, (PLAN_HORIZON,) + b_d.shape)
    a1, b1 = srb.condense(a_c, b_d_list, dt)
    a2, b2 = srb.condense_same_b(a_c, b_d, dt)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-7)


def test_condense_per_step_b(rng):
    """Per-step varying B matrices (the test_mpc.cpp receding-foothold
    variant) go through the same code path."""
    p, euler, rot, foot_pos = stand_state(rng)
    a_c = srb.continuous_a(euler)
    dt = jnp.float32(0.0025)
    b_list = []
    for i in range(PLAN_HORIZON):
        fp = foot_pos + 0.01 * i
        b_c = srb.continuous_b(p.robot_mass, p.trunk_inertia, rot, fp)
        b_list.append(srb.discretize(a_c, b_c, dt)[1])
    b_d_list = jnp.stack(b_list)
    a_qp, b_qp = srb.condense(a_c, b_d_list, dt)
    a_d = np.eye(13) + np.asarray(a_c, np.float64) * float(dt)
    a_ref, b_ref = condense_reference(a_d, np.asarray(b_d_list, np.float64),
                                      PLAN_HORIZON)
    np.testing.assert_allclose(np.asarray(b_qp), b_ref, atol=1e-6)


def test_mpc_cost_matches_dense_reference(rng):
    p, euler, rot, foot_pos = stand_state(rng)
    a_c = srb.continuous_a(euler)
    b_c = srb.continuous_b(p.robot_mass, p.trunk_inertia, rot, foot_pos)
    dt = jnp.float32(0.0025)
    a_d, b_d = srb.discretize(a_c, b_c, dt)
    b_d_list = jnp.broadcast_to(b_d, (PLAN_HORIZON,) + b_d.shape)
    a_qp, b_qp = srb.condense(a_c, b_d_list, dt)

    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, MPC_STATE_DIM), jnp.float32)
    xref = jnp.asarray(rng.uniform(-0.5, 0.5, MPC_STATE_DIM * PLAN_HORIZON),
                       jnp.float32)
    p_mat, q_vec = srb.mpc_cost(a_qp, b_qp, p.q_weights, p.r_weights, x0,
                                xref)

    bq = np.asarray(b_qp, np.float64)
    Q = np.diag(2.0 * np.tile(np.asarray(p.q_weights, np.float64),
                              PLAN_HORIZON))
    R = np.diag(2.0 * np.tile(np.asarray(p.r_weights, np.float64),
                              PLAN_HORIZON))
    p_ref = bq.T @ Q @ bq + R
    q_ref = bq.T @ Q @ (np.asarray(a_qp, np.float64) @ np.asarray(
        x0, np.float64) - np.asarray(xref, np.float64))
    np.testing.assert_allclose(np.asarray(p_mat), p_ref, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(q_vec), q_ref, rtol=1e-4,
                               atol=1e-3)


def test_friction_constraint_matrix_structure():
    mu = jnp.float32(0.3)
    mat = np.asarray(srb.friction_constraint_matrix(mu))
    assert mat.shape == (200, 120)
    # first leg-block of first step
    blk = mat[0:5, 0:3]
    np.testing.assert_allclose(blk, [[1, 0, 0.3], [1, 0, -0.3],
                                     [0, 1, 0.3], [0, 1, -0.3],
                                     [0, 0, 1]], atol=1e-6)
    # block-diagonal: nothing outside the diagonal 5x3 blocks
    total = np.abs(mat).sum()
    diag_total = sum(
        np.abs(mat[5 * i:5 * i + 5, 3 * i:3 * i + 3]).sum()
        for i in range(40))
    np.testing.assert_allclose(total, diag_total, rtol=1e-5)


def test_mpc_bounds_contact_gating():
    contacts = jnp.array([True, False, True, False])
    lb, ub = srb.mpc_bounds(contacts, jnp.float32(0.0), jnp.float32(180.0))
    lb, ub = np.asarray(lb), np.asarray(ub)
    assert lb.shape == (200,)
    for step in range(PLAN_HORIZON):
        base = step * 20
        # leg 0 in contact: fz in [0, 180]
        assert ub[base + 4] == 180.0
        # leg 1 swing: fz pinned to 0
        assert ub[base + 9] == 0.0 and lb[base + 9] == 0.0
    # pyramid rows: [0, inf) and (-inf, 0]
    assert np.isposinf(ub[0]) and lb[0] == 0.0
    assert np.isneginf(lb[1]) and ub[1] == 0.0


def test_reference_trajectory(rng):
    euler = jnp.array([0.01, -0.02, 0.5])
    pos = jnp.array([1.0, 2.0, 0.3])
    pos_d = jnp.array([0.0, 0.0, 0.32])
    euler_d = jnp.array([0.0, 0.05, 0.6])
    ang_vel_d = jnp.array([0.0, 0.0, 0.2])
    lin_vel_d_w = jnp.array([0.4, 0.0, 0.0])
    dt = jnp.float32(0.0025)
    traj = np.asarray(srb.build_reference_trajectory(
        euler, pos, pos_d, euler_d, ang_vel_d, lin_vel_d_w, dt)).reshape(
            PLAN_HORIZON, MPC_STATE_DIM)
    for i in range(PLAN_HORIZON):
        t = 0.0025 * (i + 1)
        np.testing.assert_allclose(
            traj[i],
            [0.0, 0.05, 0.5 + 0.2 * t, 1.0 + 0.4 * t, 2.0, 0.32,
             0.0, 0.0, 0.2, 0.4, 0.0, 0.0, -9.8], atol=1e-5)


def test_shapes():
    assert NUM_DOF == 12 and MPC_STATE_DIM == 13
