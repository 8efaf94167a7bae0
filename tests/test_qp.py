"""QP solver validation: against scipy (small problems), against the float64
reference ADMM, and via independent KKT checks on the real MPC/stand-QP
problem instances."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from a1_qp_mpc_controller_tpu.config import (
    PLAN_HORIZON, default_robot_params,
)
from a1_qp_mpc_controller_tpu.models import srb
from a1_qp_mpc_controller_tpu.ops import qp as qpx
from a1_qp_mpc_controller_tpu.ops import qp_ref
from a1_qp_mpc_controller_tpu.utils import mathx


def random_box_qp(rng, n=12, m=20, cond=100.0):
    u_mat = np.linalg.qr(rng.standard_normal((n, n)))[0]
    eigs = np.logspace(0, np.log10(cond), n)
    P = (u_mat * eigs) @ u_mat.T
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    mid = A @ rng.standard_normal(n) * 0.1
    l = mid - rng.uniform(0.1, 1.0, m)
    u = mid + rng.uniform(0.1, 1.0, m)
    return P, q, A, l, u


def scipy_solve(P, q, A, l, u):
    lc = scipy.optimize.LinearConstraint(A, l, u)
    x0 = np.zeros(len(q))
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        x0, jac=lambda x: P @ x + q, constraints=[lc], method="SLSQP",
        options=dict(maxiter=500, ftol=1e-12))
    return res.x


def test_ref_solver_matches_scipy(rng):
    for _ in range(3):
        P, q, A, l, u = random_box_qp(rng)
        x_ref, y_ref, _, info = qp_ref.solve_qp_ref(P, q, A, l, u, eps=1e-10)
        assert info["converged"]
        x_sp = scipy_solve(P, q, A, l, u)
        np.testing.assert_allclose(x_ref, x_sp, atol=1e-5)
        stat, prim, comp = qp_ref.kkt_residuals(P, q, A, l, u, x_ref, y_ref)
        assert stat < 1e-6 and prim < 1e-8 and comp < 1e-6


def test_jax_admm_matches_ref_random(rng):
    for _ in range(3):
        P, q, A, l, u = random_box_qp(rng)
        x_ref, _, _, _ = qp_ref.solve_qp_ref(P, q, A, l, u, eps=1e-10)
        sol = qpx.admm_solve(
            jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
            jnp.asarray(u, jnp.float32),
            qpx.QPSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=8000))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-3)


def build_stand_qp(rng, contacts=(1, 1, 1, 1)):
    """The reference's 12-var stand QP (A1RobotControl.cpp:377-431)."""
    p = default_robot_params()
    euler = rng.uniform(-0.05, 0.05, 3)
    rot = np.asarray(mathx.quat_to_rot(mathx.euler_to_quat(
        jnp.asarray(euler, jnp.float32))), np.float64)
    rot_z = np.asarray(mathx.rot_z(jnp.float32(euler[2])), np.float64)
    foot_pos_abs = np.asarray(p.default_foot_pos, np.float64) + \
        rng.uniform(-0.02, 0.02, (4, 3))
    root_acc = np.concatenate([rng.uniform(-1, 1, 3) * 5,
                               rng.uniform(-1, 1, 3)])
    root_acc[2] += 15.0 * 9.8
    M = np.zeros((6, 12))
    for i in range(4):
        M[0:3, 3 * i:3 * i + 3] = np.eye(3)
        r = foot_pos_abs[i]
        sk = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]],
                       [-r[1], r[0], 0]])
        M[3:6, 3 * i:3 * i + 3] = rot_z.T @ sk
    Q = np.diag(np.asarray(p.qp_q_weights, np.float64))
    R = float(p.qp_r_weight)
    P = R * np.eye(12) + M.T @ Q @ M
    qv = -M.T @ Q @ root_acc
    # constraints: fz rows + pyramid
    A = np.zeros((20, 12))
    l = np.zeros(20)
    u = np.zeros(20)
    mu = float(p.mu_qp)
    for i in range(4):
        A[i, 2 + 3 * i] = 1.0
        l[i] = 0.0 * contacts[i]
        u[i] = 180.0 * contacts[i]
        base = 4 + 4 * i
        A[base, 3 * i] = 1.0
        A[base, 2 + 3 * i] = -mu
        A[base + 1, 3 * i] = -1.0
        A[base + 1, 2 + 3 * i] = -mu
        A[base + 2, 1 + 3 * i] = 1.0
        A[base + 2, 2 + 3 * i] = -mu
        A[base + 3, 1 + 3 * i] = -1.0
        A[base + 3, 2 + 3 * i] = -mu
        l[base:base + 4] = -np.inf
    del rot
    return P, qv, A, l, u


def test_stand_qp_against_f64_reference(rng):
    for contacts in [(1, 1, 1, 1), (1, 0, 0, 1)]:
        P, q, A, l, u = build_stand_qp(rng, contacts)
        x_ref, y_ref, _, info = qp_ref.solve_qp_ref(P, q, A, l, u, eps=1e-10)
        assert info["converged"]
        stat, prim, comp = qp_ref.kkt_residuals(P, q, A, l, u, x_ref, y_ref)
        assert stat < 1e-5 and prim < 1e-8
        sol = qpx.admm_solve(
            jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
            jnp.asarray(u, jnp.float32),
            qpx.QPSettings(eps_abs=1e-4, eps_rel=1e-4))
        assert bool(sol.converged)
        # forces are O(100) N; the f32 accuracy floor on this problem
        # (condition number ~1e6) is ~0.15 N — comparable to OSQP's own
        # default-tolerance (1e-3) suboptimality in the reference.
        np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=0.5)
        # swing legs get zero force
        for i in range(4):
            if not contacts[i]:
                assert abs(float(sol.x[3 * i + 2])) < 1e-3


def build_mpc_qp(rng, contacts=(1, 0, 0, 1)):
    """A realistic 120-var, 200-constraint MPC instance (trot stance)."""
    p = default_robot_params()
    euler = jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32)
    rot = mathx.quat_to_rot(mathx.euler_to_quat(euler))
    foot_pos = p.default_foot_pos
    a_c = srb.continuous_a(euler)
    b_c = srb.continuous_b(p.robot_mass, p.trunk_inertia, rot, foot_pos)
    dt = jnp.float32(0.0025)
    _, b_d = srb.discretize(a_c, b_c, dt)
    b_d_list = jnp.broadcast_to(b_d, (PLAN_HORIZON,) + b_d.shape)
    a_qp, b_qp = srb.condense(a_c, b_d_list, dt)
    x0 = jnp.asarray(np.concatenate([
        np.asarray(euler), [0, 0, 0.3], rng.uniform(-0.1, 0.1, 3),
        rng.uniform(-0.2, 0.2, 3), [-9.8]]), jnp.float32)
    xref = srb.build_reference_trajectory(
        euler, x0[3:6], jnp.array([0.0, 0.0, 0.32]),
        jnp.zeros(3), jnp.zeros(3), jnp.array([0.3, 0.0, 0.0]), dt)
    p_mat, q_vec = srb.mpc_cost(a_qp, b_qp, p.q_weights, p.r_weights, x0,
                                xref)
    A = srb.friction_constraint_matrix(p.mu_mpc)
    lb, ub = srb.mpc_bounds(jnp.asarray(contacts, bool), p.fz_min, p.fz_max)
    return p_mat, q_vec, A, lb, ub


def test_mpc_qp_against_f64_reference(rng):
    p_mat, q_vec, A, lb, ub = build_mpc_qp(rng)
    Pn = np.asarray(p_mat, np.float64)
    qn = np.asarray(q_vec, np.float64)
    An = np.asarray(A, np.float64)
    ln = np.asarray(lb, np.float64)
    un = np.asarray(ub, np.float64)
    x_ref, y_ref, _, info = qp_ref.solve_qp_ref(Pn, qn, An, ln, un, eps=1e-9)
    assert info["converged"]
    stat, prim, comp = qp_ref.kkt_residuals(Pn, qn, An, ln, un, x_ref, y_ref)
    assert prim < 1e-6

    # run past the loose termination criteria: with a good rho the f32
    # solution lands within ~0.01 N of the f64 optimum
    sol = qpx.admm_solve(p_mat, q_vec, A, lb, ub,
                         qpx.QPSettings(rho=1e-4, eps_abs=1e-6,
                                        eps_rel=1e-6, max_iter=2000))
    # first-step forces (what the controller applies) match within 0.05 N
    np.testing.assert_allclose(np.asarray(sol.x[:12]), x_ref[:12], atol=5e-2)
    # stance legs carry the weight: total fz ~ m*g over the two stance legs
    fz = np.asarray(sol.x[:12]).reshape(4, 3)[:, 2]
    assert fz[0] + fz[3] > 50.0
    assert abs(fz[1]) < 1e-3 and abs(fz[2]) < 1e-3


def test_jax_admm_f64_algorithm_parity(rng):
    """With float64 enabled, the JAX solver must agree with the float64
    NumPy reference to tight tolerance — proving the algorithms are the
    same and f32 rounding is the only divergence source."""
    import jax
    P, q, A, l, u = build_stand_qp(rng)
    x_ref, _, _, info = qp_ref.solve_qp_ref(P, q, A, l, u, eps=1e-10)
    assert info["converged"]
    jax.config.update("jax_enable_x64", True)
    try:
        sol = qpx.admm_solve(
            jnp.asarray(P, jnp.float64), jnp.asarray(q, jnp.float64),
            jnp.asarray(A, jnp.float64), jnp.asarray(l, jnp.float64),
            jnp.asarray(u, jnp.float64),
            qpx.QPSettings(eps_abs=1e-9, eps_rel=1e-9, max_iter=20000))
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_mpc_qp_warm_start_reduces_iters(rng):
    p_mat, q_vec, A, lb, ub = build_mpc_qp(rng)
    settings = qpx.QPSettings(eps_abs=1e-4, eps_rel=1e-4)
    cold = qpx.admm_solve(p_mat, q_vec, A, lb, ub, settings)
    warm = qpx.admm_solve(p_mat, q_vec, A, lb, ub, settings,
                          x0=cold.x, y0=cold.y)
    assert int(warm.iters) <= int(cold.iters)
    np.testing.assert_allclose(np.asarray(warm.x[:12]),
                               np.asarray(cold.x[:12]), atol=0.5)


def test_fixed_iteration_batched_path(rng):
    """vmapped fixed-iteration solves (rho tuned for the MPC problem family
    after Ruiz scaling) track the f64 reference."""
    import jax
    probs = [build_mpc_qp(rng) for _ in range(4)]
    P = jnp.stack([p[0] for p in probs])
    q = jnp.stack([p[1] for p in probs])
    A = probs[0][2]
    l = jnp.stack([p[3] for p in probs])
    u = jnp.stack([p[4] for p in probs])
    settings = qpx.QPSettings(rho=1e-4)
    batched = jax.vmap(
        lambda Pi, qi, li, ui: qpx.admm_solve_fixed(
            Pi, qi, A, li, ui, 150, settings))
    sols = batched(P, q, l, u)
    # two rho-carry + warm-start rounds (the closed-loop pattern)
    rebatched = jax.vmap(
        lambda Pi, qi, li, ui, xi, yi, ri: qpx.admm_solve_fixed(
            Pi, qi, A, li, ui, 150, settings, x0=xi, y0=yi, rho0=ri))
    for _ in range(2):
        sols = rebatched(P, q, l, u, sols.x, sols.y, sols.rho)
    for b in range(4):
        x_ref, _, _, _ = qp_ref.solve_qp_ref(
            np.asarray(P[b], np.float64), np.asarray(q[b], np.float64),
            np.asarray(A, np.float64), np.asarray(l[b], np.float64),
            np.asarray(u[b], np.float64), eps=1e-9)
        np.testing.assert_allclose(np.asarray(sols.x[b][:12]),
                                   x_ref[:12], atol=0.5)


def test_rho_carry_improves_fixed_solves(rng):
    """Carrying the post-solve rho estimate + warm start across repeated
    solves (the closed-loop pattern) beats cold fixed-iteration solves."""
    p_mat, q_vec, A, lb, ub = build_mpc_qp(rng)
    x_ref, _, _, _ = qp_ref.solve_qp_ref(
        np.asarray(p_mat, np.float64), np.asarray(q_vec, np.float64),
        np.asarray(A, np.float64), np.asarray(lb, np.float64),
        np.asarray(ub, np.float64), eps=1e-9)
    s = qpx.QPSettings(rho=0.1)  # deliberately bad initial rho
    sol = qpx.admm_solve_fixed(p_mat, q_vec, A, lb, ub, 50, s)
    err_cold = np.abs(np.asarray(sol.x[:12]) - x_ref[:12]).max()
    for _ in range(4):
        sol = qpx.admm_solve_fixed(p_mat, q_vec, A, lb, ub, 50, s,
                                   x0=sol.x, y0=sol.y, rho0=sol.rho)
    err_carried = np.abs(np.asarray(sol.x[:12]) - x_ref[:12]).max()
    assert err_carried < err_cold * 0.1
    assert err_carried < 0.5


class TestRankRGJKernel:
    def test_matches_flat_gj(self, rng):
        from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
            batched_inverse, batched_inverse_rank,
        )
        import jax.numpy as jnp
        import numpy as np
        q, _ = np.linalg.qr(rng.normal(size=(3, 120, 120)))
        ev = np.exp(rng.uniform(0, np.log(1e4), size=(3, 120)))
        m = ((q * ev[:, None, :]) @ np.swapaxes(q, 1, 2)).astype(np.float32)
        m64 = m.astype(np.float64)
        x_flat = np.asarray(batched_inverse(
            jnp.asarray(m), block=3, interpret=True), np.float64)
        for r in (2, 4):
            x = np.asarray(batched_inverse_rank(
                jnp.asarray(m), rank=r, block=3, interpret=True),
                np.float64)
            resid = np.max(np.abs(np.eye(120) - x @ m64))
            resid_flat = np.max(np.abs(np.eye(120) - x_flat @ m64))
            assert resid < 10 * resid_flat + 1e-3, (r, resid, resid_flat)

    def test_non_multiple_rank(self, rng):
        from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
            batched_inverse_rank,
        )
        import jax.numpy as jnp
        import numpy as np
        q, _ = np.linalg.qr(rng.normal(size=(2, 30, 30)))
        ev = np.exp(rng.uniform(0, np.log(100), size=(2, 30)))
        m = ((q * ev[:, None, :]) @ np.swapaxes(q, 1, 2)).astype(np.float32)
        x = np.asarray(batched_inverse_rank(
            jnp.asarray(m), rank=4, block=2, interpret=True), np.float64)
        resid = np.max(np.abs(np.eye(30) - x @ m.astype(np.float64)))
        assert resid < 1e-3, resid


def test_stand_qp_fixed_mode_warm_started(rng):
    """The lock-step fixed-iteration stand-QP mode (grf.compute_grf path
    0, fixed): warm-started across ticks, it tracks the f64 optimum
    after a few solves of the same family — a cold start at this
    family's kappa ~1e6 needs ~400 iterations, the warm-started steady
    state far fewer (this is why the production fixed path carries
    qp_warm_x/y in CtrlMem)."""
    for contacts in [(1, 1, 1, 1), (1, 0, 0, 1)]:
        P, q, A, l, u = build_stand_qp(rng, contacts)
        x_ref, _, _, info = qp_ref.solve_qp_ref(P, q, A, l, u, eps=1e-10)
        assert info["converged"]
        # production-style swing elimination (grf.compute_grf path 0)
        s = np.repeat(np.array(contacts, bool), 3)
        P2 = P * np.outer(s, s) + np.diag((~s).astype(np.float64))
        q2 = q * s
        rm = np.concatenate([np.array(contacts, bool),
                             np.repeat(np.array(contacts, bool), 4)])
        l2 = np.where(rm, l, -np.inf)
        u2 = np.where(rm, u, np.inf)
        wx = jnp.zeros(12, jnp.float32)
        wy = jnp.zeros(20, jnp.float32)
        rho = jnp.float32(0.1)
        for _ in range(3):   # warm-started 100-iteration solves + rho carry
            sol = qpx.admm_solve_fixed(
                jnp.asarray(P2, jnp.float32), jnp.asarray(q2, jnp.float32),
                jnp.asarray(A, jnp.float32), jnp.asarray(l2, jnp.float32),
                jnp.asarray(u2, jnp.float32), 100,
                qpx.QPSettings(rho=0.1), x0=wx, y0=wy, rho0=rho)
            wx, wy = sol.x, sol.y
            rho = jnp.clip(sol.rho, 1e-3, 1.0)
        np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=0.3)


def test_small_kkt_inverse_vmappable(rng):
    """_kkt_inverse's small-n route (unrolled GJ) matches f64 inversion
    and runs under vmap (the batched stand-QP bench path)."""
    P, q, A, l, u = build_stand_qp(rng)
    Pb = jnp.broadcast_to(jnp.asarray(P, jnp.float32), (8, 12, 12))
    Ab = jnp.broadcast_to(jnp.asarray(A, jnp.float32), (8, 20, 12))
    rho_vec = jnp.full((8, 20), 0.1, jnp.float32)
    inv_b = jax.vmap(lambda p_, a_, r_: qpx._kkt_inverse(p_, a_, r_, 1e-6)
                     )(Pb, Ab, rho_vec)
    m64 = (P + 1e-6 * np.eye(12)
           + A.T @ (0.1 * np.eye(20)) @ A)
    np.testing.assert_allclose(np.asarray(inv_b[0]), np.linalg.inv(m64),
                               rtol=2e-3, atol=1e-5)
