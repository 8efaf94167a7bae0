"""Float64 NumPy reference QP solver + KKT verification.

Stands in for the reference's external OSQP dependency as ground truth (OSQP
is not available in this environment): the same ADMM algorithm as
``ops/qp.py`` run in float64 to tight tolerances, plus an independent KKT
checker. Because a strictly convex QP has a unique solution, verifying the
KKT conditions validates a solution independently of which solver produced
it — this is the basis of the "bit-tolerant match" gate (BASELINE.md).

CPU/test-side only; never traced.
"""

from __future__ import annotations

import numpy as np

MIN_SCALING = 1e-4
MAX_SCALING = 1e4


def _limit(v):
    v = np.where(v < MIN_SCALING, 1.0, v)
    return np.clip(v, MIN_SCALING, MAX_SCALING)


def ruiz(P, q, A, l, u, iters=10):
    n, m = P.shape[0], A.shape[0]
    d_acc, e_acc, c_acc = np.ones(n), np.ones(m), 1.0
    for _ in range(iters):
        col = np.maximum(np.abs(P).max(0), np.abs(A).max(0))
        d = 1.0 / np.sqrt(_limit(col))
        e = 1.0 / np.sqrt(_limit(np.abs(A).max(1)))
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = e[:, None] * A * d[None, :]
        d_acc *= d
        e_acc *= e
        gamma = 1.0 / _limit(max(np.mean(np.abs(P).max(0)),
                                 np.abs(q).max(initial=0.0)))
        P *= gamma
        q *= gamma
        c_acc *= gamma
    return P, q, A, e_acc * l, e_acc * u, d_acc, e_acc, c_acc


def solve_qp_ref(P, q, A, l, u, *, rho=0.1, sigma=1e-6, alpha=1.6,
                 eps=1e-9, max_iter=200000, x0=None, y0=None):
    """High-accuracy float64 ADMM solve. Returns (x, y, z, info)."""
    P = np.asarray(P, np.float64)
    q = np.asarray(q, np.float64)
    A = np.asarray(A, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    P0, q0, A0, l0, u0 = P, q, A, l, u
    P, q, A, l, u, D, E, c = ruiz(P, q, A, l, u)
    n, m = P.shape[0], A.shape[0]

    eq = (u - l) < 1e-4
    loose = np.isneginf(l) & np.isposinf(u)
    rho_vec = np.full(m, rho)
    rho_vec[eq] = 1e3 * rho
    rho_vec[loose] = 1e-6

    x = np.zeros(n) if x0 is None else np.asarray(x0) / D
    y = np.zeros(m) if y0 is None else c * np.asarray(y0) / E
    z = np.clip(A @ x, l, u)

    def factor(rv):
        M = P + sigma * np.eye(n) + (A.T * rv) @ A
        return np.linalg.inv(M)

    Minv = factor(rho_vec)
    it = 0
    rp = rd = np.inf
    while it < max_iter:
        for _ in range(25):
            rhs = sigma * x - q + A.T @ (rho_vec * z - y)
            xt = Minv @ rhs
            x = alpha * xt + (1 - alpha) * x
            zt = A @ xt
            z_pre = alpha * zt + (1 - alpha) * z
            z_new = np.clip(z_pre + y / rho_vec, l, u)
            y = y + rho_vec * (z_pre - z_new)
            z = z_new
        it += 25
        # unscaled residuals
        xu, yu, zu = D * x, y * E / c, z / E
        ax, px, aty = A0 @ xu, P0 @ xu, A0.T @ yu
        rp = np.abs(ax - zu).max()
        rd = np.abs(px + q0 + aty).max()
        ep = eps + eps * max(np.abs(ax).max(), np.abs(zu).max())
        ed = eps + eps * max(np.abs(px).max(), np.abs(aty).max(),
                             np.abs(q0).max())
        if rp <= ep and rd <= ed:
            break
        # adaptive rho (division guard 1e-12, like OSQP's division tol —
        # NOT _limit, which would clamp tiny residuals up to 1)
        rp_s = np.abs(A @ x - z).max() / max(
            np.abs(A @ x).max(), np.abs(z).max(), 1e-12)
        rd_s = np.abs(P @ x + q + A.T @ y).max() / max(
            np.abs(P @ x).max(), np.abs(A.T @ y).max(),
            np.abs(q).max(), 1e-12)
        rho_new = np.clip(rho * np.sqrt(rp_s / max(rd_s, 1e-12)), 1e-6, 1e6)
        if rho_new > 5 * rho or rho_new < rho / 5:
            rho = rho_new
            rho_vec = np.full(m, rho)
            rho_vec[eq] = 1e3 * rho
            rho_vec[loose] = 1e-6
            Minv = factor(rho_vec)

    info = dict(iters=it, prim_res=rp, dual_res=rd,
                converged=bool(rp <= ep and rd <= ed))
    return D * x, y * E / c, z / E, info


def kkt_residuals(P, q, A, l, u, x, y):
    """Independent KKT check: returns (stationarity, primal feasibility,
    complementarity) inf-norms. All ~0 at an exact solution."""
    P = np.asarray(P, np.float64)
    A = np.asarray(A, np.float64)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    ax = A @ x
    stat = np.abs(P @ x + np.asarray(q, np.float64) + A.T @ y).max()
    prim = np.maximum(ax - np.asarray(u), 0.0)
    prim = np.maximum(prim, np.maximum(np.asarray(l) - ax, 0.0))
    prim = prim.max(initial=0.0)
    # complementarity: y+ * (u - Ax) = 0, y- * (Ax - l) = 0
    yp, ym = np.maximum(y, 0.0), np.maximum(-y, 0.0)
    u_fin = np.where(np.isposinf(u), ax, np.asarray(u, np.float64))
    l_fin = np.where(np.isneginf(l), ax, np.asarray(l, np.float64))
    comp_u = np.where(np.isposinf(u), 0.0, yp * np.abs(u_fin - ax))
    comp_l = np.where(np.isneginf(l), 0.0, ym * np.abs(ax - l_fin))
    comp = max(comp_u.max(initial=0.0), comp_l.max(initial=0.0))
    return stat, prim, comp
