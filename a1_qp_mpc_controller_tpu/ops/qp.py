"""Dense box-constrained QP solver: OSQP-semantics ADMM in pure JAX.

Solves   minimize 1/2 x'Px + q'x   s.t.  l <= Ax <= u
with the same algorithmic ingredients as the OSQP solver the reference links
(A1RobotControl.cpp:416-431 stand QP, :522-540 warm-started MPC QP):

- modified Ruiz equilibration (diagonal D/E + cost scaling c),
- ADMM splitting with relaxation alpha, regularization sigma, and a
  per-constraint stepsize vector rho (rows with l == u are treated as
  equalities with 1e3x rho; free rows get rho_min — OSQP's convention),
- periodic unscaled-residual termination checks (check_every, like OSQP's
  check_termination=25) and deterministic interval-based adaptive rho
  (OSQP's time-based adaptation is nondeterministic; fixed-interval is the
  reproducible variant),
- warm starting of (x, y).

TPU-first design choices: the single KKT factorization per solve is formed as
an explicit inverse (one 120x120 Cholesky-based inverse on the MXU) so every
ADMM iteration is pure matmul/VPU work with no triangular solves; under
``vmap`` the whole solver becomes batched matmuls over the scenario axis; and
the iteration loop is a ``lax.while_loop`` in checked blocks so single-
scenario latency exits early while batches run lock-step.

This module is the generic dense solver. It is exact-shape static: (n, m)
come from the operands.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.utils import mathx

_HIGH = jax.lax.Precision.HIGHEST

MIN_SCALING = 1e-4
MAX_SCALING = 1e4
RHO_MIN = 1e-6
RHO_MAX = 1e6
RHO_EQ_SCALE = 1e3
RHO_TOL = 1e-4          # |u - l| below this => treat row as equality
ADAPTIVE_RHO_TOL = 5.0  # only change rho when it moves by >= 5x (OSQP)


@dataclasses.dataclass(frozen=True)
class QPSettings:
    """Static solver settings (baked into the jitted computation)."""

    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    max_iter: int = 4000
    check_every: int = 25
    scaling_iters: int = 10
    adaptive_rho: bool = True
    # unroll factor for the inner ADMM iteration loop. Measured on TPU
    # v5e: unroll=1 is fastest (0.1 ms for a 50-iteration 120-var solve);
    # unroll>1 triggers a pathological lowering ~270x slower. Keep 1.
    unroll: int = 1
    # equality-row rho multiplier (OSQP uses 1e3). The Newton-Schulz
    # solver mode sets this to 1 so rho_vec — and therefore the KKT
    # matrix — never jumps when the contact pattern flips.
    rho_eq_scale: float = RHO_EQ_SCALE


class QPSolution(struct.PyTreeNode):
    x: jnp.ndarray          # (n,) primal
    y: jnp.ndarray          # (m,) dual
    z: jnp.ndarray          # (m,) constraint activity Ax
    iters: jnp.ndarray      # () int32
    prim_res: jnp.ndarray   # () unscaled ||Ax - z||_inf
    dual_res: jnp.ndarray   # () unscaled ||Px + q + A'y||_inf
    converged: jnp.ndarray  # () bool
    rho: jnp.ndarray        # () final/estimated rho — carry into the next
    #                            warm-started solve (OSQP keeps rho across
    #                            update* calls)


class ScaledProblem(struct.PyTreeNode):
    P: jnp.ndarray
    q: jnp.ndarray
    A: jnp.ndarray
    l: jnp.ndarray
    u: jnp.ndarray
    d: jnp.ndarray   # (n,) variable scaling D
    e: jnp.ndarray   # (m,) constraint scaling E
    c: jnp.ndarray   # () cost scaling


class Scaling(struct.PyTreeNode):
    """Precomputed equilibration (d, e, c). Scaling is a preconditioner —
    it changes convergence rate, never the fixed point — so for a sequence
    of structurally-similar problems (the MPC at consecutive ticks) it can
    be computed once from a representative instance and reused, instead of
    paying the full Ruiz sweep per solve (measured at ~80% of solve cost
    on TPU at batch 1024)."""

    d: jnp.ndarray   # (n,)
    e: jnp.ndarray   # (m,)
    c: jnp.ndarray   # ()

    @classmethod
    def identity(cls, n: int, m: int, dtype=jnp.float32) -> "Scaling":
        return cls(d=jnp.ones((n,), dtype), e=jnp.ones((m,), dtype),
                   c=jnp.ones((), dtype))


def compute_scaling(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                    l: jnp.ndarray, u: jnp.ndarray,
                    iters: int = 10) -> Scaling:
    sp = ruiz_equilibrate(P, q, A, l, u, iters)
    return Scaling(d=sp.d, e=sp.e, c=sp.c)


def rescale_cost(P: jnp.ndarray, q: jnp.ndarray, s: Scaling) -> Scaling:
    """Recompute the cost normalization ``c`` for THIS instance, keeping
    the precomputed ``d``/``e`` (one O(n^2) pass — Ruiz's final-iteration
    gamma evaluated at the accumulated variable scaling).

    The d/e geometry of the MPC family is stable along a trajectory
    (measured ratio <= 2.6x on a handful of entries), but the cost scale
    is NOT: q grows with tracking error, and a reference-instance c was
    measured 6x too large at a walk-start tick — equivalent to running
    the ADMM at a 6x-wrong stepsize, which stalls a fixed-budget solve
    (30-50 N force transients; < 1 N with the per-instance c).

    Written as a single fused reduction over P (max_i |P_ij| d_i, then
    scale by d_j) rather than materializing d P d — the explicit
    (B, n, n) temporary measured ~2 ms at batch 1024 on v5e."""
    col_p = jnp.mean(
        jnp.max(jnp.abs(P) * s.d[:, None], axis=-2) * s.d)
    norm_q = jnp.max(jnp.abs(s.d * q))
    c = 1.0 / _limit(jnp.maximum(col_p, norm_q))
    return s.replace(c=c)


def apply_scaling(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                  l: jnp.ndarray, u: jnp.ndarray,
                  s: Scaling) -> ScaledProblem:
    """One fused pass applying a precomputed (d, e, c)."""
    return ScaledProblem(
        P=(s.c * P) * (s.d[:, None] * s.d[None, :]),
        q=s.c * s.d * q,
        A=A * (s.e[:, None] * s.d[None, :]),
        l=s.e * l,
        u=s.e * u,
        d=s.d, e=s.e, c=s.c,
    )


def _inf_norm_cols(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(m), axis=0)


def _limit(v: jnp.ndarray) -> jnp.ndarray:
    v = jnp.where(v < MIN_SCALING, jnp.ones_like(v), v)
    return jnp.clip(v, MIN_SCALING, MAX_SCALING)


def ruiz_equilibrate(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                     l: jnp.ndarray, u: jnp.ndarray,
                     iters: int = 10) -> ScaledProblem:
    """Modified Ruiz equilibration (OSQP §5.1): iteratively scale variables by
    1/sqrt(inf-norm of [P;A] columns) and constraints by 1/sqrt(inf-norm of A
    rows), then normalize the cost."""
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    d_acc = jnp.ones((n,), dtype)
    e_acc = jnp.ones((m,), dtype)
    c_acc = jnp.ones((), dtype)

    def body(_, carry):
        P, q, A, d_acc, e_acc, c_acc = carry
        col = jnp.maximum(_inf_norm_cols(P), _inf_norm_cols(A))
        d = 1.0 / jnp.sqrt(_limit(col))
        row = jnp.max(jnp.abs(A), axis=1)
        e = 1.0 / jnp.sqrt(_limit(row))
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = e[:, None] * A * d[None, :]
        d_acc = d_acc * d
        e_acc = e_acc * e
        # cost normalization
        col_p = jnp.mean(_inf_norm_cols(P))
        norm_q = jnp.max(jnp.abs(q))
        gamma = 1.0 / _limit(jnp.maximum(col_p, norm_q))
        P = gamma * P
        q = gamma * q
        c_acc = c_acc * gamma
        return P, q, A, d_acc, e_acc, c_acc

    P, q, A, d_acc, e_acc, c_acc = jax.lax.fori_loop(
        0, iters, body, (P, q, A, d_acc, e_acc, c_acc), unroll=True)
    return ScaledProblem(P=P, q=q, A=A, l=e_acc * l, u=e_acc * u,
                         d=d_acc, e=e_acc, c=c_acc)


def _rho_vec(l: jnp.ndarray, u: jnp.ndarray, rho: jnp.ndarray,
             eq_scale: float = RHO_EQ_SCALE) -> jnp.ndarray:
    """Per-constraint rho: equalities stiffened eq_scale x (OSQP uses 1e3),
    free rows get RHO_MIN (OSQP's rho_vec construction)."""
    eq = (u - l) < RHO_TOL
    loose = jnp.isinf(-l) & jnp.isinf(u)
    rv = jnp.full_like(l, rho)
    rv = jnp.where(eq, eq_scale * rho, rv)
    rv = jnp.where(loose, RHO_MIN, rv)
    return jnp.clip(rv, RHO_MIN, RHO_MAX)


def _kkt_inverse(P: jnp.ndarray, A: jnp.ndarray, rho_vec: jnp.ndarray,
                 sigma: float) -> jnp.ndarray:
    """inv(P + sigma I + A' diag(rho) A) — the one factorization reused
    across all ADMM iterations (as OSQP does).

    n <= 16 (the 12-var stand QP): unrolled no-pivot Gauss-Jordan — a
    chain of vectorized rank-1 updates that stays fast UNDER VMAP, where
    batched LU's tiny-kernel chain is pathological on TPU (several ms at
    (B,28,28), CLAUDE.md). Larger n: jnp.linalg.inv (single-scenario
    adaptive path only; the batched MPC path precomputes the inverse with
    the Pallas GJ kernel and passes it via ``kkt_inv``)."""
    from a1_qp_mpc_controller_tpu.ops.linalg import _gj_inverse_unrolled

    n = P.shape[0]
    m_mat = (P + sigma * jnp.eye(n, dtype=P.dtype)
             + jnp.matmul(A.T * rho_vec[None, :], A, precision=_HIGH))
    if n <= 16:
        return _gj_inverse_unrolled(m_mat)
    return jnp.linalg.inv(m_mat)


@partial(jax.jit, static_argnames=("settings",))
def admm_solve(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
               l: jnp.ndarray, u: jnp.ndarray,
               settings: QPSettings = QPSettings(),
               x0: jnp.ndarray | None = None,
               y0: jnp.ndarray | None = None,
               rho0: jnp.ndarray | None = None,
               scaling: Scaling | None = None,
               kkt_inv: jnp.ndarray | None = None) -> QPSolution:
    """Solve the QP. ``x0``/``y0`` warm-start the (unscaled) primal/dual;
    ``rho0`` (traced scalar) overrides the initial ADMM stepsize — pass the
    previous solve's ``QPSolution.rho`` when iterating over a sequence of
    similar problems. ``scaling`` skips the per-solve Ruiz sweep and applies
    a precomputed equilibration instead. ``kkt_inv`` supplies an externally
    computed inverse of :func:`scaled_kkt_matrix` (same settings/rho0/
    scaling!) and skips the in-solve factorization; it requires
    ``adaptive_rho=False`` (an in-solve rho change would refactorize)."""
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    s = settings

    if scaling is None:
        sp = ruiz_equilibrate(P, q, A, l, u, s.scaling_iters)
    else:
        sp = apply_scaling(P, q, A, l, u, scaling)
    Ps, qs, As, ls, us = sp.P, sp.q, sp.A, sp.l, sp.u

    if x0 is None:
        x = jnp.zeros((n,), dtype)
    else:
        x = x0 / sp.d
    if y0 is None:
        y = jnp.zeros((m,), dtype)
    else:
        y = sp.c * y0 / sp.e
    z = jnp.clip(As @ x, ls, us)

    if rho0 is None:
        rho0 = jnp.asarray(s.rho, dtype)
    else:
        rho0 = jnp.asarray(rho0, dtype)
    rho_vec = _rho_vec(ls, us, rho0, s.rho_eq_scale)
    if kkt_inv is None:
        minv = _kkt_inverse(Ps, As, rho_vec, s.sigma)
    else:
        assert not s.adaptive_rho, "kkt_inv requires adaptive_rho=False"
        minv = kkt_inv

    def admm_block(carry):
        x, y, z, rho_vec, minv = carry

        def one_iter(_, xyz):
            x, y, z = xyz
            rhs = s.sigma * x - qs + jnp.matmul(
                As.T, rho_vec * z - y, precision=_HIGH)
            xt = jnp.matmul(minv, rhs, precision=_HIGH)
            x_next = s.alpha * xt + (1 - s.alpha) * x
            zt = jnp.matmul(As, xt, precision=_HIGH)
            z_pre = s.alpha * zt + (1 - s.alpha) * z
            z_next = jnp.clip(z_pre + y / rho_vec, ls, us)
            y_next = y + rho_vec * (z_pre - z_next)
            return x_next, y_next, z_next

        return jax.lax.fori_loop(0, s.check_every, one_iter, (x, y, z),
                                 unroll=min(s.unroll, s.check_every))

    def unscaled_residuals(x, y, z):
        xu = sp.d * x
        yu = y * sp.e / sp.c
        zu = z / sp.e
        ax = jnp.matmul(A, xu, precision=_HIGH)
        px = jnp.matmul(P, xu, precision=_HIGH)
        aty = jnp.matmul(A.T, yu, precision=_HIGH)
        rp = jnp.max(jnp.abs(ax - zu))
        rd = jnp.max(jnp.abs(px + q + aty))
        eps_prim = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(zu)))
        eps_dual = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(px)), jnp.max(jnp.abs(aty))),
            jnp.max(jnp.abs(q)))
        return rp, rd, eps_prim, eps_dual

    def cond(state):
        _, _, _, _, _, _, it, done, _, _ = state
        return (~done) & (it < s.max_iter)

    def body(state):
        x, y, z, rho_vec, minv, rho, it, done, _, _ = state
        x, y, z = admm_block((x, y, z, rho_vec, minv))
        it = it + s.check_every
        rp, rd, ep, ed = unscaled_residuals(x, y, z)
        done = (rp <= ep) & (rd <= ed)

        if s.adaptive_rho:
            # scaled residual ratio (OSQP compute_rho_estimate)
            ax = jnp.matmul(As, x, precision=_HIGH)
            px = jnp.matmul(Ps, x, precision=_HIGH)
            aty = jnp.matmul(As.T, y, precision=_HIGH)
            div_tol = 1e-12  # division guard (OSQP-style), not _limit
            rp_rel = jnp.max(jnp.abs(ax - z)) / jnp.maximum(jnp.maximum(
                jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z))), div_tol)
            rd_rel = jnp.max(jnp.abs(px + qs + aty)) / jnp.maximum(
                jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                                        jnp.max(jnp.abs(aty))),
                            jnp.max(jnp.abs(qs))), div_tol)
            rho_new = jnp.clip(
                rho * jnp.sqrt(rp_rel / jnp.maximum(rd_rel, div_tol)),
                RHO_MIN, RHO_MAX)
            change = (rho_new > ADAPTIVE_RHO_TOL * rho) | (
                rho_new < rho / ADAPTIVE_RHO_TOL)
            do_update = change & (~done)

            def refactor(_):
                rv = _rho_vec(ls, us, rho_new, s.rho_eq_scale)
                return rho_new, rv, _kkt_inverse(Ps, As, rv, s.sigma)

            def keep(_):
                return rho, rho_vec, minv

            rho, rho_vec, minv = jax.lax.cond(do_update, refactor, keep, None)

        return x, y, z, rho_vec, minv, rho, it, done, rp, rd

    inf = jnp.asarray(jnp.inf, dtype)
    state = (x, y, z, rho_vec, minv, rho0, jnp.int32(0),
             jnp.asarray(False), inf, inf)
    x, y, z, rho_vec, minv, rho, it, done, rp, rd = jax.lax.while_loop(
        cond, body, state)

    # final rho estimate (scaled residual ratio, no 5x threshold) so callers
    # can carry a tuned stepsize into the next warm-started solve
    rho_est = _rho_estimate(Ps, qs, As, x, y, z, rho)

    return QPSolution(
        x=sp.d * x, y=y * sp.e / sp.c, z=z / sp.e,
        iters=it, prim_res=rp, dual_res=rd, converged=done, rho=rho_est)


def _kkt_matrix(P: jnp.ndarray, A: jnp.ndarray, rho_vec: jnp.ndarray,
                sigma: float) -> jnp.ndarray:
    n = P.shape[0]
    return (P + sigma * jnp.eye(n, dtype=P.dtype)
            + jnp.matmul(A.T * rho_vec[None, :], A, precision=_HIGH))


def scaled_kkt_matrix(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                      l: jnp.ndarray, u: jnp.ndarray,
                      settings: QPSettings, rho0: jnp.ndarray,
                      scaling: Scaling) -> jnp.ndarray:
    """The KKT matrix admm_solve would factorize for this problem — for
    callers that compute the inverse externally (e.g. the Pallas batched
    Gauss-Jordan kernel, which must run outside vmap) and pass it back via
    ``kkt_inv``. Must use the same settings/rho0/scaling as the solve."""
    sp = apply_scaling(P, q, A, l, u, scaling)
    rho_vec = _rho_vec(sp.l, sp.u, rho0, settings.rho_eq_scale)
    return _kkt_matrix(sp.P, sp.A, rho_vec, settings.sigma)


@partial(jax.jit, static_argnames=("n_r", "big_capacity", "block",
                                   "small_block", "interpret"))
def reduced_kkt_inverse(m_b: jnp.ndarray, live: jnp.ndarray,
                        n_r: int = 64, big_capacity: int = 256,
                        block: int = 32, small_block: int = 64,
                        interpret: bool = False) -> jnp.ndarray:
    """Inverse of the swing-eliminated KKT family via contact-pattern
    shape reduction — the structural attack on the batched 120x120
    Gauss-Jordan wall (11.2 ms at batch 1024, docs/ROADMAP.md).

    The eliminated family (srb.eliminate_swing; the gating that makes
    swing variables dead is the reference's contact-flag bound gating,
    /root/reference ConvexMpc.cpp:228-245) has EXACT structure:

    - zero coupling between live (stance) and dead (swing) variables
      (the cost build masks B_qp columns, so P live-dead entries are
      exact zeros; the friction-cone A'rho A term is block-diagonal per
      (step, leg) 3x3 and all three components of a leg share liveness);
    - the dead-dead part is 3x3 block-diagonal.

    So K^-1 = scatter(inv(gather_live(K))) (+) dead 3x3 inverses. In a
    trot, n_live = 60 of 120 — the live solve fits a static (n_r=64)
    Gauss-Jordan whose per-pivot VPU pass is (64,128) instead of
    (128,128) and whose pivot count is 64 instead of 120: ~3.7x less
    kernel work. Scenarios with n_live > n_r (3-4 stance legs: stand
    phase, early-contact ticks) are gathered into a ``big_capacity``
    bucket and inverted at full size; if MORE than ``big_capacity``
    scenarios exceed n_r in one tick, the whole batch falls back to the
    full-size kernel (lax.cond — correctness never depends on the
    capacity guess).

    ``live``: (B, n) bool — stance-variable mask (tile(repeat(contacts,
    3), horizon)). Requires n % 3 == 0 (per-leg 3-component blocks).
    """
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_small,
    )

    b, n, _ = m_b.shape
    assert n % 3 == 0
    dtype = m_b.dtype
    if big_capacity >= b or n_r >= n:
        return batched_inverse(m_b, block=block, interpret=interpret)

    n_live = jnp.sum(live, axis=1)                          # (B,)

    def reduced_path():
        # live-first stable permutation; the first n_r entries index the
        # reduced system (for n_live < n_r the tail picks up dead
        # columns, whose junk inverse is masked out below)
        order = jnp.argsort(jnp.where(live, 0, 1), axis=1,
                            stable=True)                    # (B, n)
        idx = order[:, :n_r]                                # (B, n_r)
        onehot = jax.nn.one_hot(idx, n, dtype=dtype)        # (B,n_r,n)
        ke = jnp.einsum("bri,bij->brj", onehot, m_b,
                        precision=_HIGH)                    # (B, n_r, n)
        k_red = jnp.einsum("brj,bsj->brs", ke, onehot,
                           precision=_HIGH)                 # (B,n_r,n_r)
        l_inv = batched_inverse_small(k_red, block=small_block,
                                      interpret=interpret)
        le = jnp.einsum("brs,bsj->brj", l_inv, onehot,
                        precision=_HIGH)                    # (B, n_r, n)
        out = jnp.einsum("bri,brj->bij", onehot, le,
                         precision=_HIGH)                   # (B, n, n)
        lm = live.astype(dtype)
        out = out * (lm[:, :, None] * lm[:, None, :])
        # dead 3x3 diagonal blocks, closed-form inverse, placed back
        nblk = n // 3
        m5 = m_b.reshape(b, nblk, 3, nblk, 3)
        diag_blocks = jnp.einsum("btitj->btij", m5)         # (B,T,3,3)
        dead_blk = (~live[:, ::3]).astype(dtype)            # (B, T)
        dinv = mathx.inv3_spd(diag_blocks) * dead_blk[:, :, None, None]
        eye_t = jnp.eye(nblk, dtype=dtype)
        out = out + (dinv[:, :, :, None, :]
                     * eye_t[None, :, None, :, None]).reshape(b, n, n)

        # full-size bucket: the big_capacity scenarios with the most
        # live variables (covers every n_live > n_r scenario — the
        # overflow case takes the other cond branch)
        _, big_idx = jax.lax.top_k(n_live, big_capacity)
        big_inv = batched_inverse(jnp.take(m_b, big_idx, axis=0),
                                  block=block, interpret=interpret)
        return out.at[big_idx].set(big_inv)

    # all reduced-path work lives INSIDE the cond branch: ticks where
    # the capacity would overflow (e.g. a stand phase — most scenarios
    # 4-stance) pay exactly the full-size kernel, nothing more
    overflow = jnp.sum((n_live > n_r).astype(jnp.int32)) > big_capacity
    return jax.lax.cond(
        overflow,
        lambda: batched_inverse(m_b, block=block, interpret=interpret),
        reduced_path)


def newton_schulz_inverse(m_mat: jnp.ndarray, seed: jnp.ndarray,
                          iters: int) -> jnp.ndarray:
    """Iteratively (re)compute M^-1 with Newton-Schulz: X <- X(2I - M X).

    Pure batched-GEMM work (MXU-shaped). ``seed`` is a prior inverse; if
    its residual ||I - seed M||_inf >= 1 the iteration restarts from the
    always-convergent cold seed M' / (||M||_1 ||M||_inf).

    WARNING (measured): in float32 this iteration is backward-unstable at
    the MPC KKT matrix's conditioning (kappa ~ 2.5e4 after equilibration) —
    one step DEGRADES a near-exact seed from residual 2e-3 to 4e-1. It is
    therefore NOT used in the controller (see CLAUDE.md); kept for
    well-conditioned use cases and as a documented negative result.
    """
    n = m_mat.shape[-1]
    eye = jnp.eye(n, dtype=m_mat.dtype)
    cold = m_mat.T / jnp.maximum(
        jnp.max(jnp.sum(jnp.abs(m_mat), axis=0))
        * jnp.max(jnp.sum(jnp.abs(m_mat), axis=1)), 1e-12)
    resid = jnp.max(jnp.abs(
        eye - jnp.matmul(seed, m_mat, precision=_HIGH)))
    x = jnp.where(resid < 0.9, seed, cold)

    def body(_, x):
        mx = jnp.matmul(m_mat, x, precision=_HIGH)
        return 2.0 * x - jnp.matmul(x, mx, precision=_HIGH)

    return jax.lax.fori_loop(0, iters, body, x)


def _rho_estimate(Ps, qs, As, x, y, z, rho):
    """OSQP's compute_rho_estimate on scaled iterates (no 5x threshold)."""
    ax = jnp.matmul(As, x, precision=_HIGH)
    px = jnp.matmul(Ps, x, precision=_HIGH)
    aty = jnp.matmul(As.T, y, precision=_HIGH)
    div_tol = 1e-12
    rp_rel = jnp.max(jnp.abs(ax - z)) / jnp.maximum(jnp.maximum(
        jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(z))), div_tol)
    rd_rel = jnp.max(jnp.abs(px + qs + aty)) / jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                                jnp.max(jnp.abs(aty))),
                    jnp.max(jnp.abs(qs))), div_tol)
    return jnp.clip(rho * jnp.sqrt(rp_rel / jnp.maximum(rd_rel, div_tol)),
                    RHO_MIN, RHO_MAX)


@partial(jax.jit, static_argnames=("iters", "settings", "block",
                                   "interpret"))
def admm_solve_fixed_batched(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                             l: jnp.ndarray, u: jnp.ndarray, iters: int,
                             settings: QPSettings,
                             x0: jnp.ndarray, y0: jnp.ndarray,
                             rho0: jnp.ndarray, scaling: Scaling,
                             kkt_inv: jnp.ndarray, block: int = 16,
                             interpret: bool = False) -> QPSolution:
    """Batched fixed-iteration solve via the fused-ADMM Pallas kernel.

    All operands carry a leading batch axis B; ``kkt_inv`` is the inverse
    of :func:`scaled_kkt_matrix` per scenario (same settings/rho0/scaling).
    Numerically the same iteration as ``vmap(admm_solve_fixed)`` — only
    the execution schedule differs: the whole ADMM loop runs inside one
    Pallas kernel, scenario-blocks resident in VMEM (see
    ops/pallas_kernels.fused_admm), instead of iteration-major XLA batched
    matvecs that re-read the KKT inverse from HBM every iteration.
    """
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import fused_admm

    s = settings
    sp = jax.vmap(apply_scaling, in_axes=(0, 0, 0, 0, 0, 0))(
        P, q, A, l, u, scaling)
    xs = x0 / sp.d
    ys = sp.c[:, None] * y0 / sp.e
    zs = jnp.clip(jnp.einsum("bmn,bn->bm", sp.A, xs, precision=_HIGH),
                  sp.l, sp.u)
    rho_vec = jax.vmap(_rho_vec, in_axes=(0, 0, 0, None))(
        sp.l, sp.u, rho0, s.rho_eq_scale)

    x, y, z = fused_admm(kkt_inv, sp.A, sp.q, sp.l, sp.u, rho_vec,
                         xs, ys, zs, iters=iters, sigma=s.sigma,
                         alpha=s.alpha, block=block, interpret=interpret)

    def finish(sp_i, P_i, q_i, A_i, x_i, y_i, z_i, rho_i):
        xu = sp_i.d * x_i
        yu = y_i * sp_i.e / sp_i.c
        zu = z_i / sp_i.e
        ax = jnp.matmul(A_i, xu, precision=_HIGH)
        px = jnp.matmul(P_i, xu, precision=_HIGH)
        aty = jnp.matmul(A_i.T, yu, precision=_HIGH)
        rp = jnp.max(jnp.abs(ax - zu))
        rd = jnp.max(jnp.abs(px + q_i + aty))
        eps_prim = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(ax)), jnp.max(jnp.abs(zu)))
        eps_dual = s.eps_abs + s.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(px)), jnp.max(jnp.abs(aty))),
            jnp.max(jnp.abs(q_i)))
        rho_est = _rho_estimate(sp_i.P, sp_i.q, sp_i.A, x_i, y_i, z_i,
                                rho_i)
        return QPSolution(
            x=xu, y=yu, z=zu, iters=jnp.int32(iters), prim_res=rp,
            dual_res=rd, converged=(rp <= eps_prim) & (rd <= eps_dual),
            rho=rho_est)

    return jax.vmap(finish)(sp, P, q, A, x, y, z, rho0)


@partial(jax.jit, static_argnames=("iters", "settings", "block",
                                   "interpret"))
def admm_solve_fixed_batched_shared(
        P: jnp.ndarray, q: jnp.ndarray, a0: jnp.ndarray, a1: jnp.ndarray,
        mu: jnp.ndarray, l: jnp.ndarray, u: jnp.ndarray, iters: int,
        settings: QPSettings, x0: jnp.ndarray, y0: jnp.ndarray,
        rho0: jnp.ndarray, scaling: Scaling, kkt_inv: jnp.ndarray,
        block: int = 32, interpret: bool = False) -> QPSolution:
    """Batched fixed-iteration solve for constraint matrices of the
    shared-basis form A_s = A0 + mu_s * A1 (A0/A1 constant across the
    batch — the friction-cone structure of both the MPC and the stand QP,
    srb.friction_constraint_basis). The per-scenario (m, n) matrix is
    never materialized; every A-product rides the MXU as a
    scenario-rows x shared-matrix matmul (ops/pallas_kernels.
    fused_admm_shared). Same iterates as ``vmap(admm_solve_fixed)`` up to
    f32 accumulation order."""
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        fused_admm_shared,
    )

    s = settings
    d, e, c = scaling.d, scaling.e, scaling.c
    Ps = (c[:, None, None] * P) * (d[:, :, None] * d[:, None, :])
    qs = c[:, None] * d * q
    ls = e * l
    us = e * u

    def amul(x):       # (B,n) -> (B,m): (A0 + mu A1) x, shared GEMMs
        return (jnp.einsum("bn,mn->bm", x, a0, precision=_HIGH)
                + mu[:, None] * jnp.einsum("bn,mn->bm", x, a1,
                                           precision=_HIGH))

    def atmul(w):      # (B,m) -> (B,n): (A0 + mu A1)' w
        return (jnp.einsum("bm,mn->bn", w, a0, precision=_HIGH)
                + jnp.einsum("bm,mn->bn", mu[:, None] * w, a1,
                             precision=_HIGH))

    xs = x0 / d
    ys = c[:, None] * y0 / e
    zs = jnp.clip(e * amul(x0), ls, us)   # d * xs == x0
    rho_vec = jax.vmap(_rho_vec, in_axes=(0, 0, 0, None))(
        ls, us, rho0, s.rho_eq_scale)

    x, y, z = fused_admm_shared(a0, a1, kkt_inv, mu, d, e, qs, ls, us,
                                rho_vec, xs, ys, zs, iters=iters,
                                sigma=s.sigma, alpha=s.alpha, block=block,
                                interpret=interpret)

    # unscale + residuals + rho estimate (shared-GEMM A products)
    xu = d * x
    yu = y * e / c[:, None]
    zu = z / e
    ax = amul(xu)
    px = jnp.einsum("bij,bj->bi", P, xu, precision=_HIGH)
    aty = atmul(yu)
    inf_b = lambda v: jnp.max(jnp.abs(v), axis=1)
    rp = inf_b(ax - zu)
    rd = inf_b(px + q + aty)
    eps_prim = s.eps_abs + s.eps_rel * jnp.maximum(inf_b(ax), inf_b(zu))
    eps_dual = s.eps_abs + s.eps_rel * jnp.maximum(
        jnp.maximum(inf_b(px), inf_b(aty)), inf_b(q))

    # scaled-space products for the rho estimate
    ax_s = e * amul(d * x)
    px_s = jnp.einsum("bij,bj->bi", Ps, x, precision=_HIGH)
    aty_s = d * atmul(e * y)
    div_tol = 1e-12
    rp_rel = inf_b(ax_s - z) / jnp.maximum(
        jnp.maximum(inf_b(ax_s), inf_b(z)), div_tol)
    rd_rel = inf_b(px_s + qs + aty_s) / jnp.maximum(jnp.maximum(
        jnp.maximum(inf_b(px_s), inf_b(aty_s)), inf_b(qs)), div_tol)
    rho_est = jnp.clip(
        rho0 * jnp.sqrt(rp_rel / jnp.maximum(rd_rel, div_tol)),
        RHO_MIN, RHO_MAX)

    return QPSolution(
        x=xu, y=yu, z=zu,
        iters=jnp.full((P.shape[0],), iters, jnp.int32),
        prim_res=rp, dual_res=rd,
        converged=(rp <= eps_prim) & (rd <= eps_dual), rho=rho_est)


def scaled_kkt_matrix_shared(P: jnp.ndarray, a0: jnp.ndarray,
                             a1: jnp.ndarray, mu: jnp.ndarray,
                             l: jnp.ndarray, u: jnp.ndarray,
                             settings: QPSettings, rho0: jnp.ndarray,
                             scaling: Scaling) -> jnp.ndarray:
    """Batched scaled KKT matrix for shared-basis constraints, built as
    ONE batched GEMM: K = Ps + sigma I + G' diag(rho e^2) G with
    G = (A0 + mu A1) diag(d). Matches vmap(scaled_kkt_matrix) without
    materializing per-scenario A."""
    d, e, c = scaling.d, scaling.e, scaling.c
    n = P.shape[-1]
    Ps = (c[:, None, None] * P) * (d[:, :, None] * d[:, None, :])
    ls = e * l
    us = e * u
    rho_vec = jax.vmap(_rho_vec, in_axes=(0, 0, 0, None))(
        ls, us, rho0, settings.rho_eq_scale)
    g = (a0[None] + mu[:, None, None] * a1[None]) * d[:, None, :]
    w = rho_vec * e * e
    gw = g * w[:, :, None]
    return (Ps + settings.sigma * jnp.eye(n, dtype=P.dtype)[None]
            + jnp.einsum("bmi,bmj->bij", g, gw, precision=_HIGH))


def scaled_kkt_matrix_blockdiag(P: jnp.ndarray, base_blk: jnp.ndarray,
                                slope_blk: jnp.ndarray, mu: jnp.ndarray,
                                l: jnp.ndarray, u: jnp.ndarray,
                                settings: QPSettings, rho0: jnp.ndarray,
                                scaling: Scaling) -> jnp.ndarray:
    """Same result as :func:`scaled_kkt_matrix_shared`, exploiting that
    the friction-cone constraint matrix is BLOCK-DIAGONAL: per (step,leg)
    block t, A' diag(w) A contributes one 3x3 block
    blk(mu)' diag(w_t) blk(mu) on the KKT diagonal (blk = base + mu*slope,
    srb.friction_basis_blocks). Replaces the dense (B,200,120)x(B,200,120)
    contraction (~6 GFLOP at B=1024, measured 2.9 ms) with B x 40 tiny
    3x3 products (~1 MFLOP) + one broadcast placement."""
    d, e, c = scaling.d, scaling.e, scaling.c
    b, n = P.shape[0], P.shape[-1]
    nblk = n // 3
    dtype = P.dtype
    Ps = (c[:, None, None] * P) * (d[:, :, None] * d[:, None, :])
    ls = e * l
    us = e * u
    rho_vec = jax.vmap(_rho_vec, in_axes=(0, 0, 0, None))(
        ls, us, rho0, settings.rho_eq_scale)
    w = (rho_vec * e * e).reshape(b, nblk, 5)               # (B,T,5)
    blk = base_blk[None] + mu[:, None, None] * slope_blk[None]  # (B,5,3)
    wblk = w[:, :, :, None] * blk[:, None, :, :]            # (B,T,5,3)
    blocks = jnp.einsum("brc,btrq->btcq", blk, wblk,
                        precision=_HIGH)                    # (B,T,3,3)
    # scale by d on both sides (G = A diag(d))
    d3 = d.reshape(b, nblk, 3)
    blocks = blocks * d3[:, :, :, None] * d3[:, :, None, :]
    # place on the (B,n,n) diagonal: (B,T,3,T,3) masked broadcast
    eye_t = jnp.eye(nblk, dtype=dtype)
    bd = (blocks[:, :, :, None, :]
          * eye_t[None, :, None, :, None]).reshape(b, n, n)
    return Ps + settings.sigma * jnp.eye(n, dtype=dtype)[None] + bd


@partial(jax.jit, static_argnames=("iters", "settings"))
def admm_solve_fixed(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                     l: jnp.ndarray, u: jnp.ndarray, iters: int,
                     settings: QPSettings = QPSettings(),
                     x0: jnp.ndarray | None = None,
                     y0: jnp.ndarray | None = None,
                     rho0: jnp.ndarray | None = None,
                     scaling: Scaling | None = None,
                     kkt_inv: jnp.ndarray | None = None) -> QPSolution:
    """Fixed-iteration variant (no early exit, no in-solve adaptation): the
    batched throughput path. All scenarios run lock-step; iteration count is
    chosen by the caller. The returned ``rho`` is the post-solve estimate —
    carrying it into the next tick's ``rho0`` gives cross-tick adaptation
    without per-solve refactorization."""
    s = dataclasses.replace(settings, max_iter=iters, check_every=iters,
                            adaptive_rho=False)
    return admm_solve(P, q, A, l, u, s, x0, y0, rho0, scaling, kkt_inv)


