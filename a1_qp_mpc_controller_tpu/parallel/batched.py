"""Batched, sharded closed-loop evaluation: the pod-scale execution profile.

Domain randomization (mass / inertia / friction / gains / gait / terrain,
per BASELINE.json config 5) produces a batch of scenarios; the whole
controller+plant loop is vmapped over the batch and the batch axis is
sharded over the device mesh. Each chip owns its scenario block — the only
cross-chip communication is the metric reduction at the end (psum-style
means handled by jit on sharded arrays).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.control.controller import control_tick
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import JoyCmd


def batched_control_tick(cfg: A1Config, params_b, cs_b, mem_b, sensors_b,
                         joy: JoyCmd, dt: jnp.ndarray, *,
                         kkt_block: int = 8, use_pallas: bool = False,
                         admm_backend: str = "xla",
                         admm_block: int = 16,
                         kkt_backend: str = "gj",
                         kkt_reduced_nr: int = 64,
                         kkt_big_capacity: int = 256,
                         rescue_capacity: int = 0,
                         rescue_iters: int = 25,
                         kkt_carry: "KktCarry | None" = None,
                         kkt_amortize_capacity: int = 192,
                         kkt_refine_order: int = 2,
                         return_stats: bool = False,
                         interpret: bool = False):
    """One batched MPC control tick with the KKT factorization (and
    optionally the whole ADMM loop) hoisted out of vmap.

    Numerically equivalent to ``vmap(control_tick)`` (same scaled KKT
    matrix, same ADMM iterations) — only the execution schedule differs.
    Requires cfg.mpc_solver_mode == 'fixed'.

    ``use_pallas`` selects the Pallas GJ inverse on the legacy
    (non-shared) route, whose default is vmap'ed XLA inversion — that
    route exists for equivalence testing; production throughput uses
    ``admm_backend='pallas_shared'``.
    ``admm_backend='pallas'`` runs the ADMM iterations in the fused
    scenario-resident Pallas kernel (ops/pallas_kernels.fused_admm)
    with ``admm_block`` scenarios per grid step.
    ``kkt_backend`` picks the solver route under 'pallas_shared':
    'amortized' (round 5: cross-tick amortized factorization — the
    batched inverse refreshes only contact-flipped/aged scenarios each
    tick and every other scenario reuses its carried inverse corrected
    by a truncated Neumann series; requires threading a ``kkt_carry``
    and returns the updated carry after the torque tuple; see
    _amortized_full_solve),
    'reduced_admm' (round-4 production: contact-pattern shape reduction
    of the WHOLE solve — KKT inverse AND fused-ADMM iterations at the
    gathered stance-block size, with rescue passes;
    _reduced_shared_solve),
    'reduced' (shape reduction of the inverse only — live-block gather
    to a static ``kkt_reduced_nr``-var Gauss-Jordan, full-size kernel
    only on the ``kkt_big_capacity`` scenarios with the most stance
    legs, overflow-safe; see ops/qp.reduced_kkt_inverse), 'gj'
    (flat batch-leading Gauss-Jordan at full size), 'chol' (pure-XLA
    blocked Cholesky — numerically strongest, ~30% slower), 'sweep_t' /
    'gj_t' (transposed batch-in-lanes kernels — retired negative
    results: this image's Mosaic crashes on lane-dim grids, so they
    only run single-block; see docs/ROADMAP.md), or 'schur' (recursive
    Schur-complement block inversion — numerically unsafe on the KKT
    family, benchmark only).
    """
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.control.controller import (
        control_tick_build, control_tick_finish,
    )
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_sweep_T_masked,
        batched_inverse_T, spd_block_inverse,
    )

    assert cfg.mpc_solver_mode == "fixed"
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)

    with_a = admm_backend != "pallas_shared"
    cs, mem, prob = jax.vmap(
        lambda p, c, m, s: control_tick_build(cfg, p, c, m, s, joy, dt,
                                              with_a_mat=with_a)
    )(params_b, cs_b, mem_b, sensors_b)
    # per-scenario equilibration: contact-pattern-matched d/e (a gather
    # from the 16-entry table) + per-instance cost normalization
    scal = jax.vmap(
        lambda t, c, p, q: qpx.rescale_cost(
            p, q, grf.scaling_for_contacts(t, c))
    )(mem.mpc_scaling_table, cs.contacts, prob.p_mat, prob.q_vec)

    if admm_backend == "pallas_shared" and kkt_backend == "amortized":
        # cross-tick amortized factorization (round-5): requires the
        # caller to thread a KktCarry through the tick sequence; returns
        # it after the torque tuple. See _amortized_full_solve.
        assert kkt_carry is not None, \
            "kkt_backend='amortized' needs a threaded kkt_carry " \
            "(parallel.batched.make_kkt_carry)"
        sol, kcarry = _amortized_full_solve(
            cfg, prob, scal, params_b.mu_mpc, settings, kkt_carry,
            capacity=kkt_amortize_capacity, admm_block=admm_block,
            kkt_block=kkt_block, rescue_capacity=rescue_capacity,
            rescue_iters=rescue_iters, refine_order=kkt_refine_order,
            polish_due=polish_due_mask(cfg, mem),
            interpret=interpret)
        out = jax.vmap(
            lambda p, c, m, s: control_tick_finish(cfg, p, c, m, s)
        )(params_b, cs, mem, sol)
        if return_stats:
            stats = {"converged": sol.converged,
                     "prim_res": sol.prim_res, "dual_res": sol.dual_res}
            return out + (kcarry, stats)
        return out + (kcarry,)

    if admm_backend == "pallas_shared" and kkt_backend == "reduced_admm":
        sol = _reduced_shared_solve(
            cfg, prob, scal, params_b.mu_mpc, cs.contacts,
            settings, reduced_blocks=max(2, (kkt_reduced_nr + 2) // 3),
            big_capacity=kkt_big_capacity, admm_block=admm_block,
            kkt_block=kkt_block, rescue_capacity=rescue_capacity,
            rescue_iters=rescue_iters,
            polish_due=polish_due_mask(cfg, mem), interpret=interpret)
        out = jax.vmap(
            lambda p, c, m, s: control_tick_finish(cfg, p, c, m, s)
        )(params_b, cs, mem, sol)
        if return_stats:
            stats = {"converged": sol.converged,
                     "prim_res": sol.prim_res, "dual_res": sol.dual_res}
            return out + (stats,)
        return out

    if admm_backend == "pallas_shared":
        # fully shared-structure route: per-scenario constraint matrices
        # are never materialized; KKT assembly is one batched GEMM, the
        # inverse is the Gauss-Jordan kernel (measured faster than both
        # batched LU (5x) and the sweep kernel (2x) on v5e), the ADMM
        # loop is the MXU-shaped fused kernel.
        a0, a1 = srb.friction_constraint_basis(cfg.horizon,
                                               prob.p_mat.dtype)
        mu = params_b.mu_mpc
        base_blk, slope_blk = srb.friction_basis_blocks(prob.p_mat.dtype)
        m_b = qpx.scaled_kkt_matrix_blockdiag(
            prob.p_mat, base_blk, slope_blk, mu, prob.lb, prob.ub,
            settings, prob.rho0, scal)
        if kkt_backend == "reduced":
            live = jnp.tile(jnp.repeat(cs.contacts, 3, axis=1),
                            (1, cfg.horizon))               # (B, H*12)
            minv = qpx.reduced_kkt_inverse(
                m_b, live, n_r=kkt_reduced_nr,
                big_capacity=kkt_big_capacity, block=kkt_block,
                interpret=interpret)
        elif kkt_backend == "chol":
            # pure-XLA blocked Cholesky inverse (batched GEMMs): the
            # numerically-sound MXU route — stable on this family where
            # Schur recursion is not (ops/linalg.spd_cholesky_inverse)
            from a1_qp_mpc_controller_tpu.ops.linalg import (
                spd_cholesky_inverse,
            )
            minv = spd_cholesky_inverse(m_b, panel=30)
        elif kkt_backend == "schur":
            minv = spd_block_inverse(m_b, base=32, block=max(kkt_block, 64),
                                     interpret=interpret)
        elif kkt_backend == "sweep_t":
            # the lane-dim block must be a multiple of 128 on hardware
            # (small-batch interpret tests may use the batch size); the
            # masked row-carry kernel is the variant with no dynamic
            # ref indexing, which this Mosaic build rejects outright
            sblk = 128 if not interpret else min(128, m_b.shape[0])
            minv = batched_inverse_sweep_T_masked(m_b, sblock=sblk,
                                                  interpret=interpret)
        elif kkt_backend == "gj_t":
            sblk = 128 if not interpret else min(64, m_b.shape[0])
            minv = batched_inverse_T(m_b, sblock=sblk,
                                     interpret=interpret)
        else:
            minv = batched_inverse(m_b, block=kkt_block,
                                   interpret=interpret)
        sol = qpx.admm_solve_fixed_batched_shared(
            prob.p_mat, prob.q_vec, a0, a1, mu, prob.lb, prob.ub,
            cfg.mpc_qp_iters, settings, prob.warm_x, prob.warm_y,
            prob.rho0, scal, minv, block=admm_block,
            interpret=interpret)
        if rescue_capacity > 0:
            # flip-rescue second pass: contact-flip ticks are where a
            # fixed budget falls short (the reference's OSQP simply
            # iterates to tolerance every tick,
            # A1RobotControl.cpp:522-540); instead of paying extra
            # iterations on every scenario, gather the worst
            # ``rescue_capacity`` unconverged scenarios, continue THEIR
            # solve for ``rescue_iters`` more iterations (same KKT
            # inverse — the rescue reuses rho0, so no refactorization),
            # and scatter back. Already-converged scenarios keep their
            # bit-identical first-pass solution.
            need = (~sol.converged) | prob.rescue_flag
            score = need.astype(prob.q_vec.dtype) * (
                1.0 + jnp.maximum(sol.prim_res, sol.dual_res))
            cap = min(rescue_capacity, score.shape[0])
            _, ridx = jax.lax.top_k(score, cap)
            take = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.take(a, ridx, axis=0), t)
            sol_r = qpx.admm_solve_fixed_batched_shared(
                jnp.take(prob.p_mat, ridx, axis=0),
                jnp.take(prob.q_vec, ridx, axis=0), a0, a1,
                jnp.take(mu, ridx, axis=0),
                jnp.take(prob.lb, ridx, axis=0),
                jnp.take(prob.ub, ridx, axis=0),
                rescue_iters, settings,
                jnp.take(sol.x, ridx, axis=0),
                jnp.take(sol.y, ridx, axis=0),
                jnp.take(prob.rho0, ridx, axis=0), take(scal),
                jnp.take(minv, ridx, axis=0), block=admm_block,
                interpret=interpret)
            unconv = jnp.take(need, ridx, axis=0)

            def merge(orig, new):
                keep = unconv.reshape((cap,) + (1,) * (new.ndim - 1))
                patched = jnp.where(keep, new,
                                    jnp.take(orig, ridx, axis=0))
                return orig.at[ridx].set(patched)

            sol = jax.tree_util.tree_map(merge, sol, sol_r)
            rescued = jnp.zeros(score.shape[0], bool).at[ridx].set(
                unconv)
            sol = sol.replace(iters=cfg.mpc_qp_iters + jnp.where(
                rescued, rescue_iters, 0).astype(jnp.int32))
        out = jax.vmap(
            lambda p, c, m, s: control_tick_finish(cfg, p, c, m, s)
        )(params_b, cs, mem, sol)
        if return_stats:
            stats = {"converged": sol.converged,
                     "prim_res": sol.prim_res, "dual_res": sol.dual_res}
            return out + (stats,)
        return out

    m_b = jax.vmap(lambda pr, sc: qpx.scaled_kkt_matrix(
        pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, settings, pr.rho0, sc)
    )(prob, scal)
    if use_pallas:
        minv = batched_inverse(m_b, block=kkt_block, interpret=interpret)
    else:
        minv = jax.vmap(
            lambda m: jnp.linalg.inv(m))(m_b)

    if admm_backend == "pallas":
        sol = qpx.admm_solve_fixed_batched(
            prob.p_mat, prob.q_vec, prob.a_mat, prob.lb, prob.ub,
            cfg.mpc_qp_iters, settings, prob.warm_x, prob.warm_y,
            prob.rho0, scal, minv, block=admm_block,
            interpret=interpret)
    else:
        sol = jax.vmap(lambda pr, sc, mi: qpx.admm_solve_fixed(
            pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, cfg.mpc_qp_iters,
            settings, x0=pr.warm_x, y0=pr.warm_y, rho0=pr.rho0, scaling=sc,
            kkt_inv=mi))(prob, scal, minv)

    return jax.vmap(
        lambda p, c, m, s: control_tick_finish(cfg, p, c, m, s)
    )(params_b, cs, mem, sol)


def _gathered_rescue(sol, p_of, q_of, l_of, u_of, scal_of, a0, a1, mu_v,
                     small_inverse, settings, *, cap: int,
                     rescue_iters: int, admm_block: int, interpret: bool,
                     rescue_flag, rho0_base, base_blk, slope_blk,
                     eligible=None, unconverged_only: bool = False):
    """Gathered rescue with rho refactor: rank the scenarios that are
    unconverged (or rescue-flagged), gather the worst ``cap``, refactor
    their KKT at a corrected stepsize, continue their solve for
    ``rescue_iters`` iterations, and scatter back — accepting a rescue
    only where it does not worsen the residual picture.

    The stepsize refactor applies to UNCONVERGED scenarios only (the
    first pass's rho estimate, clamped to the healthy band of the
    cost-normalized family — stalls are primal-dominant because the
    carried rho lags). Scenarios rescued for force accuracy (converged,
    but inside the post-flip cooldown window) keep their original rho: a
    rho jump transiently RAISES residuals and was measured to flip
    previously-converged scenarios to unconverged after the pass."""
    from a1_qp_mpc_controller_tpu.control import grf as grf_mod
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    dtype = q_of.dtype
    need = ((~sol.converged) if unconverged_only
            else (~sol.converged) | rescue_flag)
    if eligible is not None:
        need = need & eligible
    score = need.astype(dtype) * (
        1.0 + jnp.maximum(sol.prim_res, sol.dual_res))
    cap = min(cap, score.shape[0])
    _, ridx = jax.lax.top_k(score, cap)
    tk = lambda a: jnp.take(a, ridx, axis=0)
    scal_r = qpx.Scaling(d=tk(scal_of.d), e=tk(scal_of.e),
                         c=tk(scal_of.c))
    conv_g = jnp.take(sol.converged, ridx, axis=0)
    rho_est = jnp.clip(tk(sol.rho), 0.1 * grf_mod._MPC_RHO0,
                       100.0 * grf_mod._MPC_RHO0)
    rho_r = jnp.where(conv_g, tk(rho0_base), rho_est)
    m_r = qpx.scaled_kkt_matrix_blockdiag(
        tk(p_of), base_blk, slope_blk, tk(mu_v), tk(l_of), tk(u_of),
        settings, rho_r, scal_r)
    minv_r = small_inverse(m_r)
    sol_r = qpx.admm_solve_fixed_batched_shared(
        tk(p_of), tk(q_of), a0, a1, tk(mu_v), tk(l_of), tk(u_of),
        rescue_iters, settings, tk(sol.x), tk(sol.y), rho_r, scal_r,
        minv_r, block=min(admm_block, 64), interpret=interpret)
    res_o = jnp.maximum(tk(sol.prim_res), tk(sol.dual_res))
    res_n = jnp.maximum(sol_r.prim_res, sol_r.dual_res)
    sel = jnp.take(need, ridx, axis=0) & (
        (~conv_g) | sol_r.converged | (res_n < res_o))

    def merge(orig, new):
        keep = sel.reshape((cap,) + (1,) * (new.ndim - 1))
        patched = jnp.where(keep, new, jnp.take(orig, ridx, axis=0))
        return orig.at[ridx].set(patched)

    return jax.tree_util.tree_map(merge, sol, sol_r)


def _gathered_polish(sol, p_of, q_of, l_of, u_of, scal_of, a0, a1, mu_v,
                     minv_of, rho_of, settings, *, due, cap: int,
                     iters: int, admm_block: int, interpret: bool,
                     return_taken: bool = False):
    """Round-robin accuracy polish (round 5): gather the ``due``
    scenarios (deterministic (tick + scenario) % K cadence, computed by
    the caller) and continue their solve for ``iters`` more iterations
    at their carried stepsize and CURRENT effective KKT inverse — no
    refactorization, no gather-side inverse work.

    Why it exists: the dense golden probe (scripts/probe_golden_tail.py)
    showed the fixed schedule's force-accuracy tail is slow warm-start
    drift in the near-flat internal-force directions (r_weights ~1e-7)
    7-40 ticks after flips, with NO residual signature (ok-tick dual
    residuals overlap offender residuals completely) — so unlike the
    flip rescue it cannot be triggered by solver state; a deterministic
    cadence bounds the drift window at fixed cost instead. A polish is
    accepted only where it does not worsen the residual picture."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    dtype = q_of.dtype
    score = due.astype(dtype) * (
        1.0 + jnp.maximum(sol.prim_res, sol.dual_res))
    cap = min(cap, score.shape[0])
    _, ridx = jax.lax.top_k(score, cap)
    tk = lambda a: jnp.take(a, ridx, axis=0)
    scal_r = qpx.Scaling(d=tk(scal_of.d), e=tk(scal_of.e),
                         c=tk(scal_of.c))
    sol_r = qpx.admm_solve_fixed_batched_shared(
        tk(p_of), tk(q_of), a0, a1, tk(mu_v), tk(l_of), tk(u_of),
        iters, settings, tk(sol.x), tk(sol.y), tk(rho_of), scal_r,
        tk(minv_of), block=min(admm_block, 64), interpret=interpret)
    res_o = jnp.maximum(tk(sol.prim_res), tk(sol.dual_res))
    res_n = jnp.maximum(sol_r.prim_res, sol_r.dual_res)
    sel = tk(due) & (sol_r.converged | (res_n <= res_o))

    def merge(orig, new):
        keep = sel.reshape((cap,) + (1,) * (new.ndim - 1))
        patched = jnp.where(keep, new, jnp.take(orig, ridx, axis=0))
        return orig.at[ridx].set(patched)

    out = jax.tree_util.tree_map(merge, sol, sol_r)
    if return_taken:
        # which scenarios actually got a continuation slot this round
        # (regardless of acceptance) — the caller uses it to drive a
        # cond-gated overflow round when flip clusters push the due
        # count past the pool size
        taken = jnp.zeros(due.shape, bool).at[ridx].set(
            jnp.take(due, ridx, axis=0))
        return out, taken
    return out


def polish_due_mask(cfg: A1Config, mem_b) -> "jnp.ndarray | None":
    """(B,) bool: which scenarios are due their round-robin polish this
    tick — (tick + scenario index) % K == 0, so a batch that ticks in
    lock-step staggers its polish load evenly (ceil(B/K) per tick)."""
    if cfg.mpc_polish_iters <= 0 or cfg.mpc_polish_every <= 0:
        return None
    b = mem_b.tick.shape[0]
    return ((mem_b.tick + jnp.arange(b, dtype=mem_b.tick.dtype))
            % cfg.mpc_polish_every) == 0


class KktCarry(struct.PyTreeNode):
    """Cross-tick KKT factorization carry for the amortized full-size
    route (:func:`_amortized_full_solve`): the batched inverse is
    refreshed for only ``capacity`` scenarios per tick (contact-flipped
    first, then oldest), and every other scenario reuses its carried
    inverse as a preconditioner with a truncated-Neumann correction.
    The scaling/rho the inverse was built at are FROZEN with it —
    scaling is a preconditioner choice and ADMM converges for any fixed
    rho, so freezing changes convergence rate only, never the fixed
    point; the correction handles the real drift (the cost matrix P
    moves with foot positions/yaw, mm-and-mrad per tick)."""

    minv: jnp.ndarray    # (B, n, n) inverse of m_mat
    m_mat: jnp.ndarray   # (B, n, n) scaled KKT at the last refresh
    d: jnp.ndarray       # (B, n)  frozen Ruiz variable scaling
    e: jnp.ndarray       # (B, m)  frozen Ruiz constraint scaling
    c: jnp.ndarray       # (B,)    frozen cost normalization
    rho: jnp.ndarray     # (B,)    frozen ADMM stepsize
    age: jnp.ndarray     # (B,) int32 ticks since refresh


def make_kkt_carry(cfg: A1Config, batch: int,
                   dtype=jnp.float32) -> KktCarry:
    """Cold carry: ages start huge so the first amortized tick takes the
    refresh-everything branch (identical work to the non-amortized
    route), seeding real factorizations for every scenario."""
    from a1_qp_mpc_controller_tpu.control import grf as grf_mod

    n = 12 * cfg.horizon
    m = 20 * cfg.horizon
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (batch, n, n))
    return KktCarry(
        minv=eye, m_mat=eye,
        d=jnp.ones((batch, n), dtype), e=jnp.ones((batch, m), dtype),
        c=jnp.ones((batch,), dtype),
        rho=jnp.full((batch,), grf_mod._MPC_RHO0, dtype),
        age=jnp.full((batch,), 1_000_000, jnp.int32))


def _amortized_full_solve(cfg: A1Config, prob, scal_new, mu, settings,
                          kcarry: KktCarry, *, capacity: int,
                          admm_block: int, kkt_block: int,
                          rescue_capacity: int, rescue_iters: int,
                          refine_order: int, interpret: bool,
                          polish_due=None):
    """Full-size solve with the KKT factorization AMORTIZED across ticks
    (the round-4 verdict's #1 item: the 11 ms batched inverse was ~half
    the tick and refreshing it every tick is wasted work — on calm ticks
    the KKT matrix moves by ~1e-3 relative).

    Per tick: refresh the ``capacity`` scenarios that need it most
    (contact flips are mandatory — their KKT changes structurally with
    the bound pattern; then oldest-first aging, which self-staggers the
    batch into a round-robin refresh cycle of ~B/capacity ticks). Every
    scenario then solves with

        minv_eff = (I + C + ... + C^refine_order) minv,
        C = minv (m_mat - K_t)

    — the truncated Neumann series for K_t^-1 about the carried
    factorization, algebraically identical to ``refine_order`` steps of
    iterative refinement in the ADMM x-update but precomputed as ONE
    operator so the fused-ADMM kernel is unchanged. Computing C through
    the explicit difference m_mat - K_t avoids the catastrophic
    cancellation that kills the Newton-Schulz form X(2I - KX)
    (qp.py:492-519: forming I - KX directly in f32 loses the small
    correction under the O(1) product noise; the difference form
    subtracts ANALYTICALLY first).

    If more scenarios flipped than ``capacity`` (synchronized flips:
    walk onset), a lax.cond refreshes EVERYTHING — correctness never
    depends on the capacity guess. Convergence is still gated by the
    same unscaled-residual checks, and the rescue pass (which always
    refactors its gathered subset exactly) remains the safety net, so a
    scenario whose correction was not enough is caught, not shipped.

    Reference anchor: OSQP's one-factorization-many-iterations pattern
    (A1RobotControl.cpp:522-540) extended ACROSS ticks the way OSQP's
    update_* calls reuse the factorization across problem updates.
    """
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import batched_inverse

    b, n = prob.q_vec.shape
    dtype = prob.q_vec.dtype
    h = cfg.horizon
    base_blk, slope_blk = srb.friction_basis_blocks(dtype)
    a0f, a1f = srb.friction_constraint_basis(h, dtype)
    iters = cfg.mpc_qp_iters
    full_admm_block = min(admm_block, 64)
    hi = jax.lax.Precision.HIGHEST

    assert capacity > 0
    # capacity >= batch degenerates to a full refresh every tick (the
    # non-amortized schedule with a zero correction) — valid, just not
    # amortized; small-batch tests and conservative configs use it
    capacity = min(capacity, b)
    # mandatory refreshes: contact flips (structural KKT change) and
    # pathologically stale factorizations (cold start: make_kkt_carry
    # ages start huge, so the first tick refreshes EVERYTHING)
    stale_max = max(16, 4 * b // capacity)
    must = prob.flipped | (kcarry.age >= stale_max)
    overflow = jnp.sum(must.astype(jnp.int32)) > capacity

    def refresh_all(kc):
        m_b = qpx.scaled_kkt_matrix_blockdiag(
            prob.p_mat, base_blk, slope_blk, mu, prob.lb, prob.ub,
            settings, prob.rho0, scal_new)
        minv = batched_inverse(m_b, block=kkt_block, interpret=interpret)
        return KktCarry(minv=minv, m_mat=m_b, d=scal_new.d, e=scal_new.e,
                        c=scal_new.c, rho=prob.rho0,
                        age=jnp.zeros((b,), jnp.int32))

    def refresh_some(kc):
        # flips outrank everything; then oldest-first. The top-k is
        # always FULL (capacity scenarios refresh every tick) — the
        # deterministic cost is the point of the schedule.
        score = kc.age.astype(dtype) + jnp.where(must, 1e9, 0.0)
        _, ridx = jax.lax.top_k(score, capacity)
        tk = lambda a: jnp.take(a, ridx, axis=0)
        scal_g = qpx.Scaling(d=tk(scal_new.d), e=tk(scal_new.e),
                             c=tk(scal_new.c))
        m_g = qpx.scaled_kkt_matrix_blockdiag(
            tk(prob.p_mat), base_blk, slope_blk, tk(mu), tk(prob.lb),
            tk(prob.ub), settings, tk(prob.rho0), scal_g)
        minv_g = batched_inverse(m_g, block=kkt_block,
                                 interpret=interpret)
        return KktCarry(
            minv=kc.minv.at[ridx].set(minv_g),
            m_mat=kc.m_mat.at[ridx].set(m_g),
            d=kc.d.at[ridx].set(scal_g.d),
            e=kc.e.at[ridx].set(scal_g.e),
            c=kc.c.at[ridx].set(scal_g.c),
            rho=kc.rho.at[ridx].set(tk(prob.rho0)),
            age=(kc.age + 1).at[ridx].set(0))

    kcarry = jax.lax.cond(overflow, refresh_all, refresh_some, kcarry)
    scal_used = qpx.Scaling(d=kcarry.d, e=kcarry.e, c=kcarry.c)
    rho_used = kcarry.rho

    # current-tick KKT at the FROZEN (scaling, rho): for just-refreshed
    # scenarios this reproduces m_mat exactly (same inputs), so their
    # correction is exactly zero — one uniform code path.
    k_cur = qpx.scaled_kkt_matrix_blockdiag(
        prob.p_mat, base_blk, slope_blk, mu, prob.lb, prob.ub,
        settings, rho_used, scal_used)
    delta = kcarry.m_mat - k_cur
    c_mat = jnp.matmul(kcarry.minv, delta, precision=hi)
    minv_eff = kcarry.minv
    corr = kcarry.minv
    for _ in range(refine_order):
        corr = jnp.matmul(c_mat, corr, precision=hi)
        minv_eff = minv_eff + corr

    sol = qpx.admm_solve_fixed_batched_shared(
        prob.p_mat, prob.q_vec, a0f, a1f, mu, prob.lb, prob.ub,
        iters, settings, prob.warm_x, prob.warm_y, rho_used, scal_used,
        minv_eff, block=full_admm_block, interpret=interpret)

    if rescue_capacity > 0:
        # (a) accuracy CONTINUATION for flagged-but-converged scenarios
        # (flip/cooldown-window ticks): more iterations at the carried
        # stepsize and effective inverse — no KKT assembly, no inverse
        # build. With the round-5 strided cooldown window
        # (cfg.mpc_cooldown_ticks/stride) ~18% of a trot batch is
        # flagged per tick; refactoring them (the round-4 rescue) paid
        # a gathered inverse for scenarios whose factorization was
        # already healthy.
        due_acc = prob.rescue_flag & sol.converged
        cont = lambda s, d, rt: _gathered_polish(
            s, prob.p_mat, prob.q_vec, prob.lb, prob.ub, scal_used,
            a0f, a1f, mu, minv_eff, rho_used, settings, due=d,
            cap=rescue_capacity, iters=rescue_iters,
            admm_block=admm_block, interpret=interpret,
            return_taken=rt)
        sol, taken = cont(sol, due_acc, True)
        # overflow round: the top-k pool ranks by residual, but the
        # flat-direction error this continuation exists to fix has NO
        # residual signature (probe_golden_tail.py) — a starved flagged
        # scenario can be the worst offender (measured 36 N on the
        # batch-8 gate when a flip cluster overflowed the pool). When
        # the due count exceeds the pool, run one more round on the
        # remainder; flip clusters are transient, so this fires rarely.
        due_left = due_acc & ~taken
        sol = jax.lax.cond(
            jnp.any(due_left),
            lambda s: cont(s, due_left, False), lambda s: s, sol)
        # (b) TRUE rescue for unconverged scenarios: refactor at the
        # first pass's rho estimate + continue; cond-skipped on the
        # (common) all-converged tick, and a second smaller straggler
        # round after that
        full_inv = lambda m: batched_inverse(m, block=kkt_block,
                                             interpret=interpret)
        rescue = lambda s, cap: _gathered_rescue(
            s, prob.p_mat, prob.q_vec, prob.lb, prob.ub, scal_used,
            a0f, a1f, mu, full_inv, settings, cap=cap,
            rescue_iters=rescue_iters, admm_block=admm_block,
            interpret=interpret, rescue_flag=prob.rescue_flag,
            rho0_base=rho_used, base_blk=base_blk, slope_blk=slope_blk,
            unconverged_only=True)
        sol = jax.lax.cond(
            jnp.all(sol.converged), lambda s: s,
            lambda s: rescue(s, max(16, rescue_capacity // 2)), sol)
        sol = jax.lax.cond(
            jnp.all(sol.converged), lambda s: s,
            lambda s: rescue(s, max(8, rescue_capacity // 4)), sol)
    if polish_due is not None:
        # round-robin accuracy polish at the carried stepsize +
        # effective inverse; rescue-flagged scenarios already got a
        # (deeper, refactored) continuation above
        due = polish_due & ~prob.rescue_flag
        cap_p = max(1, -(-b // cfg.mpc_polish_every))
        sol = _gathered_polish(
            sol, prob.p_mat, prob.q_vec, prob.lb, prob.ub, scal_used,
            a0f, a1f, mu, minv_eff, rho_used, settings, due=due,
            cap=cap_p, iters=cfg.mpc_polish_iters,
            admm_block=admm_block, interpret=interpret)
    return sol, kcarry


def _reduced_shared_solve(cfg: A1Config, prob, scal, mu, contacts,
                          settings, *, reduced_blocks: int,
                          big_capacity: int, admm_block: int,
                          kkt_block: int, rescue_capacity: int,
                          rescue_iters: int, interpret: bool,
                          polish_due=None):
    """Contact-pattern-reduced WHOLE-SOLVE route: both the KKT inverse
    and the fused-ADMM iterations run at the gathered stance-block shape
    (trot: 22 blocks = 66 vars / 110 rows instead of 40 / 120 / 200).

    Why this is exact (not approximate): the swing-eliminated family's
    dead (swing) variables have zero cost coupling, unit P diagonal,
    zero q, and loosened rows, and the constraint matrix is
    block-diagonal with IDENTICAL (5,3) blocks — so (a) gathering live
    blocks in block order preserves the shared constraint basis at the
    reduced block count (srb.friction_constraint_basis_nblk), and (b) a
    dead variable warm-started at 0 stays EXACTLY 0 through every ADMM
    iteration (its rhs is identically zero), so dropping it changes no
    iterate of the live variables. Batched-vs-single equivalence is
    therefore tight, not tolerance-level.

    Scenarios with more live blocks than ``reduced_blocks`` (3-4
    stance) are solved at FULL size in a ``big_capacity`` top-k bucket
    and scattered in (like ops/qp.reduced_kkt_inverse); if more than
    ``big_capacity`` such scenarios exist this tick, the whole batch
    takes the full-size path (lax.cond) — correctness never depends on
    the capacity guess.

    The rescue pass (``rescue_capacity`` > 0) gathers scenarios that are
    unconverged OR contact-flipped (a flip solve can satisfy the loose
    relative tolerance several N from the optimum — measured round 4)
    and continues their solve for ``rescue_iters`` more iterations at a
    REFACTORED stepsize: the first pass's per-scenario rho estimate is
    the information OSQP's adaptive rho would have used, and the
    reduced-shape refactor costs one small-kernel inverse over the
    gathered subset only.
    """
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_small,
    )

    b, n = prob.q_vec.shape
    m_rows = prob.lb.shape[1]
    h = cfg.horizon
    dtype = prob.q_vec.dtype
    nblk = n // 3
    n_rb = min(reduced_blocks, nblk)
    base_blk, slope_blk = srb.friction_basis_blocks(dtype)
    a0f, a1f = srb.friction_constraint_basis(h, dtype)
    iters = cfg.mpc_qp_iters

    live_blk = jnp.tile(contacts, (1, h))            # (B, 4H) step-major
    n_live_blk = jnp.sum(live_blk, axis=1)

    def run_rescue(sol, p_of, q_of, l_of, u_of, scal_of,
                   a0, a1, mu_v, small_inverse, cap_override=None,
                   unconverged_only=False, rescue_flag=None,
                   rho0_base=None, eligible=None):
        """Gathered rescue (module-level :func:`_gathered_rescue`) bound
        to this solve's settings. ``rescue_flag``/``rho0_base`` override
        the full-batch prob fields when ``sol`` covers a gathered
        subset. ``eligible`` masks scenarios OUT of the rescue ranking —
        the reduced tier passes (n_live_blk <= n_rb) so big-bucket
        scenarios (whose reduced-shape result is a truncated-QP artifact
        later overwritten by the big-bucket scatter) cannot fill the
        top-k slots and starve genuine reduced-tier stragglers."""
        flag = prob.rescue_flag if rescue_flag is None else rescue_flag
        rho_base = prob.rho0 if rho0_base is None else rho0_base
        return _gathered_rescue(
            sol, p_of, q_of, l_of, u_of, scal_of, a0, a1, mu_v,
            small_inverse, settings,
            cap=min(cap_override or rescue_capacity, sol.x.shape[0]),
            rescue_iters=rescue_iters, admm_block=admm_block,
            interpret=interpret, rescue_flag=flag, rho0_base=rho_base,
            eligible=eligible, unconverged_only=unconverged_only,
            base_blk=base_blk, slope_blk=slope_blk)

    # the FULL-size branch caps its admm block at 64: the fused kernel's
    # per-block VMEM at (block, 120, 128) minv + (block, 256) operands
    # exceeds the 16 MB scoped limit at block 128 (measured OOM); the
    # reduced shape is half that, so the reduced branch may use larger
    # blocks
    full_admm_block = min(admm_block, 64)

    def full_path():
        m_b = qpx.scaled_kkt_matrix_blockdiag(
            prob.p_mat, base_blk, slope_blk, mu, prob.lb, prob.ub,
            settings, prob.rho0, scal)
        minv = batched_inverse(m_b, block=kkt_block, interpret=interpret)
        sol = qpx.admm_solve_fixed_batched_shared(
            prob.p_mat, prob.q_vec, a0f, a1f, mu, prob.lb, prob.ub,
            iters, settings, prob.warm_x, prob.warm_y, prob.rho0, scal,
            minv, block=full_admm_block, interpret=interpret)
        if rescue_capacity > 0:
            full_inv = lambda m: batched_inverse(m, block=kkt_block,
                                                 interpret=interpret)
            sol = run_rescue(sol, prob.p_mat, prob.q_vec, prob.lb,
                             prob.ub, scal, a0f, a1f, mu, full_inv)
            sol = jax.lax.cond(
                jnp.all(sol.converged), lambda s: s,
                lambda s: run_rescue(
                    s, prob.p_mat, prob.q_vec, prob.lb, prob.ub, scal,
                    a0f, a1f, mu, full_inv,
                    cap_override=max(8, rescue_capacity // 4),
                    unconverged_only=True),
                sol)
        if polish_due is not None:
            # round-robin accuracy polish (same contract as the
            # amortized route; the reduced tier below does not carry
            # it — the shipped bench candidates run 'amortized' or
            # this full path)
            due = polish_due & ~prob.rescue_flag
            cap_p = max(1, -(-b // cfg.mpc_polish_every))
            sol = _gathered_polish(
                sol, prob.p_mat, prob.q_vec, prob.lb, prob.ub, scal,
                a0f, a1f, mu, minv, prob.rho0, settings, due=due,
                cap=cap_p, iters=cfg.mpc_polish_iters,
                admm_block=admm_block, interpret=interpret)
        return sol

    def reduced_path():
        order = jnp.argsort(jnp.where(live_blk, 0, 1), axis=1,
                            stable=True)                 # (B, nblk)
        idxb = order[:, :n_rb]                           # (B, n_rb)
        var_idx = (3 * idxb[:, :, None]
                   + jnp.arange(3)[None, None, :]).reshape(b, 3 * n_rb)
        row_idx = (5 * idxb[:, :, None]
                   + jnp.arange(5)[None, None, :]).reshape(b, 5 * n_rb)
        tv = lambda a: jnp.take_along_axis(a, var_idx, axis=1)
        tr = lambda a: jnp.take_along_axis(a, row_idx, axis=1)
        oh_v = jax.nn.one_hot(var_idx, n, dtype=dtype)   # (B, n_r, n)
        pe = jnp.einsum("bri,bij->brj", oh_v, prob.p_mat,
                        precision=jax.lax.Precision.HIGHEST)
        p_r = jnp.einsum("brj,bsj->brs", pe, oh_v,
                         precision=jax.lax.Precision.HIGHEST)
        q_r, wx_r = tv(prob.q_vec), tv(prob.warm_x)
        l_r, u_r, wy_r = tr(prob.lb), tr(prob.ub), tr(prob.warm_y)
        scal_r = qpx.Scaling(d=tv(scal.d), e=tr(scal.e), c=scal.c)
        m_r = qpx.scaled_kkt_matrix_blockdiag(
            p_r, base_blk, slope_blk, mu, l_r, u_r, settings,
            prob.rho0, scal_r)
        minv_r = batched_inverse_small(m_r, block=max(admm_block, 32),
                                       interpret=interpret)
        a0r, a1r = srb.friction_constraint_basis_nblk(n_rb, dtype)
        sol_r = qpx.admm_solve_fixed_batched_shared(
            p_r, q_r, a0r, a1r, mu, l_r, u_r, iters, settings,
            wx_r, wy_r, prob.rho0, scal_r, minv_r, block=admm_block,
            interpret=interpret)
        if rescue_capacity > 0:
            small_inv = lambda m: batched_inverse_small(
                m, block=max(admm_block, 32), interpret=interpret)
            red_tier = n_live_blk <= n_rb
            sol_r = run_rescue(sol_r, p_r, q_r, l_r, u_r, scal_r,
                               a0r, a1r, mu, small_inv,
                               eligible=red_tier)
            # second, smaller round: the handful of scenarios still
            # unconverged after one refactored continuation get their
            # rho re-estimated AGAIN from the post-rescue iterate —
            # the iterative rho adaptation OSQP performs, paid only by
            # the stragglers (~0.3 ms at capacity/4) and lax.cond-
            # skipped entirely when every REDUCED-TIER scenario
            # converged (big-bucket scenarios are judged in their own
            # rescue below)
            sol_r = jax.lax.cond(
                jnp.all(sol_r.converged | ~red_tier), lambda s: s,
                lambda s: run_rescue(
                    s, p_r, q_r, l_r, u_r, scal_r, a0r, a1r, mu,
                    small_inv,
                    cap_override=max(8, rescue_capacity // 4),
                    unconverged_only=True, eligible=red_tier),
                sol_r)
        # scatter the reduced solution back to full coordinates (dead
        # entries are exactly 0 in the equivalent full solve)
        oh_r = jax.nn.one_hot(row_idx, m_rows, dtype=dtype)
        x = jnp.einsum("brn,br->bn", oh_v, sol_r.x,
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("brm,br->bm", oh_r, sol_r.y,
                       precision=jax.lax.Precision.HIGHEST)
        z = jnp.einsum("brm,br->bm", oh_r, sol_r.z,
                       precision=jax.lax.Precision.HIGHEST)
        sol = sol_r.replace(x=x, y=y, z=z)

        # FULL-SIZE big bucket: a scenario with more live blocks than
        # the reduced tier (3-4 stance) is NOT representable in the
        # gathered shape — truncating it would silently solve a wrong
        # QP (later-horizon stance forces pinned to 0). The
        # ``big_capacity`` scenarios with the most live blocks are
        # solved at full size and scattered in; every >n_rb scenario is
        # among them, or the overflow cond below took the full path.
        _, big_idx = jax.lax.top_k(n_live_blk, big_capacity)
        tkb = lambda a: jnp.take(a, big_idx, axis=0)
        scal_b = qpx.Scaling(d=tkb(scal.d), e=tkb(scal.e),
                             c=tkb(scal.c))
        m_bc = qpx.scaled_kkt_matrix_blockdiag(
            tkb(prob.p_mat), base_blk, slope_blk, tkb(mu),
            tkb(prob.lb), tkb(prob.ub), settings, tkb(prob.rho0),
            scal_b)
        minv_c = batched_inverse(m_bc, block=kkt_block,
                                 interpret=interpret)
        sol_b = qpx.admm_solve_fixed_batched_shared(
            tkb(prob.p_mat), tkb(prob.q_vec), a0f, a1f, tkb(mu),
            tkb(prob.lb), tkb(prob.ub), iters, settings,
            tkb(prob.warm_x), tkb(prob.warm_y), tkb(prob.rho0),
            scal_b, minv_c, block=full_admm_block, interpret=interpret)
        if rescue_capacity > 0:
            big_inv = lambda m: batched_inverse(m, block=kkt_block,
                                                interpret=interpret)
            sol_b = run_rescue(
                sol_b, tkb(prob.p_mat), tkb(prob.q_vec), tkb(prob.lb),
                tkb(prob.ub), scal_b, a0f, a1f, tkb(mu), big_inv,
                cap_override=max(8, big_capacity // 2),
                rescue_flag=tkb(prob.rescue_flag),
                rho0_base=tkb(prob.rho0))
            # straggler second round, cond-skipped when clean (same
            # policy as the reduced tier)
            sol_b = jax.lax.cond(
                jnp.all(sol_b.converged), lambda s: s,
                lambda s: run_rescue(
                    s, tkb(prob.p_mat), tkb(prob.q_vec), tkb(prob.lb),
                    tkb(prob.ub), scal_b, a0f, a1f, tkb(mu), big_inv,
                    cap_override=max(8, big_capacity // 4),
                    unconverged_only=True,
                    rescue_flag=tkb(prob.rescue_flag),
                    rho0_base=tkb(prob.rho0)),
                sol_b)
        return jax.tree_util.tree_map(
            lambda o, nb: o.at[big_idx].set(nb), sol, sol_b)

    overflow = jnp.sum(
        (n_live_blk > n_rb).astype(jnp.int32)) > big_capacity
    if big_capacity >= b or n_rb >= nblk:
        return full_path()
    return jax.lax.cond(overflow, full_path, reduced_path)


def batched_stand_control_tick(cfg: A1Config, params_b, cs_b, mem_b,
                               sensors_b, joy: JoyCmd, dt: jnp.ndarray,
                               *, rescue_capacity: int = 128,
                               rescue_iters: int = 400,
                               return_stats: bool = False):
    """Lock-step batched stand-QP tick (the reference's 500 Hz QP
    balance path, A1RobotControl.cpp:416-431): vmapped build, a FIXED
    ``cfg.stand_qp_iters`` warm-started ADMM budget for every scenario
    (pure lock-step — no data-dependent while_loop in the batch hot
    path), then a gathered fixed-budget rho-refactored RESCUE at 1e-5
    tolerance of the worst ``rescue_capacity`` unconverged scenarios
    (contact flips: the kappa ~1e6 family's active-set discovery needs
    a rho refactor and extra iterations, which only the few flipped
    scenarios should pay for; a while_loop-adaptive rescue was measured
    and rejected — 30 ms vs 1.5 ms, see the in-code comment).
    First-pass-converged scenarios are untouched.

    Requires cfg.stance_leg_control_type == 0 and mpc_solver_mode ==
    'fixed'. Numerically: calm warm-started ticks match the adaptive
    core to solver tolerance (both converged); golden-gated against the
    f64 optimum in tests/test_golden.py."""
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.control.controller import (
        control_tick_build_qp, control_tick_finish_qp,
    )
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    assert cfg.stance_leg_control_type == 0
    assert cfg.mpc_solver_mode == "fixed"
    cs, mem, prob = jax.vmap(
        lambda p, c, m, s: control_tick_build_qp(cfg, p, c, m, s, joy,
                                                 dt)
    )(params_b, cs_b, mem_b, sensors_b)

    fixed = qpx.QPSettings(rho=grf._QP_RHO0, eps_abs=1e-4, eps_rel=1e-4)
    sol = jax.vmap(lambda pr: qpx.admm_solve_fixed(
        pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, cfg.stand_qp_iters,
        fixed, x0=pr.warm_x, y0=pr.warm_y, rho0=pr.rho0))(prob)

    if rescue_capacity > 0:
        # fixed-budget rescue at a REFACTORED stepsize (the first
        # pass's rho estimate) and one-decade-tighter tolerance: near
        # flips the 1e-4 relative check can be satisfied a few N from
        # the optimum (|q| is large); 1e-5 pins the force to ~0.15 N
        # (measured). A while_loop-adaptive rescue measured 30 ms at
        # batch 4096 (the gathered lock-step loop runs as long as its
        # slowest scenario EVERY tick); the fixed budget is ~1.5 ms,
        # and the whole pass is lax.cond-skipped on ticks where every
        # scenario converged (the common case — the cold-restart-on-
        # flip warm-start policy makes flip solves converge in budget).
        def rescue(sol):
            score = jnp.where(sol.converged, 0.0,
                              jnp.maximum(sol.prim_res, sol.dual_res))
            cap = min(rescue_capacity, score.shape[0])
            _, ridx = jax.lax.top_k(score, cap)
            pr_r = jax.tree_util.tree_map(
                lambda a: jnp.take(a, ridx, axis=0), prob)
            fixed_r = qpx.QPSettings(rho=grf._QP_RHO0, eps_abs=1e-5,
                                     eps_rel=1e-5)
            rho_r = jnp.clip(jnp.take(sol.rho, ridx, axis=0), 1e-3, 1.0)
            sol_r = jax.vmap(lambda pr, x0, y0, r0: qpx.admm_solve_fixed(
                pr.p_mat, pr.q_vec, pr.a_mat, pr.lb, pr.ub, rescue_iters,
                fixed_r, x0=x0, y0=y0, rho0=r0))(
                pr_r, jnp.take(sol.x, ridx, axis=0),
                jnp.take(sol.y, ridx, axis=0), rho_r)
            unconv = ~jnp.take(sol.converged, ridx, axis=0)

            def merge(orig, new):
                keep = unconv.reshape((cap,) + (1,) * (new.ndim - 1))
                patched = jnp.where(keep, new,
                                    jnp.take(orig, ridx, axis=0))
                return orig.at[ridx].set(patched)

            return jax.tree_util.tree_map(merge, sol, sol_r)

        sol = jax.lax.cond(jnp.all(sol.converged), lambda s: s, rescue,
                           sol)

    out = jax.vmap(
        lambda p, c, m, s: control_tick_finish_qp(cfg, p, c, m, s)
    )(params_b, cs, mem, sol)
    if return_stats:
        stats = {"converged": sol.converged, "prim_res": sol.prim_res,
                 "dual_res": sol.dual_res, "iters": sol.iters}
        return out + (stats,)
    return out


def batched_closed_loop_step(cfg: A1Config, params_b, terr_b,
                             carry: "cl.LoopCarry", joy: JoyCmd,
                             dt: jnp.ndarray, substeps: int = 5,
                             **tick_kwargs):
    """One CLOSED-LOOP batched step through the hoisted-solver schedule:
    vmap(read_sensors) -> batched_control_tick (Pallas shared route) ->
    vmap(plant_step). Unlike :func:`batched_step` (which vmaps the whole
    single-scenario tick), the MPC solve runs the batched Pallas kernels.

    This is the throughput-bench unit: with the plant in the loop the
    contact-pattern distribution is PHYSICAL (a steady trot is 2-stance
    except brief touchdown overlaps), where a static-sensor state holds
    every foot force high forever and manufactures synchronized 4-stance
    windows through the early-contact rule — an artifact that both
    overstates stance count and never exercises flip dynamics."""
    sensors = jax.vmap(
        lambda p, ps, pv: plant_mod.read_sensors(p, ps, pv, dt)
    )(params_b, carry.ps, carry.prev_root_lin_vel)
    amortized = tick_kwargs.get("kkt_carry") is not None
    out = batched_control_tick(cfg, params_b, carry.cs, carry.mem,
                               sensors, joy, dt, **tick_kwargs)
    cs, mem, tq = out[:3]
    prev = carry.ps.root_lin_vel
    ps = jax.vmap(
        lambda p, t, s, q: plant_mod.plant_step(p, t, s, q, dt, substeps)
    )(params_b, terr_b, carry.ps, tq)
    new_carry = cl.LoopCarry(cs=cs, mem=mem, ps=ps,
                             prev_root_lin_vel=prev)
    # amortized route: out[3] is the updated KktCarry (and out[4] the
    # stats dict when requested); otherwise out[3] is the stats dict
    extras = out[3:]
    if amortized:
        if len(extras) > 1:
            return new_carry, extras[0], extras[1]
        return new_carry, extras[0]
    if extras:
        return new_carry, extras[0]
    return new_carry


def make_flat_batch(cfg: A1Config, key: jax.Array, n: int,
                    base: RobotParams):
    """Domain-randomized params + flat terrain + standing-start carry:
    the closed-loop throughput-bench batch (BASELINE's 10 s flat trot
    config, scenario-parallel)."""
    params = randomize_params(key, n, base)
    terr = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,)), terrain_mod.Terrain.flat())
    carry = jax.vmap(
        lambda p, t: cl.make_standing_start(cfg, p, t))(params, terr)
    return params, terr, carry


def make_bench_state(cfg: A1Config, key: jax.Array, n: int,
                     base: RobotParams):
    """A PHYSICAL batched controller state for throughput benchmarking:
    domain-randomized params + a consistent standing pose on flat ground
    with sensors read from the in-framework plant (joint angles from IK,
    real foot forces) — unlike an all-zeros synthetic SensorData, whose
    FK-at-zero foot positions make a badly-scaled MPC problem that a
    fixed-iteration solver cannot meet OSQP tolerances on.
    Returns (params_b, cs_b, mem_b, sensors_b)."""
    params = randomize_params(key, n, base)
    terr = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,)), terrain_mod.Terrain.flat())
    carry = jax.vmap(
        lambda p, t: cl.make_standing_start(cfg, p, t))(params, terr)
    dt = jnp.asarray(cfg.control_dt, jnp.float32)
    sensors = jax.vmap(
        lambda p, ps, pv: plant_mod.read_sensors(p, ps, pv, dt)
    )(params, carry.ps, carry.prev_root_lin_vel)
    # start PAST the 10-tick zero-torque warmup shield: a bench tick
    # should do real torque work, and short batched-vs-single
    # equivalence tests must compare real torques, not the shield's
    # zeros (round-4 finding: several equivalence assertions were
    # vacuous for runs shorter than the warmup)
    mem = carry.mem.replace(tick=jnp.full(
        (n,), cfg.torque_warmup_ticks, jnp.int32))
    return params, carry.cs, mem, sensors


def randomize_params(key: jax.Array, n: int, base: RobotParams
                     ) -> RobotParams:
    """Per-scenario physical randomization: mass +-20%, inertia +-20%,
    controller friction mu in [0.2, 0.45], gait speed +-20%, swing-PD gain
    jitter +-15%."""
    k = jax.random.split(key, 6)
    u = lambda kk, lo, hi, shape=(): jax.random.uniform(
        kk, (n,) + shape, minval=lo, maxval=hi)
    tile = lambda a: jnp.broadcast_to(a, (n,) + a.shape)

    batched = jax.tree_util.tree_map(tile, base)
    mass_scale = u(k[0], 0.8, 1.2)
    inertia_scale = u(k[1], 0.8, 1.2)
    mu = u(k[2], 0.2, 0.45)
    gait_scale = u(k[3], 0.8, 1.2)
    kp_scale = u(k[4], 0.85, 1.15)
    return batched.replace(
        robot_mass=batched.robot_mass * mass_scale,
        trunk_inertia=batched.trunk_inertia * inertia_scale[:, None, None],
        mu_mpc=mu,
        gait_counter_speed=batched.gait_counter_speed
        * gait_scale[:, None],
        kp_foot=batched.kp_foot * kp_scale[:, None, None],
    )


def randomize_terrain(key: jax.Array, n: int,
                      max_pitch: float = 0.2) -> terrain_mod.Terrain:
    """Per-scenario terrain: a mix of flat, sloped, and stepped ground."""
    k1, k2 = jax.random.split(key)
    base = terrain_mod.Terrain.flat()
    tile = lambda a: jnp.broadcast_to(a, (n,))
    t = jax.tree_util.tree_map(tile, base)
    pitch = jax.random.uniform(k1, (n,), minval=-max_pitch,
                               maxval=max_pitch)
    kind = jax.random.randint(k2, (n,), 0, 3)  # 0 flat, 1 slope, 2 stairs
    return t.replace(
        pitch=jnp.where(kind == 1, pitch, 0.0),
        slope_start=jnp.full((n,), 0.4),
        slope_len=jnp.full((n,), 8.0),
        step_height=jnp.where(kind == 2, 0.06, 0.0),
        step_len=jnp.full((n,), 0.3),
        stairs_start=jnp.full((n,), 0.5),
        n_steps=jnp.full((n,), 6.0),
    )


def make_batch(cfg: A1Config, key: jax.Array, n: int, base: RobotParams,
               height: float = 0.3):
    """Build (params, terrain, carry) batches of size n."""
    kp, kt = jax.random.split(key)
    params = randomize_params(kp, n, base)
    terrain = randomize_terrain(kt, n)
    carry = jax.vmap(
        lambda p, t: cl.make_standing_start(cfg, p, t, height)
    )(params, terrain)
    return params, terrain, carry


@partial(jax.jit, static_argnames=("cfg", "substeps"))
def batched_step(cfg: A1Config, params: RobotParams,
                 terrain: terrain_mod.Terrain, carry: cl.LoopCarry,
                 joy: JoyCmd, dt: jnp.ndarray, substeps: int = 5
                 ) -> Tuple[cl.LoopCarry, jnp.ndarray]:
    """One batched control+plant step over the scenario axis. ``joy`` is a
    single (unbatched) command applied to every scenario. Returns the new
    carry and a per-batch metric row (root height error, for reductions)."""

    def one(params_i, terr_i, c: cl.LoopCarry):
        sensors = plant_mod.read_sensors(params_i, c.ps,
                                         c.prev_root_lin_vel, dt)
        cs, mem, torques = control_tick(cfg, params_i, c.cs, c.mem, sensors,
                                        joy, dt)
        prev = c.ps.root_lin_vel
        ps = plant_mod.plant_step(params_i, terr_i, c.ps, torques, dt,
                                  substeps)
        return cl.LoopCarry(cs=cs, mem=mem, ps=ps, prev_root_lin_vel=prev)

    carry = jax.vmap(one)(params, terrain, carry)
    height_err = jnp.abs(carry.ps.root_pos[:, 2]
                         - carry.cs.root_pos_d[:, 2])
    return carry, height_err


@partial(jax.jit, static_argnames=("cfg", "n_steps", "substeps"))
def batched_rollout(cfg: A1Config, params: RobotParams,
                    terrain: terrain_mod.Terrain, carry: cl.LoopCarry,
                    joy_seq: JoyCmd, n_steps: int, substeps: int = 5):
    """Scan ``n_steps`` batched steps; returns (carry, (T,B) height-error
    trace + global means reduced across the sharded batch)."""
    dt = jnp.asarray(cfg.control_dt, jnp.float32)

    def body(c, joy):
        c, err = batched_step(cfg, params, terrain, c, joy, dt, substeps)
        return c, err

    carry, errs = jax.lax.scan(body, carry, joy_seq)
    # cross-device reduction (compiles to an ICI all-reduce when the batch
    # axis is sharded over a mesh)
    metrics = {
        "mean_height_err": jnp.mean(errs[-n_steps // 4:]),
        "p95_height_err": jnp.percentile(errs[-n_steps // 4:], 95.0),
        "alive_frac": jnp.mean(
            (~jnp.isnan(carry.ps.root_pos[:, 2])).astype(jnp.float32)),
    }
    return carry, errs, metrics
