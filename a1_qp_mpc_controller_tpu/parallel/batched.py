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
    ``kkt_backend`` picks the inverse kernel on the 'pallas_shared'
    route: 'reduced' (contact-pattern shape reduction — live-block
    gather to a static ``kkt_reduced_nr``-var Gauss-Jordan, full-size
    kernel only on the ``kkt_big_capacity`` scenarios with the most
    stance legs, overflow-safe; see ops/qp.reduced_kkt_inverse), 'gj'
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
            score = jnp.where(sol.converged, 0.0,
                              jnp.maximum(sol.prim_res, sol.dual_res))
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
            unconv = ~jnp.take(sol.converged, ridx, axis=0)

            def merge(orig, new):
                keep = unconv.reshape((cap,) + (1,) * (new.ndim - 1))
                patched = jnp.where(keep, new,
                                    jnp.take(orig, ridx, axis=0))
                return orig.at[ridx].set(patched)

            sol = jax.tree_util.tree_map(merge, sol, sol_r)
            rescued = jnp.zeros(score.shape[0], bool).at[ridx].set(unconv)
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
    out = batched_control_tick(cfg, params_b, carry.cs, carry.mem,
                               sensors, joy, dt, **tick_kwargs)
    cs, mem, tq = out[:3]
    prev = carry.ps.root_lin_vel
    ps = jax.vmap(
        lambda p, t, s, q: plant_mod.plant_step(p, t, s, q, dt, substeps)
    )(params_b, terr_b, carry.ps, tq)
    new_carry = cl.LoopCarry(cs=cs, mem=mem, ps=ps,
                             prev_root_lin_vel=prev)
    if len(out) > 3:
        return new_carry, out[3]
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
    return params, carry.cs, carry.mem, sensors


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
