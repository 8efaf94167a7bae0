"""Batched + sharded execution tests on the virtual 8-device CPU mesh."""

import os
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.parallel import batched, mesh as meshmod
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.types import JoyCmd


def bench_cfg():
    cfg, params = load_profile("gazebo_mpc")
    return dataclasses.replace(cfg, mpc_qp_iters=25,
                               mpc_solver_mode="fixed"), params


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = meshmod.make_mesh()
    assert mesh.shape["scenario"] == 8


def test_host_chip_mesh_single_process():
    mesh = meshmod.make_host_chip_mesh()
    assert mesh.shape["host"] == 1
    assert mesh.shape["scenario"] == 8
    sh = meshmod.host_chip_sharding(mesh)
    x = jax.device_put(jnp.arange(16.0).reshape(16, 1), sh)
    assert float(x.sum()) == 120.0
    assert len({s.device for s in x.addressable_shards}) == 8


def test_randomize_params_shapes_and_ranges():
    cfg, params = bench_cfg()
    pb = batched.randomize_params(jax.random.PRNGKey(0), 16, params)
    assert pb.robot_mass.shape == (16,)
    m = np.asarray(pb.robot_mass)
    assert (m >= 0.8 * 12.0 - 1e-3).all() and (m <= 1.2 * 12.0 + 1e-3).all()
    mu = np.asarray(pb.mu_mpc)
    assert (mu >= 0.2).all() and (mu <= 0.45).all()


def test_batched_step_matches_single():
    """vmapped batched step == the single-scenario step, per scenario."""
    cfg, params = bench_cfg()
    n = 4
    key = jax.random.PRNGKey(1)
    pb, tb, carry = batched.make_batch(cfg, key, n, params)
    joy = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)
    carry2, err = batched.batched_step(cfg, pb, tb, carry, joy, dt,
                                       substeps=2)
    assert err.shape == (n,)

    # scenario 2 run alone
    take = lambda tree: jax.tree_util.tree_map(lambda a: a[2], tree)
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    c0 = take(carry)
    p0 = take(pb)
    t0 = take(tb)
    sensors = plant_mod.read_sensors(p0, c0.ps, c0.prev_root_lin_vel, dt)
    cs, mem, tq = control_tick(cfg, p0, c0.cs, c0.mem, sensors, joy, dt)
    ps = plant_mod.plant_step(p0, t0, c0.ps, tq, dt, 2)
    np.testing.assert_allclose(np.asarray(carry2.ps.root_pos[2]),
                               np.asarray(ps.root_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry2.cs.joint_torques[2]),
                               np.asarray(cs.joint_torques), atol=1e-4)


def test_sharded_batched_rollout():
    """Scenario batch sharded over the 8-device mesh: runs, stays finite,
    and the metric reduction crosses devices."""
    cfg, params = bench_cfg()
    mesh = meshmod.make_mesh()
    n = 16  # 2 per device
    pb, tb, carry = batched.make_batch(cfg, jax.random.PRNGKey(2), n,
                                       params)
    pb = meshmod.shard_batch(pb, mesh)
    tb = meshmod.shard_batch(tb, mesh)
    carry = meshmod.shard_batch(carry, mesh)

    steps = 20
    joy_seq = cl.joy_schedule(steps)
    carry2, errs, metrics = batched.batched_rollout(
        cfg, pb, tb, carry, joy_seq, steps, substeps=2)
    assert errs.shape == (steps, n)
    assert not np.isnan(np.asarray(errs)).any()
    assert float(metrics["alive_frac"]) == 1.0
    # sharding preserved on outputs
    shard_devs = {d.device for d in carry2.ps.root_pos.addressable_shards}
    assert len(shard_devs) == 8


def test_split_batched_tick_matches_vmapped():
    """batched_control_tick (the Pallas-hoisted path) must equal
    vmap(control_tick) exactly in its cholesky route, and match in the
    pallas-interpret route."""
    import jax.tree_util as jtu
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )
    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(0), B, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(B))
    cs = cs.replace(
        root_pos=jnp.tile(jnp.array([0.0, 0, 0.3]), (B, 1)),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (B, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (B, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(B))
    mem = mem.replace(tick=jnp.full((B,), cfg.torque_warmup_ticks,
                                    jnp.int32))  # real torques, not
    #                                 the zero-torque warmup shield
    sens = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(B))
    sens = sens.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (B, 4)),
        foot_force=jnp.full((B, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    _, _, ref_tq = jax.vmap(
        lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
        pb, cs, mem, sens)
    _, _, sp_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(sp_tq), np.asarray(ref_tq))
    _, _, pl_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, use_pallas=True, interpret=True,
        kkt_block=3)
    np.testing.assert_allclose(np.asarray(pl_tq), np.asarray(ref_tq),
                               atol=1e-3)
    del jtu


def test_fused_admm_matches_vmapped_solver():
    """admm_solve_fixed_batched (the fused-ADMM Pallas kernel, interpret
    mode) must reproduce vmap(admm_solve_fixed) on randomized MPC QPs."""
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(3), B, params)
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)

    p_mat, q_vec, a_mat, lb, ub = jax.vmap(
        lambda p: srb.reference_mpc_problem(p))(pb)
    # perturb gradients so the three problems differ beyond params
    q_vec = q_vec * jnp.linspace(0.8, 1.2, B)[:, None]
    scaling = jax.vmap(lambda p: srb.reference_mpc_scaling(p))(pb)
    rho0 = jnp.full((B,), grf._MPC_RHO0, jnp.float32)
    x0 = jnp.zeros((B, 120), jnp.float32)
    y0 = jnp.zeros((B, 200), jnp.float32)
    minv = jax.vmap(lambda P, q, A, l, u, sc, r: jnp.linalg.inv(
        qpx.scaled_kkt_matrix(P, q, A, l, u, settings, r, sc)))(
        p_mat, q_vec, a_mat, lb, ub, scaling, rho0)

    ref = jax.vmap(lambda P, q, A, l, u, sc, mi, r: qpx.admm_solve_fixed(
        P, q, A, l, u, 25, settings, x0=None, y0=None, rho0=r,
        scaling=sc, kkt_inv=mi))(p_mat, q_vec, a_mat, lb, ub, scaling,
                                 minv, rho0)
    out = qpx.admm_solve_fixed_batched(
        p_mat, q_vec, a_mat, lb, ub, 25, settings, x0, y0, rho0,
        scaling, minv, block=2, interpret=True)

    # same iteration, different f32 accumulation order (VPU axis
    # reductions vs XLA matmul): tolerances are loose-ish in absolute
    # terms but tight relative to the ~130 N force scale.
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(ref.y),
                               atol=2e-3)
    # at convergence the rho estimate is a ratio of noise-level residuals
    # — only its order of magnitude is meaningful (it seeds the next
    # tick's rho_vec, which is clipped anyway)
    ratio = np.asarray(out.rho) / np.asarray(ref.rho)
    assert (ratio > 0.2).all() and (ratio < 5.0).all()
    assert bool(out.converged.all()) == bool(ref.converged.all())


def test_fused_admm_batched_tick_matches_vmapped():
    """The full batched tick with admm_backend='pallas' (interpret) must
    match vmap(control_tick) to float tolerance."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )
    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(0), B, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(B))
    cs = cs.replace(
        root_pos=jnp.tile(jnp.array([0.0, 0, 0.3]), (B, 1)),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (B, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (B, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(B))
    mem = mem.replace(tick=jnp.full((B,), cfg.torque_warmup_ticks,
                                    jnp.int32))  # real torques, not
    #                                 the zero-torque warmup shield
    sens = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(B))
    sens = sens.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (B, 4)),
        foot_force=jnp.full((B, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    _, _, ref_tq = jax.vmap(
        lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
        pb, cs, mem, sens)
    _, _, fa_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, admm_backend="pallas",
        admm_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(fa_tq), np.asarray(ref_tq),
                               atol=1e-3)


def test_friction_constraint_basis_matches_matrix():
    from a1_qp_mpc_controller_tpu.models import srb
    a0, a1 = srb.friction_constraint_basis(10)
    for mu in (0.2, 0.45, 0.7):
        full = srb.friction_constraint_matrix(jnp.float32(mu), 10)
        np.testing.assert_allclose(np.asarray(a0 + mu * a1),
                                   np.asarray(full), atol=1e-6)


def test_scaled_kkt_matrix_shared_matches_vmapped():
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(4), B, params)
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p_mat, q_vec, a_mat, lb, ub = jax.vmap(
        lambda p: srb.reference_mpc_problem(p))(pb)
    scaling = jax.vmap(lambda p: srb.reference_mpc_scaling(p))(pb)
    rho0 = jnp.full((B,), grf._MPC_RHO0, jnp.float32)
    ref = jax.vmap(lambda P, q, A, l, u, sc, r: qpx.scaled_kkt_matrix(
        P, q, A, l, u, settings, r, sc))(p_mat, q_vec, a_mat, lb, ub,
                                         scaling, rho0)
    a0, a1 = srb.friction_constraint_basis(10)
    out = qpx.scaled_kkt_matrix_shared(p_mat, a0, a1, pb.mu_mpc, lb, ub,
                                       settings, rho0, scaling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_admm_shared_tick_matches_vmapped():
    """batched_control_tick with admm_backend='pallas_shared' (interpret)
    must match vmap(control_tick) to float tolerance."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )
    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(0), B, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(B))
    cs = cs.replace(
        root_pos=jnp.tile(jnp.array([0.0, 0, 0.3]), (B, 1)),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (B, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (B, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(B))
    mem = mem.replace(tick=jnp.full((B,), cfg.torque_warmup_ticks,
                                    jnp.int32))  # real torques, not
    #                                 the zero-torque warmup shield
    sens = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(B))
    sens = sens.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (B, 4)),
        foot_force=jnp.full((B, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    _, _, ref_tq = jax.vmap(
        lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
        pb, cs, mem, sens)
    _, _, sh_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, admm_backend="pallas_shared",
        admm_block=2, kkt_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(sh_tq), np.asarray(ref_tq),
                               atol=2e-3)
    # and with the Schur-complement KKT-inverse backend
    _, _, sc_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, admm_backend="pallas_shared",
        kkt_backend="schur", admm_block=2, kkt_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(sc_tq), np.asarray(ref_tq),
                               atol=2e-3)
    # and with the transposed-layout sweep KKT-inverse backend
    _, _, sw_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, admm_backend="pallas_shared",
        kkt_backend="sweep_t", admm_block=2, kkt_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(sw_tq), np.asarray(ref_tq),
                               atol=2e-3)


def test_pallas_gj_inverse_interpret(rng):
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import batched_inverse
    B, n = 5, 120
    a = rng.standard_normal((B, n, n)).astype(np.float32)
    m = np.einsum("bij,bkj->bik", a, a) / n + 0.1 * np.eye(n)[None]
    out = np.asarray(batched_inverse(jnp.asarray(m), block=2,
                                     interpret=True))
    resid = np.abs(np.einsum("bij,bjk->bik", out, m)
                   - np.eye(n)[None]).max()
    assert resid < 1e-4


def test_pallas_sweep_inverse_interpret(rng):
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_spd,
    )
    B, n = 5, 120
    a = rng.standard_normal((B, n, n)).astype(np.float32)
    m = np.einsum("bij,bkj->bik", a, a) / n + 0.1 * np.eye(n)[None]
    m = 0.5 * (m + m.transpose(0, 2, 1))
    out = np.asarray(batched_inverse_spd(jnp.asarray(m), block=2,
                                         interpret=True))
    resid = np.abs(np.einsum("bij,bjk->bik", out, m)
                   - np.eye(n)[None]).max()
    assert resid < 1e-4


def test_pallas_transposed_inverse_interpret(rng):
    """Transposed-layout (batch-in-lanes) GJ and sweep kernels match the
    dense inverse, including non-multiple-of-8 n (sublane padding) and
    batch not a multiple of sblock (lane padding)."""
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_T, batched_inverse_sweep_T,
    )
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_sweep_T_chunked,
    )
    for n in (12, 120):
        a = rng.standard_normal((5, n, n)).astype(np.float32)
        m = np.einsum("bij,bkj->bik", a, a) / n + 0.1 * np.eye(n)[None]
        m = 0.5 * (m + m.transpose(0, 2, 1))
        for f in (
            lambda x: batched_inverse_T(x, sblock=2, interpret=True),
            lambda x: batched_inverse_sweep_T(x, sblock=2,
                                              interpret=True),
            lambda x: batched_inverse_sweep_T(x, sblock=2, sym_col=True,
                                              interpret=True),
            lambda x: batched_inverse_sweep_T_chunked(x, sblock=2,
                                                      interpret=True),
        ):
            out = np.asarray(f(jnp.asarray(m)))
            resid = np.abs(np.einsum("bij,bjk->bik", out, m)
                           - np.eye(n)[None]).max()
            assert resid < 1e-4, n


def test_pallas_small_inverse_interpret(rng):
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_small,
    )
    for n in (12, 32, 57):
        a = rng.standard_normal((5, n, n)).astype(np.float32)
        m = np.einsum("bij,bkj->bik", a, a) / n + 0.1 * np.eye(n)[None]
        out = np.asarray(batched_inverse_small(jnp.asarray(m), block=4,
                                               interpret=True))
        resid = np.abs(np.einsum("bij,bjk->bik", out, m)
                       - np.eye(n)[None]).max()
        assert resid < 1e-4, n


def test_spd_block_inverse_interpret(rng):
    """Schur-complement recursive inverse == dense inverse, incl. a size
    that needs identity padding (120 -> 128) and one needing two pad
    levels (200 -> 256); output must be symmetric (the fused-ADMM kernel
    relies on it)."""
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        spd_block_inverse,
    )
    for n in (64, 120, 200):
        a = rng.standard_normal((5, n, n)).astype(np.float32)
        m = np.einsum("bij,bkj->bik", a, a) / n + 0.1 * np.eye(n)[None]
        m = 0.5 * (m + m.transpose(0, 2, 1))
        out = np.asarray(spd_block_inverse(jnp.asarray(m), base=32,
                                           block=4, interpret=True))
        ref = np.linalg.inv(m.astype(np.float64))
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 1e-4, (n, rel)
        assert np.abs(out - out.transpose(0, 2, 1)).max() == 0.0


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[2].shape == (12,)
    assert not bool(jnp.isnan(out[2]).any())


def test_bench_scaling_cpu_mesh():
    """bench.py's multi-device scaling mode on the virtual 8-device CPU
    mesh: the shard_map'ed pallas_shared tick compiles, executes at 1 and
    8 devices, and reports per-device-count throughput (the code path the
    driver's BASELINE scaling points will use on a real multi-chip
    slice)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    out = bench.bench_scaling(base_batch=8, ticks=2, reps=1,
                              kkt_backend="gj", interpret=True,
                              max_devices=8)
    assert "1" in out and "8" in out
    for k, v in out.items():
        assert v["solves_per_s"] > 0
        assert v["solves_per_s_per_chip"] > 0


def test_rank_masked_gj_matches_sequential():
    """Roll-free rank-aggregated GJ (interpret mode): exact
    sequential-GJ-equivalent progressive panel corrections — identical
    inverses at every rank. (On-chip it is a documented negative result:
    rank 4 is slower than flat GJ and rank 8+ crashes Mosaic; see the
    kernel docstring.)"""
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_rank_masked,
    )

    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 120, 120)).astype(np.float32)
    m = jnp.asarray(a @ a.transpose(0, 2, 1)
                    + 120 * np.eye(120, dtype=np.float32))
    ref = np.asarray(batched_inverse(m, block=4, interpret=True))
    for rank in (4, 8):
        x = np.asarray(batched_inverse_rank_masked(m, rank=rank, block=4,
                                                   interpret=True))
        np.testing.assert_allclose(x, ref, rtol=1e-3, atol=1e-5)


def test_fused_admm_shared_tick_chol_backend():
    """'chol' KKT backend (blocked-Cholesky inverse) matches
    vmap(control_tick) through the shared route."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )
    cfg, params = bench_cfg()
    B = 3
    pb = batched.randomize_params(jax.random.PRNGKey(0), B, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(B))
    cs = cs.replace(
        root_pos=jnp.tile(jnp.array([0.0, 0, 0.3]), (B, 1)),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (B, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (B, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(B))
    mem = mem.replace(tick=jnp.full((B,), cfg.torque_warmup_ticks,
                                    jnp.int32))  # real torques, not
    #                                 the zero-torque warmup shield
    sens = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(B))
    sens = sens.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (B, 4)),
        foot_force=jnp.full((B, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    _, _, ref_tq = jax.vmap(
        lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
        pb, cs, mem, sens)
    _, _, ch_tq = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt, admm_backend="pallas_shared",
        kkt_backend="chol", admm_block=2, kkt_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(ch_tq), np.asarray(ref_tq),
                               atol=2e-3)


def test_batched_tick_matches_single_through_contact_flip():
    """Multi-tick equivalence ACROSS a contact flip: the batched
    pallas_shared schedule must reproduce vmap(control_tick)'s
    trajectory through the flip bookkeeping (warm-start masking, rho
    reset, scaling-table switch) — a single-tick check cannot catch a
    divergence in the carried solver memory."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.types import JoyCmd
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod

    cfg, params = bench_cfg()
    B = 2
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(2), B, params)
    # start the gait just before a phase boundary so a flip happens
    # within a few ticks
    cs = cs.replace(gait_counter=jnp.broadcast_to(
        jnp.array([116.0, 236.0, 236.0, 116.0]), (B, 4)))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)

    cs_a, mem_a = cs, mem
    cs_b, mem_b = cs, mem
    flipped = False
    prev = np.asarray(cs.contacts)
    for t in range(8):
        cs_a, mem_a, tq_a = jax.vmap(
            lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
            pb, cs_a, mem_a, sens)
        cs_b, mem_b, tq_b = batched.batched_control_tick(
            cfg, pb, cs_b, mem_b, sens, joy, dt,
            admm_backend="pallas_shared", admm_block=2, kkt_block=2,
            interpret=True)
        cur = np.asarray(cs_b.contacts)
        flipped = flipped or (cur != prev).any()
        prev = cur
        np.testing.assert_allclose(np.asarray(tq_b), np.asarray(tq_a),
                                   atol=5e-3,
                                   err_msg=f"diverged at tick {t}")
        # (the carried rho estimate is a ratio of noise-level residuals
        # at convergence and drifts a few percent between the two
        # schedules — the torque equivalence above is the real check)
    assert flipped, "test never crossed a contact flip"


def _eliminated_kkt_batch(patterns):
    """(B, 120, 120) scaled KKT matrices of the swing-eliminated family,
    one per contact pattern, with the production per-pattern scaling."""
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    cfg, params = bench_cfg()
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    table = srb.reference_mpc_scaling_table(params)
    ms, lives = [], []
    for pat in patterns:
        c = jnp.asarray(pat)
        p2, q2, l2, u2 = srb.eliminate_swing(p0, q0, lb, ub, c,
                                             cfg.horizon)
        scal = grf.scaling_for_contacts(table, c)
        scal = qpx.rescale_cost(p2, q2, scal)
        ms.append(qpx.scaled_kkt_matrix(
            p2, q2, a0m, l2, u2, settings,
            jnp.float32(grf._MPC_RHO0), scal))
        lives.append(jnp.tile(jnp.repeat(c, 3), cfg.horizon))
    return jnp.stack(ms), jnp.stack(lives)


def test_reduced_kkt_inverse_matches_full():
    """Contact-pattern shape reduction (ops/qp.reduced_kkt_inverse):
    2-stance scenarios solve through the gathered 64-var kernel,
    3/4-stance through the capacity-bounded full-size bucket — the
    result must match the dense inverse on every scenario."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    patterns = [
        [True, False, False, True],    # trot pair A   (60 live)
        [False, True, True, False],    # trot pair B   (60 live)
        [True, True, True, False],     # early contact (90 live)
        [True, True, True, True],      # stand         (120 live)
        [True, False, False, True],    # trot again    (60 live)
        [True, True, True, True],      # stand         (120 live)
    ]
    m_b, live = _eliminated_kkt_batch(patterns)
    out = np.asarray(qpx.reduced_kkt_inverse(
        m_b, live, n_r=64, big_capacity=3, block=2, small_block=2,
        interpret=True))
    m64 = np.asarray(m_b, np.float64)
    eye = np.eye(120)
    resid = np.abs(np.einsum("bij,bjk->bik", out, m64) - eye).max()
    assert resid < 5e-3, resid
    # dead rows/cols of the inverse must carry no live coupling
    lm = np.asarray(live[0], bool)
    assert np.abs(out[0][~lm][:, lm]).max() == 0.0


def test_reduced_kkt_inverse_overflow_fallback():
    """More >n_r scenarios than big_capacity => the whole batch must
    fall back to the full-size kernel (correctness never depends on the
    capacity guess)."""
    from a1_qp_mpc_controller_tpu.ops import qp as qpx

    patterns = [
        [True, True, True, True],
        [True, True, True, False],
        [True, True, True, True],
        [True, False, False, True],
    ]
    m_b, live = _eliminated_kkt_batch(patterns)
    out = np.asarray(qpx.reduced_kkt_inverse(
        m_b, live, n_r=64, big_capacity=2, block=2, small_block=2,
        interpret=True))   # 3 scenarios exceed n_r=64 > capacity 2
    m64 = np.asarray(m_b, np.float64)
    resid = np.abs(np.einsum("bij,bjk->bik", out, m64)
                   - np.eye(120)).max()
    assert resid < 5e-3, resid


def test_reduced_tick_matches_single_through_contact_flip():
    """Multi-tick flip-crossing equivalence for kkt_backend='reduced':
    the reduced-shape schedule (small-kernel + big-bucket + overflow
    guard all exercised at B=2, capacity 1) must reproduce
    vmap(control_tick) through the flip bookkeeping."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick

    cfg, params = bench_cfg()
    B = 2
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(2), B, params)
    cs = cs.replace(gait_counter=jnp.broadcast_to(
        jnp.array([116.0, 236.0, 236.0, 116.0]), (B, 4)))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)

    cs_a, mem_a = cs, mem
    cs_b, mem_b = cs, mem
    flipped = False
    prev = np.asarray(cs.contacts)
    for t in range(8):
        cs_a, mem_a, tq_a = jax.vmap(
            lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
            pb, cs_a, mem_a, sens)
        cs_b, mem_b, tq_b = batched.batched_control_tick(
            cfg, pb, cs_b, mem_b, sens, joy, dt,
            admm_backend="pallas_shared", kkt_backend="reduced",
            kkt_reduced_nr=64, kkt_big_capacity=1,
            admm_block=2, kkt_block=2, interpret=True)
        cur = np.asarray(cs_b.contacts)
        flipped = flipped or (cur != prev).any()
        prev = cur
        np.testing.assert_allclose(np.asarray(tq_b), np.asarray(tq_a),
                                   atol=5e-3,
                                   err_msg=f"diverged at tick {t}")
    assert flipped, "test never crossed a contact flip"


def test_rescue_pass_improves_convergence_keeps_converged_bits():
    """Flip-rescue second ADMM pass: at a starved iteration budget some
    flip-tick scenarios ship unconverged; rescue_capacity>0 must (a) not
    reduce the converged fraction, (b) leave scenarios that converged in
    the first pass bit-identical, and (c) improve the worst residual."""
    cfg, params = bench_cfg()
    cfg = dataclasses.replace(cfg, mpc_qp_iters=5)   # starved budget
    B = 4
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(3), B, params)
    cs = cs.replace(gait_counter=jnp.broadcast_to(
        jnp.array([118.0, 238.0, 238.0, 118.0]), (B, 4)))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)

    # walk a few ticks to a flip, then compare one tick +/- rescue
    for _ in range(3):
        cs, mem, _ = batched.batched_control_tick(
            cfg, pb, cs, mem, sens, joy, dt,
            admm_backend="pallas_shared", admm_block=2, kkt_block=2,
            interpret=True)
    _, _, tq0, st0 = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt,
        admm_backend="pallas_shared", admm_block=2, kkt_block=2,
        return_stats=True, interpret=True)
    _, _, tq1, st1 = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt,
        admm_backend="pallas_shared", admm_block=2, kkt_block=2,
        rescue_capacity=2, rescue_iters=200,
        return_stats=True, interpret=True)
    c0 = np.asarray(st0["converged"])
    c1 = np.asarray(st1["converged"])
    assert not c0.all(), "budget not starved enough to exercise rescue"
    assert c1.sum() >= c0.sum()
    # scenarios converged without rescue are untouched (bit-identical)
    np.testing.assert_array_equal(np.asarray(tq1)[c0],
                                  np.asarray(tq0)[c0])
    r0 = np.maximum(np.asarray(st0["prim_res"]),
                    np.asarray(st0["dual_res"]))
    r1 = np.maximum(np.asarray(st1["prim_res"]),
                    np.asarray(st1["dual_res"]))
    assert r1[~c0].max() < r0[~c0].max()


def test_reduced_admm_tick_matches_single_through_contact_flip():
    """Whole-solve reduction (kkt_backend='reduced_admm': inverse AND
    fused ADMM at the gathered stance-block shape) reproduces
    vmap(control_tick) through contact flips — the dead-variable
    analysis says iterates match exactly, so the tolerance here is
    tight."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick

    cfg, params = bench_cfg()
    B = 2
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(2), B, params)
    cs = cs.replace(gait_counter=jnp.broadcast_to(
        jnp.array([116.0, 236.0, 236.0, 116.0]), (B, 4)))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    cs_a, mem_a = cs, mem
    cs_b, mem_b = cs, mem
    flipped = False
    prev = np.asarray(cs.contacts)
    for t in range(8):
        cs_a, mem_a, tq_a = jax.vmap(
            lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
            pb, cs_a, mem_a, sens)
        cs_b, mem_b, tq_b = batched.batched_control_tick(
            cfg, pb, cs_b, mem_b, sens, joy, dt,
            admm_backend="pallas_shared", kkt_backend="reduced_admm",
            kkt_reduced_nr=64, kkt_big_capacity=1,
            admm_block=2, kkt_block=2, interpret=True)
        cur = np.asarray(cs_b.contacts)
        flipped = flipped or (cur != prev).any()
        prev = cur
        np.testing.assert_allclose(np.asarray(tq_b), np.asarray(tq_a),
                                   atol=2e-3,
                                   err_msg=f"diverged at tick {t}")
    assert flipped, "test never crossed a contact flip"


def test_reduced_admm_rescue_improves_worst_residual():
    """The reduced-route rescue (rho-refactored continuation over
    gathered unconverged/flipped scenarios) must not lose converged
    scenarios and must improve the worst residual at a starved
    budget."""
    cfg, params = bench_cfg()
    cfg = dataclasses.replace(cfg, mpc_qp_iters=5)
    B = 4
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(3), B, params)
    cs = cs.replace(gait_counter=jnp.broadcast_to(
        jnp.array([118.0, 238.0, 238.0, 118.0]), (B, 4)))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    for _ in range(3):
        cs, mem, _ = batched.batched_control_tick(
            cfg, pb, cs, mem, sens, joy, dt,
            admm_backend="pallas_shared", kkt_backend="reduced_admm",
            kkt_big_capacity=2, admm_block=2, kkt_block=2,
            interpret=True)
    _, _, _, st0 = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt,
        admm_backend="pallas_shared", kkt_backend="reduced_admm",
        kkt_big_capacity=2, admm_block=2, kkt_block=2,
        return_stats=True, interpret=True)
    _, _, _, st1 = batched.batched_control_tick(
        cfg, pb, cs, mem, sens, joy, dt,
        admm_backend="pallas_shared", kkt_backend="reduced_admm",
        kkt_big_capacity=2, admm_block=2, kkt_block=2,
        rescue_capacity=2, rescue_iters=200,
        return_stats=True, interpret=True)
    c0 = np.asarray(st0["converged"])
    c1 = np.asarray(st1["converged"])
    assert not c0.all(), "budget not starved enough"
    assert c1.sum() >= c0.sum()
    r0 = np.maximum(np.asarray(st0["prim_res"]),
                    np.asarray(st0["dual_res"]))
    r1 = np.maximum(np.asarray(st1["prim_res"]),
                    np.asarray(st1["dual_res"]))
    assert r1[~c0].max() < r0[~c0].max()


def test_closed_loop_batched_step_runs_and_stays_up():
    """batched_closed_loop_step (the round-4 bench unit: plant sensor
    read -> hoisted-Pallas tick -> plant step) holds the batch standing
    and returns stats when asked. Runs in a SUBPROCESS: compiling this
    program after a long in-process test session deterministically hits
    the jaxlib-0.9.0 backend_compile_and_load segfault (CLAUDE.md);
    in a fresh process it is solid."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "import jax.numpy as jnp\n"
        "import dataclasses\n"
        "from a1_qp_mpc_controller_tpu.config import load_profile\n"
        "from a1_qp_mpc_controller_tpu.parallel import batched\n"
        "from a1_qp_mpc_controller_tpu.types import JoyCmd\n"
        "cfg, params = load_profile('gazebo_mpc')\n"
        "cfg = dataclasses.replace(cfg, mpc_qp_iters=25, "
        "mpc_solver_mode='fixed')\n"
        "B = 2\n"
        "pb, terr, carry = batched.make_flat_batch("
        "cfg, jax.random.PRNGKey(0), B, params)\n"
        "joy = JoyCmd.zeros()\n"
        "dt = jnp.float32(cfg.control_dt)\n"
        "kw = dict(admm_backend='pallas_shared', "
        "kkt_backend='reduced_admm', kkt_big_capacity=1, admm_block=2, "
        "kkt_block=2, rescue_capacity=1, interpret=True)\n"
        "for _ in range(3):\n"
        "    carry = batched.batched_closed_loop_step("
        "cfg, pb, terr, carry, joy, dt, **kw)\n"
        "carry, stats = batched.batched_closed_loop_step("
        "cfg, pb, terr, carry, joy, dt, return_stats=True, **kw)\n"
        "z = np.asarray(carry.ps.root_pos[:, 2])\n"
        "assert np.isfinite(z).all() and (z > 0.2).all() "
        "and (z < 0.4).all(), z\n"
        "assert stats['converged'].shape == (B,)\n"
        "print('CLOSED_LOOP_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CLOSED_LOOP_OK" in out.stdout


def test_reduced_admm_mixed_stance_big_bucket_correct():
    """Round-4 review finding: the reduced_admm route must solve
    scenarios with MORE live blocks than the reduced tier (3-4 stance)
    at full size via the big bucket — truncating them to the first 22
    blocks silently solves a wrong QP. This pins the exact exposure:
    mixed batch where the big-count is nonzero but UNDER capacity (so
    the overflow fallback does not fire), compared against
    vmap(control_tick) per scenario."""
    from a1_qp_mpc_controller_tpu.control.controller import control_tick

    cfg, params = bench_cfg()
    B = 3
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(4), B, params)
    # scenario 1 stands (4-stance, 40 live blocks); 0 and 2 trot
    gc = np.broadcast_to(np.array([30.0, 150.0, 150.0, 30.0]),
                         (B, 4)).copy()
    gc[1] = [30.0, 60.0, 60.0, 30.0]   # all counters in stance half
    cs = cs.replace(gait_counter=jnp.asarray(gc))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    cs_a, mem_a = cs, mem
    cs_b, mem_b = cs, mem
    saw_mixed = False
    for t in range(4):
        cs_a, mem_a, tq_a = jax.vmap(
            lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt))(
            pb, cs_a, mem_a, sens)
        cs_b, mem_b, tq_b = batched.batched_control_tick(
            cfg, pb, cs_b, mem_b, sens, joy, dt,
            admm_backend="pallas_shared", kkt_backend="reduced_admm",
            kkt_reduced_nr=64, kkt_big_capacity=2,
            admm_block=2, kkt_block=2, interpret=True)
        ns = np.asarray(cs_b.contacts).sum(axis=1)
        saw_mixed = saw_mixed or ((ns > 2).any() and (ns <= 2).any())
        # tolerances discriminate the bug from schedule noise: f32
        # noise between the two schedules accumulates to ~3e-3 on
        # torques / ~0.01 N on forces over 4 warm-carried ticks, while
        # a truncated big-bucket scenario sits ~2e-2 off on torques /
        # 0.12+ N on forces and grows
        np.testing.assert_allclose(np.asarray(tq_b), np.asarray(tq_a),
                                   atol=5e-3,
                                   err_msg=f"diverged at tick {t} "
                                           f"(stance counts {ns})")
        np.testing.assert_allclose(
            np.asarray(cs_b.foot_forces_grf),
            np.asarray(cs_a.foot_forces_grf), atol=0.05,
            err_msg=f"GRF diverged at tick {t} (stance counts {ns})")
    assert saw_mixed, "batch never mixed 2-stance with 3/4-stance"


def test_amortized_tick_golden_through_flips():
    """The cross-tick amortized-factorization route
    (kkt_backend='amortized', round 5): over a flip-crossing window the
    solved forces of every scenario stay within golden tolerance of the
    f64 optimum of its OWN per-tick QP (the same gate run_gate applies
    to the single-scenario path), and the machinery (mandatory flip
    refresh + Neumann-corrected stale inverses + exact-refactor rescue)
    keeps the batch converged. This route is APPROXIMATE in the
    x-update preconditioner, so the gate is the f64 optimum, not
    bitwise equivalence with vmap(control_tick)."""
    import jax.tree_util as jtu

    from a1_qp_mpc_controller_tpu.ops import qp_ref
    from a1_qp_mpc_controller_tpu.runtime.golden import rebuild_mpc_qp

    cfg, params = bench_cfg()
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25)
    B = 3
    pb, cs, mem, sens = batched.make_bench_state(
        cfg, jax.random.PRNGKey(4), B, params)
    # stagger just-before-flip gait phases so flips land on different
    # ticks in different scenarios (the hard case for the shared carry)
    cs = cs.replace(gait_counter=jnp.stack([
        jnp.array([116.0, 236.0, 236.0, 116.0]),
        jnp.array([110.0, 230.0, 230.0, 110.0]),
        jnp.array([100.0, 220.0, 220.0, 100.0])]))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    kc = batched.make_kkt_carry(cfg, B)

    devs = []
    convs = []
    flipped = False
    prev = np.asarray(cs.contacts)
    for t in range(12):
        cs, mem, tq, kc, stats = batched.batched_control_tick(
            cfg, pb, cs, mem, sens, joy, dt,
            admm_backend="pallas_shared", kkt_backend="amortized",
            kkt_carry=kc, kkt_amortize_capacity=1, kkt_refine_order=2,
            admm_block=2, kkt_block=2, rescue_capacity=2,
            rescue_iters=150, return_stats=True, interpret=True)
        cur = np.asarray(cs.contacts)
        flipped = flipped or (cur != prev).any()
        prev = cur
        convs.append(np.asarray(stats["converged"]))
        for i in range(B):
            cs_i = jtu.tree_map(lambda a: a[i], cs)
            p_i = jtu.tree_map(lambda a: a[i], pb)
            p_mat, q_vec, a_mat, lb, ub = rebuild_mpc_qp(cfg, p_i, cs_i,
                                                         dt)
            x64, _, _, _ = qp_ref.solve_qp_ref(
                np.asarray(p_mat, np.float64),
                np.asarray(q_vec, np.float64),
                np.asarray(a_mat, np.float64),
                np.asarray(lb, np.float64),
                np.asarray(ub, np.float64), eps=1e-9)
            f_ref = x64[:12].reshape(4, 3)
            f_ours = (np.asarray(cs_i.root_rot_mat)
                      @ np.asarray(cs_i.foot_forces_grf).T)
            devs.append(np.abs(f_ours.T - f_ref).max())
    assert flipped, "test never crossed a contact flip"
    devs = np.array(devs)
    convs = np.concatenate(convs)
    assert convs.mean() >= 0.9, convs.mean()
    assert devs.max() < 2.0, (devs.max(), devs)
