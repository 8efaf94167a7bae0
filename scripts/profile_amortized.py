"""TPU A/B: cross-tick amortized KKT factorization vs the round-4 best.

Full-tick closed-loop A/B at batch 1024 from a trot-warm state, all
candidates in ONE process (CLAUDE.md: cross-run tunnel variance is
+-15%; only within-process comparisons are load-bearing):

  - kkt='full'      round-4 winner (full-size inverse every tick)
  - amortized cap/order sweeps (kkt_backend='amortized')

Each candidate reports ticks/s, solves/s, and the converged frac over a
10-tick audit window (quality-first: a faster config may not buy its
speed with unconverged solves).

    python scripts/profile_amortized.py            # run on TPU
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def main():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel import batched
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(
        cfg, mpc_qp_iters=25, mpc_solver_mode="fixed",
        # round-5 shipped schedule: strided 32-tick post-flip rescue
        # window (see config.mpc_cooldown_ticks); override with env
        # AB_COOLDOWN/AB_STRIDE to A/B the window itself
        mpc_cooldown_ticks=int(os.environ.get("AB_COOLDOWN", "32")),
        mpc_cooldown_stride=int(os.environ.get("AB_STRIDE", "4")),
        mpc_cooldown_dense=int(os.environ.get("AB_DENSE", "4")),
        mpc_drift_rescue_n=float(os.environ.get("AB_DRIFT", "0.0")))
    batch = int(os.environ.get("AB_BATCH", "1024"))
    ticks = int(os.environ.get("AB_TICKS", "20"))
    reps = int(os.environ.get("AB_REPS", "3"))
    log(f"devices: {jax.devices()}  batch={batch}")

    pb, terr, carry0 = batched.make_flat_batch(
        cfg, jax.random.PRNGKey(0), batch, params)
    joy_w = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                   velx=jnp.float32(0.3))
    joy_s = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)

    base_kw = dict(admm_backend="pallas_shared", kkt_block=32,
                   rescue_capacity=int(os.environ.get("AB_RESCUE",
                                                      "192")),
                   rescue_iters=150)

    # warm into the trot with the reference backend
    @jax.jit
    def warm(carry):
        def body(c, t):
            j = jax.tree_util.tree_map(
                lambda a, b: jnp.where(t < 120, a, b), joy_s, joy_w)
            c = batched.batched_closed_loop_step(
                cfg, pb, terr, c, j, dt, kkt_backend="gj",
                admm_block=64, **base_kw)
            return c, None
        return jax.lax.scan(body, carry, jnp.arange(500))[0]

    t0 = time.perf_counter()
    carry = warm(carry0)
    jax.block_until_ready(carry.ps.root_pos)
    alive = float(jnp.mean((~jnp.isnan(
        carry.ps.root_pos[:, 2])).astype(jnp.float32)))
    log(f"warm: {time.perf_counter() - t0:.1f}s alive={alive:.4f}")

    def run_candidate(name, kkt_backend, extra):
        kw = dict(base_kw, kkt_backend=kkt_backend, **extra)
        amort = kkt_backend == "amortized"

        if amort:
            kc0 = batched.make_kkt_carry(cfg, batch)

            @jax.jit
            def run(carry, kc):
                def body(c, _):
                    cr, k = c
                    cr, k = batched.batched_closed_loop_step(
                        cfg, pb, terr, cr, joy_w, dt, kkt_carry=k, **kw)
                    return (cr, k), None
                return jax.lax.scan(body, (carry, kc), None,
                                    length=ticks)[0]

            @jax.jit
            def audit(carry, kc):
                def body(c, _):
                    cr, k = c
                    cr, k, st = batched.batched_closed_loop_step(
                        cfg, pb, terr, cr, joy_w, dt, kkt_carry=k,
                        return_stats=True, **kw)
                    return (cr, k), jnp.mean(
                        st["converged"].astype(jnp.float32))
                return jax.lax.scan(body, (carry, kc), None, length=10)

            t0 = time.perf_counter()
            out, kc = run(carry, kc0)   # first run warms kc (full refresh)
            jax.block_until_ready(out.cs.joint_torques)
            log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
            best = 0.0
            for _ in range(reps):
                t0 = time.perf_counter()
                out2, kc2 = run(out, kc)
                jax.block_until_ready(out2.cs.joint_torques)
                best = max(best, batch * ticks
                           / (time.perf_counter() - t0))
            (_, _), conv = audit(out, kc)
            conv = jax.device_get(conv)
        else:
            @jax.jit
            def run(carry):
                def body(c, _):
                    c = batched.batched_closed_loop_step(
                        cfg, pb, terr, c, joy_w, dt, **kw)
                    return c, None
                return jax.lax.scan(body, carry, None, length=ticks)[0]

            @jax.jit
            def audit(carry):
                def body(c, _):
                    c, st = batched.batched_closed_loop_step(
                        cfg, pb, terr, c, joy_w, dt, return_stats=True,
                        **kw)
                    return c, jnp.mean(st["converged"].astype(jnp.float32))
                return jax.lax.scan(body, carry, None, length=10)

            t0 = time.perf_counter()
            out = run(carry)
            jax.block_until_ready(out.cs.joint_torques)
            log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
            best = 0.0
            for _ in range(reps):
                t0 = time.perf_counter()
                out2 = run(out)
                jax.block_until_ready(out2.cs.joint_torques)
                best = max(best, batch * ticks
                           / (time.perf_counter() - t0))
            conv = jax.device_get(audit(out)[1])
        log(f"  {name}: {best:,.0f} solves/s  "
            f"conv mean={conv.mean():.4f} min={conv.min():.4f}")
        return best, float(conv.mean())

    results = {}
    candidates = [
        ("full(r4 best)", "reduced_admm",
         dict(kkt_reduced_nr=128, kkt_big_capacity=160, admm_block=128)),
        ("amort c256 o2", "amortized",
         dict(kkt_amortize_capacity=256, kkt_refine_order=2,
              admm_block=64)),
        ("amort c192 o2", "amortized",
         dict(kkt_amortize_capacity=192, kkt_refine_order=2,
              admm_block=64)),
        ("amort c320 o1", "amortized",
         dict(kkt_amortize_capacity=320, kkt_refine_order=1,
              admm_block=64)),
        ("amort c256 o1", "amortized",
         dict(kkt_amortize_capacity=256, kkt_refine_order=1,
              admm_block=64)),
        ("amort c160 o2", "amortized",
         dict(kkt_amortize_capacity=160, kkt_refine_order=2,
              admm_block=64)),
        ("amort c128 o2", "amortized",
         dict(kkt_amortize_capacity=128, kkt_refine_order=2,
              admm_block=64)),
        ("amort c128 o3", "amortized",
         dict(kkt_amortize_capacity=128, kkt_refine_order=3,
              admm_block=64)),
        ("amort c96 o3", "amortized",
         dict(kkt_amortize_capacity=96, kkt_refine_order=3,
              admm_block=64)),
    ]
    sel = os.environ.get("AB_ONLY")
    for name, kb, extra in candidates:
        if sel and sel not in name:
            continue
        try:
            results[name] = run_candidate(name, kb, extra)
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED: {type(e).__name__}: {e}")
    log("\nsummary:")
    for k, (sps, conv) in sorted(results.items(), key=lambda kv: -kv[1][0]):
        log(f"  {k:18s} {sps:10,.0f} solves/s  conv {conv:.4f}")


if __name__ == "__main__":
    main()
