"""Round-4 closed-loop throughput shootout: gj vs reduced KKT backends,
with the plant in the loop (physical stance distribution).

Warms the batch ~1.25 s into a steady trot, prints the per-tick stance
histogram (how many scenarios have <=2 / 3 / 4 stance legs — decides the
big-bucket capacity), then scan-times the closed-loop step per backend
and audits convergence.

    python scripts/profile_closed.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--warm-ticks", type=int, default=500)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_flat_batch,
    )
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=args.iters,
                              mpc_solver_mode="fixed")
    pb, terr, carry = make_flat_batch(cfg, jax.random.PRNGKey(0), b,
                                      params)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)
    print(f"batch={b} iters={args.iters} device={jax.devices()[0]}",
          flush=True)

    def step(carry2, backend, cap, rescue, rescue_iters=25):
        c, pb2, terr2 = carry2
        c = batched_closed_loop_step(
            cfg, pb2, terr2, c, joy, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend=backend, kkt_big_capacity=cap,
            rescue_capacity=rescue, rescue_iters=rescue_iters)
        return (c, pb2, terr2)

    joy_stand = JoyCmd.zeros()

    def step_j(carry2, j, backend, cap, rescue):
        c, pb2, terr2 = carry2
        c = batched_closed_loop_step(
            cfg, pb2, terr2, c, j, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend=backend, kkt_big_capacity=cap,
            rescue_capacity=rescue)
        return (c, pb2, terr2)

    @jax.jit
    def warm(carry, pb, terr):
        # stand first (EKF settles, feet load), then walk into the trot
        def body(c, t):
            j = jax.tree_util.tree_map(
                lambda a, b: jnp.where(t < 120, a, b), joy_stand, joy)
            return step_j(c, j, "gj", 256, 0), None
        return jax.lax.scan(body, (carry, pb, terr),
                            jnp.arange(args.warm_ticks))[0][0]

    carry = warm(carry, pb, terr)
    jax.block_until_ready(carry.ps.root_pos)
    alive = float(jnp.mean(
        (~jnp.isnan(carry.ps.root_pos[:, 2])).astype(jnp.float32)))
    print(f"after warm: alive_frac={alive:.4f} "
          f"mean_z={float(jnp.nanmean(carry.ps.root_pos[:, 2])):.3f}",
          flush=True)

    @jax.jit
    def stance_hist(carry, pb, terr):
        def body(c, _):
            c2 = step(c, "gj", 256, 0)
            ns = jnp.sum(c2[0].cs.contacts, axis=1)
            return c2, jnp.stack([jnp.sum(ns <= 2), jnp.sum(ns == 3),
                                  jnp.sum(ns == 4)])
        return jax.lax.scan(body, (carry, pb, terr), None, length=12)[1]

    hist = jax.device_get(stance_hist(carry, pb, terr))
    print(f"per-tick stance counts (<=2 / 3 / 4 legs):\n{hist}",
          flush=True)

    # isolate the plant+sensor cost (control held at last torques)
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod

    def plant_only(carry2):
        c, pb2, terr2 = carry2
        sensors = jax.vmap(
            lambda p, ps, pv: plant_mod.read_sensors(p, ps, pv, dt)
        )(pb2, c.ps, c.prev_root_lin_vel)
        prev = c.ps.root_lin_vel
        ps = jax.vmap(
            lambda p, t, s, q: plant_mod.plant_step(p, t, s, q, dt, 5)
        )(pb2, terr2, c.ps, c.cs.joint_torques
          + 1e-6 * sensors.foot_force[:, :1])
        return (c.replace(ps=ps, prev_root_lin_vel=prev), pb2, terr2)

    t = time_scan(plant_only, (carry, pb, terr), name="plant+sensors only",
                  printer=functools.partial(print, flush=True))

    for backend, cap, rescue, r_it in (
            ("gj", 256, 0, 25), ("reduced", 256, 0, 25),
            ("reduced", 256, 128, 25), ("reduced", 256, 128, 75),
            ("reduced", 256, 192, 100)):
        t = time_scan(
            functools.partial(step, backend=backend, cap=cap,
                              rescue=rescue, rescue_iters=r_it),
            (carry, pb, terr),
            name=(f"closed tick kkt={backend} cap={cap} rescue={rescue}"
                  f"x{r_it}"),
            printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)

        @jax.jit
        def conv10(carry, pb, terr, backend=backend, cap=cap,
                   rescue=rescue, r_it=r_it):
            def body(c, _):
                cr, pb2, terr2 = c
                from a1_qp_mpc_controller_tpu.parallel.batched import (
                    batched_closed_loop_step as bstep,
                )
                cr, stats = bstep(
                    cfg, pb2, terr2, cr, joy, dt,
                    admm_backend="pallas_shared", kkt_block=32,
                    admm_block=64, kkt_backend=backend,
                    kkt_big_capacity=cap, rescue_capacity=rescue,
                    rescue_iters=r_it, return_stats=True)
                return (cr, pb2, terr2), jnp.mean(
                    stats["converged"].astype(jnp.float32))
            return jax.lax.scan(body, (carry, pb, terr), None,
                                length=10)[1]

        conv = jax.device_get(conv10(carry, pb, terr))
        print(f"  converged frac over 10 ticks: mean={conv.mean():.4f} "
              f"min={conv.min():.4f}", flush=True)


if __name__ == "__main__":
    main()
