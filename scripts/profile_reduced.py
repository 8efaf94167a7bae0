"""Round-4 shootout: contact-pattern-reduced KKT inverse vs flat GJ.

Times the FULL batched tick (scan-timed on device) from a trot-warm
state — the reduction only pays when most scenarios are 2-stance, so the
state is advanced ~60 ticks into the walk first. Also audits the
per-tick stance distribution (how many scenarios exceed n_r live vars)
so the big-bucket capacity can be chosen from data.

    python scripts/profile_reduced.py --batch 1024
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
    ap.add_argument("--warm-ticks", type=int, default=60)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=args.iters,
                              mpc_solver_mode="fixed")
    pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0), b,
                                            params)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)
    print(f"batch={b} iters={args.iters} device={jax.devices()[0]}",
          flush=True)

    def tick(carry, backend, cap):
        cs, mem, pb, sensors = carry
        cs, mem, _ = batched_control_tick(
            cfg, pb, cs, mem, sensors, joy, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend=backend, kkt_big_capacity=cap)
        return (cs, mem, pb, sensors)

    # warm into the trot with the production gj backend
    @jax.jit
    def warm(cs, mem, pb, sensors):
        def body(c, _):
            return tick(c, "gj", 256), None
        return jax.lax.scan(body, (cs, mem, pb, sensors), None,
                            length=args.warm_ticks)[0]

    cs, mem, pb, sensors = warm(cs, mem, pb, sensors)
    jax.block_until_ready(cs.joint_torques)
    # stance distribution at the warm state (and 10 ticks later)
    @jax.jit
    def stance_hist(cs, mem, pb, sensors):
        def body(c, _):
            c2 = tick(c, "gj", 256)
            ns = jnp.sum(c2[0].contacts, axis=1)
            return c2, jnp.stack([jnp.sum(ns <= 2), jnp.sum(ns == 3),
                                  jnp.sum(ns == 4)])
        return jax.lax.scan(body, (cs, mem, pb, sensors), None,
                            length=10)[1]
    hist = jax.device_get(stance_hist(cs, mem, pb, sensors))
    print(f"per-tick stance counts (<=2 / 3 / 4 legs):\n{hist}",
          flush=True)

    for backend, cap in (("gj", 256), ("reduced", 256), ("reduced", 128)):
        t = time_scan(
            functools.partial(tick, backend=backend, cap=cap),
            (cs, mem, pb, sensors),
            name=f"tick kkt={backend} cap={cap}",
            printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)

        @jax.jit
        def run10(cs, mem, pb, sensors, backend=backend, cap=cap):
            def body(c, _):
                return tick(c, backend, cap), None
            return jax.lax.scan(body, (cs, mem, pb, sensors), None,
                                length=10)[0][:2]

        cs2, mem2 = run10(cs, mem, pb, sensors)
        _, _, _, stats = jax.jit(
            functools.partial(
                batched_control_tick, cfg,
                admm_backend="pallas_shared", kkt_block=32, admm_block=64,
                kkt_backend=backend, kkt_big_capacity=cap,
                return_stats=True)
        )(pb, cs2, mem2, sensors, joy, dt)
        conv = float(jnp.mean(stats["converged"].astype(jnp.float32)))
        print(f"  converged frac after 10 more ticks: {conv:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
