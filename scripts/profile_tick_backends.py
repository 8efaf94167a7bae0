"""Full-batched-tick timing across KKT-inverse backends (scan-timed on
device), plus a convergence audit — directly predicts bench.py impact.

    python scripts/profile_tick_backends.py --batch 1024
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

    # pb/sensors ride in the (loop-invariant) carry so the jitted scan
    # receives them as ARGUMENTS — closing big device arrays over a jitted
    # function embeds them as MLIR constants, which round-trips through the
    # axon tunnel and has aborted the backend (see CLAUDE.md)
    for backend in ("gj", "sweep_t"):
        def step(carry, backend=backend):
            cs, mem, pb, sensors = carry
            cs, mem, _ = batched_control_tick(
                cfg, pb, cs, mem, sensors, joy, dt,
                admm_backend="pallas_shared", kkt_block=16,
                admm_block=64, kkt_backend=backend)
            return (cs, mem, pb, sensors)

        t = time_scan(step, (cs, mem, pb, sensors),
                      name=f"tick kkt_backend={backend}",
                      printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)

        # convergence audit after 10 ticks on this backend
        @jax.jit
        def run10(cs, mem, pb, sensors, backend=backend):
            def body(c, _):
                return step(c, backend=backend), None
            return jax.lax.scan(body, (cs, mem, pb, sensors), None,
                                length=10)[0][:2]

        cs2, mem2 = run10(cs, mem, pb, sensors)
        _, _, _, stats = jax.jit(
            functools.partial(
                batched_control_tick, cfg,
                admm_backend="pallas_shared", kkt_block=16, admm_block=64,
                kkt_backend=backend, return_stats=True)
        )(pb, cs2, mem2, sensors, joy, dt)
        conv = float(jnp.mean(stats["converged"].astype(jnp.float32)))
        print(f"  converged frac after 10 ticks: {conv:.4f}", flush=True)


if __name__ == "__main__":
    main()
