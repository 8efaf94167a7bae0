"""Round-4 stand-QP throughput: lock-step batched route vs the vmapped
adaptive-core route (scan-timed on device), from a walk-warm state.

    python scripts/profile_stand.py --batch 4096
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--warm-ticks", type=int, default=300)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import control_tick
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_stand_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    b = args.batch
    cfg, params = load_profile("gazebo_qp")
    cfg = dataclasses.replace(cfg, mpc_solver_mode="fixed",
                              stand_qp_iters=100)
    pb, cs, mem, sensors = make_bench_state(cfg, jax.random.PRNGKey(0), b,
                                            params)
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.2))
    dt = jnp.float32(cfg.control_dt)
    print(f"batch={b} device={jax.devices()[0]}", flush=True)

    def lockstep(carry, rescue):
        cs, mem, pb2, sens = carry
        cs, mem, _ = batched_stand_control_tick(
            cfg, pb2, cs, mem, sens, joy, dt, rescue_capacity=rescue)
        return (cs, mem, pb2, sens)

    def vmapped(carry):
        cs, mem, pb2, sens = carry
        cs, mem, _ = jax.vmap(
            lambda p, c, m, s: control_tick(cfg, p, c, m, s, joy, dt)
        )(pb2, cs, mem, sens)
        return (cs, mem, pb2, sens)

    # warm into the walk with the lock-step route
    @jax.jit
    def warm(cs, mem, pb, sens):
        def body(c, _):
            return lockstep(c, 128), None
        return jax.lax.scan(body, (cs, mem, pb, sens), None,
                            length=args.warm_ticks)[0]

    cs, mem, pb, sensors = warm(cs, mem, pb, sensors)
    jax.block_until_ready(cs.joint_torques)

    for name, fn in (("lockstep rescue=128",
                      functools.partial(lockstep, rescue=128)),
                     ("lockstep rescue=0",
                      functools.partial(lockstep, rescue=0)),
                     ("vmapped adaptive core", vmapped)):
        t = time_scan(fn, (cs, mem, pb, sensors),
                      name=f"stand tick {name}",
                      printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)


if __name__ == "__main__":
    main()
