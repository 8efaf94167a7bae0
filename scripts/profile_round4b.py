"""Round-4b sweep: closed-loop reduced_admm throughput vs batch size,
admm_block, and rescue_iters (trot-window convergence).

    python scripts/profile_round4b.py
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_flat_batch,
    )
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25,
                              mpc_solver_mode="fixed")
    joy_w = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                   velx=jnp.float32(0.3))
    joy_s = JoyCmd.zeros()
    print(f"device={jax.devices()[0]}", flush=True)

    def make_warm(b):
        pb, terr, carry = make_flat_batch(cfg, jax.random.PRNGKey(0), b,
                                          params)
        dt = jnp.float32(cfg.control_dt)

        @jax.jit
        def warm(carry, pb, terr):
            def body(c, t):
                j = jax.tree_util.tree_map(
                    lambda a, bb: jnp.where(t < 120, a, bb), joy_s,
                    joy_w)
                cr, pb2, terr2 = c
                cr = batched_closed_loop_step(
                    cfg, pb2, terr2, cr, j, dt,
                    admm_backend="pallas_shared", kkt_block=32,
                    admm_block=64, kkt_backend="reduced_admm",
                    rescue_capacity=128, rescue_iters=75)
                return (cr, pb2, terr2), None
            return jax.lax.scan(body, (carry, pb, terr),
                                jnp.arange(500))[0][0]

        carry = warm(carry, pb, terr)
        jax.block_until_ready(carry.ps.root_pos)
        return pb, terr, carry, dt

    def step(carry2, dt, ablock, r_it):
        c, pb2, terr2 = carry2
        c = batched_closed_loop_step(
            cfg, pb2, terr2, c, joy_w, dt,
            admm_backend="pallas_shared", kkt_block=32,
            admm_block=ablock, kkt_backend="reduced_admm",
            rescue_capacity=128, rescue_iters=r_it)
        return (c, pb2, terr2)

    for b in (1024, 2048, 4096):
        pb, terr, carry, dt = make_warm(b)
        # NOTE: admm_block=128 at full size VMEM-OOMs (minv block alone
        # is 7.9 MB; scoped limit 16 MB) — 64 is the ceiling there
        for ablock, r_it in (((64, 75),) if b != 1024
                             else ((64, 75), (64, 150))):
            t = time_scan(
                functools.partial(step, dt=dt, ablock=ablock,
                                  r_it=r_it),
                (carry, pb, terr),
                name=f"b={b} ablock={ablock} rescue=128x{r_it}",
                printer=functools.partial(print, flush=True))
            print(f"  -> {b / t:,.0f} solves/s", flush=True)

            @jax.jit
            def audit(carry, pb, terr, ablock=ablock, r_it=r_it):
                def body(c, _):
                    cr, pb2, terr2 = c
                    cr, stats = batched_closed_loop_step(
                        cfg, pb2, terr2, cr, joy_w, dt,
                        admm_backend="pallas_shared", kkt_block=32,
                        admm_block=ablock, kkt_backend="reduced_admm",
                        rescue_capacity=128, rescue_iters=r_it,
                        return_stats=True)
                    return (cr, pb2, terr2), jnp.mean(
                        stats["converged"].astype(jnp.float32))
                return jax.lax.scan(body, (carry, pb, terr), None,
                                    length=50)[1]

            conv = jax.device_get(audit(carry, pb, terr))
            print(f"  conv 50 ticks: mean={conv.mean():.4f} "
                  f"min={conv.min():.4f}", flush=True)


if __name__ == "__main__":
    main()
