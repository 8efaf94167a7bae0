"""How many fixed ADMM iterations does the batched MPC need?

Runs a batched steady-trot tick sequence on-device at several fixed
iteration counts and reports the fraction of scenarios whose UNSCALED
residuals meet OSQP's default tolerances (eps_abs = eps_rel = 1e-3) at
every tick — the honest basis for choosing bench.py's iteration count.

    python scripts/iter_study.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_control_tick, make_bench_state,
    )
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    b = args.batch
    key = jax.random.PRNGKey(0)
    base_cfg, params = load_profile("gazebo_mpc")
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))

    for iters in (15, 20, 25, 30, 40, 50):
        cfg = dataclasses.replace(base_cfg, mpc_qp_iters=iters,
                                  mpc_solver_mode="fixed")
        pb, cs, mem, sensors = make_bench_state(cfg, key, b, params)
        dt = jnp.float32(cfg.control_dt)

        @jax.jit
        def run(cs, mem):
            def body(carry, _):
                cs, mem = carry
                cs, mem, _, stats = batched_control_tick(
                    cfg, pb, cs, mem, sensors, joy, dt,
                    admm_backend="pallas_shared", kkt_block=16,
                    admm_block=64, return_stats=True,
                    interpret=args.cpu)
                return (cs, mem), (jnp.mean(
                    stats["converged"].astype(jnp.float32)),
                    jnp.max(stats["prim_res"]), jnp.max(stats["dual_res"]))
            (cs, mem), tr = jax.lax.scan(body, (cs, mem), None,
                                         length=args.ticks)
            return tr

        frac, rp, rd = run(cs, mem)
        frac = jax.device_get(frac)
        print(f"iters={iters:3d}: converged frac min={frac.min():.4f} "
              f"mean={frac.mean():.4f} last={frac[-1]:.4f} "
              f"max_rp={float(jnp.max(rp)):.2e} "
              f"max_rd={float(jnp.max(rd)):.2e}", flush=True)


if __name__ == "__main__":
    main()
