"""A/B the condense_same_b Toeplitz construction on the real closed
tick: index-array gather vs static slices (round-4 regression check).

    python scripts/profile_condense_ab.py
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
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.parallel.batched import (
        batched_closed_loop_step, make_flat_batch,
    )
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan
    from a1_qp_mpc_controller_tpu.types import JoyCmd
    from a1_qp_mpc_controller_tpu.config import (
        MPC_STATE_DIM, NUM_DOF, PLAN_HORIZON,
    )

    _HIGH = jax.lax.Precision.HIGHEST

    def condense_gather(a_c, b_d, dt, horizon=PLAN_HORIZON):
        n, m = MPC_STATE_DIM, NUM_DOF
        powers = srb.a_d_powers(a_c, dt, horizon)
        a_qp = powers[1:].reshape(horizon * n, n)
        m_blocks = jnp.einsum("kab,bc->kac", powers[:horizon], b_d,
                              precision=_HIGH)
        i_idx = jnp.arange(horizon)[:, None]
        j_idx = jnp.arange(horizon)[None, :]
        lag = jnp.clip(i_idx - j_idx, 0, horizon - 1)
        mask = (i_idx >= j_idx).astype(a_c.dtype)[:, :, None, None]
        blocks = m_blocks[lag] * mask
        b_qp = blocks.transpose(0, 2, 1, 3).reshape(horizon * n,
                                                    horizon * m)
        return a_qp, b_qp

    condense_slice = srb.condense_same_b

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25,
                              mpc_solver_mode="fixed")
    b = 1024
    pb, terr, carry = make_flat_batch(cfg, jax.random.PRNGKey(0), b,
                                      params)
    joy_w = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                   velx=jnp.float32(0.3))
    joy_s = JoyCmd.zeros()
    dt = jnp.float32(cfg.control_dt)
    print(f"device={jax.devices()[0]}", flush=True)

    def step(carry2):
        c, pb2, terr2 = carry2
        c = batched_closed_loop_step(
            cfg, pb2, terr2, c, joy_w, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend="reduced_admm", rescue_capacity=128,
            rescue_iters=150)
        return (c, pb2, terr2)

    @jax.jit
    def warm(carry, pb, terr):
        def body(c, t):
            j = jax.tree_util.tree_map(
                lambda a, bb: jnp.where(t < 120, a, bb), joy_s, joy_w)
            cr, pb2, terr2 = c
            cr = batched_closed_loop_step(
                cfg, pb2, terr2, cr, j, dt,
                admm_backend="pallas_shared", kkt_block=32,
                admm_block=64, kkt_backend="reduced_admm",
                rescue_capacity=128, rescue_iters=150)
            return (cr, pb2, terr2), None
        return jax.lax.scan(body, (carry, pb, terr),
                            jnp.arange(500))[0][0]

    carry = warm(carry, pb, terr)
    jax.block_until_ready(carry.ps.root_pos)

    for name, fn in (("slice", condense_slice),
                     ("gather", condense_gather)):
        srb.condense_same_b = fn
        t = time_scan(step, (carry, pb, terr),
                      name=f"closed tick condense={name}",
                      printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)
    srb.condense_same_b = condense_slice

    # also A/B rescue budget at the same state for a clean cost read
    def step_r(carry2, r_it):
        c, pb2, terr2 = carry2
        c = batched_closed_loop_step(
            cfg, pb2, terr2, c, joy_w, dt,
            admm_backend="pallas_shared", kkt_block=32, admm_block=64,
            kkt_backend="reduced_admm", rescue_capacity=128,
            rescue_iters=r_it)
        return (c, pb2, terr2)

    for r_it in (75, 150):
        t = time_scan(functools.partial(step_r, r_it=r_it),
                      (carry, pb, terr),
                      name=f"closed tick rescue=128x{r_it}",
                      printer=functools.partial(print, flush=True))
        print(f"  -> {b / t:,.0f} solves/s", flush=True)


if __name__ == "__main__":
    main()
