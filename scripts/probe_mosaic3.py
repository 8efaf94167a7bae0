"""Third Mosaic probe: the real masked sweep kernel with and without
in/out aliasing, timed if it compiles. Probe ladder 2 cleared every
individual feature the kernel uses (slab axis-0 reduces, full-size dyn
read/store, full-width vector carries) — aliasing is the last untested
difference vs the passing probes.

    python scripts/probe_mosaic3.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 10


def time_scan(step, init, name, reps=3):
    @jax.jit
    def run(c, m):
        return jax.lax.scan(lambda c, _: (step(c, m), None), c, None,
                            length=R)[0]
    try:
        t0 = time.perf_counter()
        out = run(init, init)
        jax.block_until_ready(out)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        return None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init, init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"PASS {name:40s} {best * 1e3 / R:9.3f} ms/iter", flush=True)
    return best / R


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_sweep_T_masked,
    )

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    scal = srb.reference_mpc_scaling(params)
    jitter = 1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                            (b, 1, 1))
    p_b = p0[None] * jitter
    scal_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), scal)
    m_b = jax.vmap(lambda p, sc: qpx.scaled_kkt_matrix(
        p, q0, a0m, lb, ub, settings, jnp.float32(grf._MPC_RHO0), sc)
    )(p_b, scal_b)
    m_b = jax.block_until_ready(jax.jit(lambda x: x)(m_b))
    print(f"batch={b} n={m_b.shape[1]} device={jax.devices()[0]}",
          flush=True)

    eps = jnp.float32(1e-30)
    t_noalias = time_scan(
        lambda mi, m: batched_inverse_sweep_T_masked(
            m + eps * mi, sblock=128, chunk=8, alias=False),
        m_b, "masked sweep chunk=8 NO-alias")
    t_alias = time_scan(
        lambda mi, m: batched_inverse_sweep_T_masked(
            m + eps * mi, sblock=128, chunk=8, alias=True),
        m_b, "masked sweep chunk=8 alias")

    # residual check on whichever compiled
    use_alias = t_alias is not None
    if t_alias is not None or t_noalias is not None:
        @jax.jit
        def resid(m):
            x = batched_inverse_sweep_T_masked(m, sblock=128, chunk=8,
                                               alias=use_alias)
            eye = jnp.eye(m.shape[1])
            return jnp.max(jnp.abs(
                eye - jnp.einsum("bij,bjk->bik", x, m)))
        try:
            print(f"residual: {float(resid(m_b)):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"residual FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
