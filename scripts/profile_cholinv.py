"""On-chip timing: blocked-Cholesky KKT inverse (pure-XLA batched GEMMs)
vs the flat Pallas GJ kernel, across panel sizes.

    python scripts/profile_cholinv.py --batch 1024 --panels 12,24,30,40
"""

from __future__ import annotations

import argparse
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
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
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
    ap.add_argument("--panels", type=str, default="12,24,30,40")
    ap.add_argument("--with-gj", action="store_true")
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.linalg import (
        spd_cholesky_inverse, spd_cholesky_inverse_hybrid,
    )
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import batched_inverse

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    c = jnp.array([1, 0, 0, 1], bool)   # trot pattern (hard case)
    p2, q2, l2, u2 = srb.eliminate_swing(p0, q0, lb, ub, c, cfg.horizon)
    scal = qpx.compute_scaling(p2, q2, a0m, l2, u2)
    jitter = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                           (b, 1, 1))
    m_b = jax.vmap(lambda p: qpx.scaled_kkt_matrix(
        p, q2, a0m, l2, u2, settings, jnp.float32(grf._MPC_RHO0), scal)
    )(p2[None] * jitter)
    m_b = jax.block_until_ready(jax.jit(lambda x: x)(m_b))
    print(f"batch={b} n={m_b.shape[1]} device={jax.devices()[0]}",
          flush=True)

    eps = jnp.float32(1e-30)
    kind = os.environ.get("CHOL_KIND", "xla")
    fn = (spd_cholesky_inverse_hybrid if kind == "hybrid"
          else spd_cholesky_inverse)
    for panel in [int(p) for p in args.panels.split(",")]:
        time_scan(lambda mi, m, p=panel: fn(
            m + eps * mi, panel=p), m_b, f"chol[{kind}] panel={panel}")
    if args.with_gj:
        time_scan(lambda mi, m: batched_inverse(m + eps * mi, block=16),
                  m_b, "flat GJ blk=16 (production)")

    @jax.jit
    def resid(m):
        x = fn(m, panel=30)
        eye = jnp.eye(m.shape[1])
        return jnp.max(jnp.abs(eye - jnp.einsum("bij,bjk->bik", x, m)))
    try:
        print(f"residual panel=30: {float(resid(m_b)):.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"residual FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
