"""On-chip measurement of the row-chunked transposed sweep KKT-inverse
kernel (the round-3 candidate to break the 11.4 ms flat-GJ wall).

    python scripts/profile_chunked.py --batch 1024 --chunks 8,24

Times each chunk size with the on-device scan discipline and checks the
inverse residual on the kappa~7e4 KKT family.
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
    """Carry passed as a jit ARGUMENT — never close big device arrays over
    a jitted function (constant embedding aborts the axon backend)."""
    @jax.jit
    def run(c, m):
        return jax.lax.scan(lambda c, _: (step(c, m), None), c, None,
                            length=R)[0]
    t0 = time.perf_counter()
    out = run(init, init)
    jax.block_until_ready(out)
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init, init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3 / R:9.3f} ms/iter", flush=True)
    return best / R


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunks", type=str, default="8,24")
    ap.add_argument("--with-gj", action="store_true")
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse, batched_inverse_sweep_T_chunked,
        batched_inverse_sweep_T_masked,
    )

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50, mpc_solver_mode="fixed")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)

    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    scal = srb.reference_mpc_scaling(params)
    key = jax.random.PRNGKey(0)
    jitter = 1.0 + 0.05 * jax.random.normal(key, (b, 1, 1))
    p_b = p0[None] * jitter
    scal_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), scal)
    m_b = jax.vmap(lambda p, sc: qpx.scaled_kkt_matrix(
        p, q0, a0m, lb, ub, settings, jnp.float32(1e-4), sc))(p_b, scal_b)
    m_b = jax.block_until_ready(jax.jit(lambda x: x)(m_b))
    print(f"batch={b} n={m_b.shape[1]} device={jax.devices()[0]}",
          flush=True)

    eps = jnp.float32(1e-30)
    chunks = [int(c) for c in args.chunks.split(",")]
    results = {}
    kind = os.environ.get("CHUNK_KIND", "masked")
    fn = (batched_inverse_sweep_T_masked if kind == "masked"
          else batched_inverse_sweep_T_chunked)
    for ch in chunks:
        name = f"sweep_T_{kind} chunk={ch}"
        try:
            t = time_scan(
                lambda mi, m, ch=ch: fn(m + eps * mi, sblock=128, chunk=ch),
                m_b, name)
            results[name] = t
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if args.with_gj:
        time_scan(lambda mi, m: batched_inverse(m + eps * mi, block=16),
                  m_b, "flat GJ blk=16 (production)")

    # accuracy: residual ||I - X M||_inf (single extra program)
    @jax.jit
    def resid(m, ch):
        x = fn(m, sblock=128, chunk=8)
        eye = jnp.eye(m.shape[1])
        return jnp.max(jnp.abs(eye - jnp.einsum("bij,bjk->bik", x, m)))
    try:
        r = resid(m_b, 8)
        print(f"residual chunk=8: {float(r):.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"residual FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
