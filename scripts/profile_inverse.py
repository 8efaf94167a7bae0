"""Scan-timed comparison of batched SPD-inverse kernels on TPU:
flat Pallas GJ vs sweep vs recursive Schur (base/block sweep) vs XLA LU.

    python scripts/profile_inverse.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 10


def time_scan(step, init, name, reps=3):
    """step: carry -> carry. The carry is passed as a jit ARGUMENT (not a
    closure) so large operands are never embedded as constants — constant
    embedding forces a device->host->device round trip through the axon
    tunnel and has been seen to abort the backend."""
    @jax.jit
    def run(c, m):
        return jax.lax.scan(lambda c, _: (step(c, m), None), c, None,
                            length=R)[0]
    out = run(init, init)
    jax.block_until_ready(out)
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
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse,
    )

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50, mpc_solver_mode="fixed")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)

    # representative batch of KKT matrices: perturbed nominal instances
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

    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_T, batched_inverse_sweep_T,
    )

    # NOTE: the lane (last) dim of a VMEM block must be divisible by 128,
    # so the scenario block is always 128 on hardware.
    eps = jnp.float32(1e-30)
    for name, fn in (
        ("sweep_T sblock=128",
         lambda mi, m: batched_inverse_sweep_T(m + eps * mi, sblock=128)),
        ("sweep_T sblock=128 sym_col",
         lambda mi, m: batched_inverse_sweep_T(m + eps * mi, sblock=128,
                                               sym_col=True)),
        ("gj_T sblock=128",
         lambda mi, m: batched_inverse_T(m + eps * mi, sblock=128)),
        ("flat GJ blk=16 (production)",
         lambda mi, m: batched_inverse(m + eps * mi, block=16)),
    ):
        try:
            time_scan(fn, m_b, name)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # accuracy check: residual ||I - X M||_inf on the KKT family
    eye = jnp.eye(m_b.shape[1])
    for name, f in (
        ("GJ", lambda m: batched_inverse(m, block=16)),
        ("sweep_T", lambda m: batched_inverse_sweep_T(m, sblock=128)),
        ("sweep_T_sym", lambda m: batched_inverse_sweep_T(
            m, sblock=128, sym_col=True)),
        ("gj_T", lambda m: batched_inverse_T(m, sblock=128)),
    ):
        try:
            x = f(m_b)
            r = jnp.max(jnp.abs(eye - jnp.einsum("bij,bjk->bik", x, m_b)))
            print(f"residual {name:12s} {float(r):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"residual {name:12s} FAILED: {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
