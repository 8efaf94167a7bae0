"""Fourth Mosaic probe: grid-over-lanes effects + the two-pass slab
sweep kernel (masked2) built exclusively from individually-probed-PASS
constructs. Bisect order: trivial grid kernel, masked2 at grid 1,
masked2 at grid 8, row-carry masked at grid 1.

    python scripts/probe_mosaic4.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_negate(m_ref, o_ref):
    o_ref[:] = -m_ref[:]


def probe_grid_negate():
    shape = (120, 120, 1024)
    x = jnp.ones(shape, jnp.float32)
    try:
        f = pl.pallas_call(
            k_negate,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=(8,),
            in_specs=[pl.BlockSpec((120, 120, 128), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((120, 120, 128), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
        )
        r = jax.block_until_ready(f(x))
        print(f"PASS grid negate (sum={float(r.sum()):.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL grid negate: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}", flush=True)


def timed(fn, m_b, name, reps=3):
    R = 10
    eps = jnp.float32(1e-30)

    @jax.jit
    def run(c, m):
        return jax.lax.scan(
            lambda c, _: (fn(m + eps * c), None), c, None, length=R)[0]
    try:
        t0 = time.perf_counter()
        out = run(m_b, m_b)
        jax.block_until_ready(out)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(m_b, m_b)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"PASS {name:44s} {best * 1e3 / R:9.3f} ms/iter", flush=True)
    return best / R


def main():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_inverse_sweep_T_masked, batched_inverse_sweep_T_masked2,
    )

    print(f"device={jax.devices()[0]}", flush=True)
    probe_grid_negate()

    cfg, params = load_profile("gazebo_mpc")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    scal = srb.reference_mpc_scaling(params)

    def kkt_batch(b):
        jitter = 1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                                (b, 1, 1))
        p_b = p0[None] * jitter
        scal_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (b,) + x.shape), scal)
        m_b = jax.vmap(lambda p, sc: qpx.scaled_kkt_matrix(
            p, q0, a0m, lb, ub, settings, jnp.float32(grf._MPC_RHO0), sc)
        )(p_b, scal_b)
        return jax.block_until_ready(jax.jit(lambda x: x)(m_b))

    m128 = kkt_batch(128)
    t1 = timed(lambda m: batched_inverse_sweep_T_masked2(
        m, sblock=128, chunk=8, alias=False), m128,
        "masked2 grid1 (batch 128) no-alias")
    m1024 = kkt_batch(1024)
    t2 = timed(lambda m: batched_inverse_sweep_T_masked2(
        m, sblock=128, chunk=8, alias=False), m1024,
        "masked2 grid8 (batch 1024) no-alias")
    if t2 is not None:
        timed(lambda m: batched_inverse_sweep_T_masked2(
            m, sblock=128, chunk=8, alias=True), m1024,
            "masked2 grid8 (batch 1024) alias")
    timed(lambda m: batched_inverse_sweep_T_masked(
        m, sblock=128, chunk=8, alias=False), m128,
        "row-carry masked grid1 (batch 128) no-alias")

    # residual on-chip for whichever worked
    if t1 is not None or t2 is not None:
        m = m1024 if t2 is not None else m128

        @jax.jit
        def resid(m):
            x = batched_inverse_sweep_T_masked2(m, sblock=128, chunk=8,
                                                alias=False)
            eye = jnp.eye(m.shape[1])
            return jnp.max(jnp.abs(
                eye - jnp.einsum("bij,bjk->bik", x, m)))
        try:
            print(f"residual masked2: {float(resid(m)):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"residual FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
