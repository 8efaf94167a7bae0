"""Micro-benchmarks for the fused-ADMM kernel internals on TPU: isolate
the cost of (a) the symmetric-Minv broadcast-reduce, (b) the shared MXU
matmuls, (c) loop unrolling, (d) batched dot_general for the Minv matvec.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3:9.3f} ms")
    return best


N, M = 128, 256
ITERS = 50


def make_kernel(variant: str, unroll: int):
    def kern(a0_ref, m_ref, e_ref, q_ref, l_ref, u_ref, rho_ref,
             x_ref, y_ref, z_ref, xo_ref, yo_ref, zo_ref):
        a0 = a0_ref[:]
        m = m_ref[:]
        e = e_ref[:]
        q = q_ref[:]
        lb = l_ref[:]
        ub = u_ref[:]
        rho = rho_ref[:]
        inv_rho = 1.0 / rho
        f32 = jnp.float32
        cm = (((1,), (0,)), ((), ()))
        cn = (((1,), (1,)), ((), ()))

        def one(_, xyz):
            x, y, z = xyz
            w = rho * z - y
            if variant in ("full", "nominv", "dotgen"):
                atw = jax.lax.dot_general(e * w, a0, cm,
                                          preferred_element_type=f32)
            else:  # nomatmul
                atw = (e * w)[:, :N]
            rhs = 1e-6 * x - q + atw
            if variant in ("full", "nomatmul"):
                xt = jnp.sum(m * rhs[:, :, None], axis=1)
            elif variant == "dotgen":
                xt = jax.lax.dot_general(
                    m, rhs, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)
            else:  # nominv
                xt = rhs
            x1 = 1.6 * xt + (1 - 1.6) * x
            if variant in ("full", "nominv", "dotgen"):
                ax = jax.lax.dot_general(xt, a0, cn,
                                         preferred_element_type=f32)
            else:
                ax = jnp.concatenate([xt, xt], axis=1)
            zp = 1.6 * ax + (1 - 1.6) * z
            z1 = jnp.clip(zp + y * inv_rho, lb, ub)
            y1 = y + rho * (zp - z1)
            return x1, y1, z1

        x, y, z = jax.lax.fori_loop(0, ITERS, one,
                                    (x_ref[:], y_ref[:], z_ref[:]),
                                    unroll=unroll)
        xo_ref[:] = x
        yo_ref[:] = y
        zo_ref[:] = z

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "block", "unroll"))
def run(a0, minv, e, q, l, u, rho, x, y, z, variant="full", block=32,
        unroll=1):
    b = q.shape[0]
    grid = (b // block,)
    sh = pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM)
    s3 = pl.BlockSpec((block, N, N), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    s2 = lambda d: pl.BlockSpec((block, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(variant, unroll),
        out_shape=(jax.ShapeDtypeStruct((b, N), jnp.float32),
                   jax.ShapeDtypeStruct((b, M), jnp.float32),
                   jax.ShapeDtypeStruct((b, M), jnp.float32)),
        grid=grid,
        in_specs=[sh, s3, s2(M), s2(N), s2(M), s2(M), s2(M),
                  s2(N), s2(M), s2(M)],
        out_specs=(s2(N), s2(M), s2(M)),
    )(a0, minv, e, q, l, u, rho, x, y, z)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    b = args.batch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    a0 = jax.random.normal(ks[0], (M, N)) * 0.1
    minv = jax.random.normal(ks[1], (b, N, N)) * 0.01
    e = jnp.abs(jax.random.normal(ks[2], (b, M))) + 0.5
    q = jax.random.normal(ks[3], (b, N))
    l = -jnp.abs(jax.random.normal(ks[4], (b, M))) - 1
    u = jnp.abs(jax.random.normal(ks[5], (b, M))) + 1
    rho = jnp.abs(jax.random.normal(ks[6], (b, M))) + 0.1
    x = jax.random.normal(ks[7], (b, N)) * 0.1
    y = jnp.zeros((b, M))
    z = jnp.zeros((b, M))
    print(f"batch={b} iters={ITERS} device={jax.devices()[0]}")

    for variant in ("full", "nominv", "nomatmul", "dotgen"):
        for block in (16, 32, 64):
            for unroll in (1, 4):
                fn = functools.partial(run, variant=variant, block=block,
                                       unroll=unroll)
                try:
                    timeit(fn, a0, minv, e, q, l, u, rho, x, y, z,
                           name=f"{variant} blk={block} unroll={unroll}")
                except Exception as ex:  # noqa: BLE001
                    print(f"{variant} blk={block} unroll={unroll} "
                          f"FAILED: {type(ex).__name__}")


if __name__ == "__main__":
    main()
