"""Feature-isolation probes for the Mosaic crash on transposed-layout
kernels (tpu_compile_helper exit 1, no diagnostic).

Every transposed KKT-inverse kernel fails on this image — flat GJ
(batch-leading (16,128,128) blocks) compiles, while every (n, n, S)
batch-in-lanes kernel crashes: two-array GJ, sweep, row-chunked sweep,
and the fully-masked row-carry sweep. This script compiles a ladder of
minimal kernels to find the exact feature that kills the compiler.

    python scripts/probe_mosaic.py
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, shape, n_out=None, **kw):
    out_shape = jax.ShapeDtypeStruct(shape if n_out is None else n_out,
                                     jnp.float32)
    x = jnp.ones(shape, jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape.shape,
                                   lambda: (0,) * len(out_shape.shape),
                                   memory_space=pltpu.VMEM),
            **kw,
        )
        r = jax.block_until_ready(f(x))
        print(f"PASS {name}  (sum={float(r.sum()):.1f})", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def k_negate(m_ref, o_ref):
    o_ref[:] = -m_ref[:]


def k_fori_mask(m_ref, o_ref, *, n):
    jj = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)

    def step(k, _):
        w = o_ref[:]
        o_ref[:] = jnp.where(jj == k, w * 2.0, w)
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_axis1_reduce(m_ref, o_ref, *, n):
    jj = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)

    def step(k, _):
        w = o_ref[:]
        c = jnp.sum(jnp.where(jj == k, w, 0.0), axis=1, keepdims=True)
        o_ref[:] = w - 1e-6 * c
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_axis0_reduce(m_ref, o_ref, *, n):
    ii = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 0)

    def step(k, _):
        w = o_ref[:]
        r = jnp.sum(jnp.where(ii == k, w, 0.0), axis=0, keepdims=True)
        o_ref[:] = w - 1e-6 * r
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_dyn_read(m_ref, o_ref, *, n):
    def step(k, _):
        r = m_ref[pl.ds(k, 1)]
        o_ref[pl.ds(0, 1)] = r
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_dyn_store(m_ref, o_ref, *, n):
    def step(k, _):
        o_ref[pl.ds(k, 1)] = m_ref[pl.ds(0, 1)] * 2.0
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_carry_vec(m_ref, o_ref, *, n):
    ii = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 0)
    rk = jnp.zeros((1,) + m_ref.shape[1:], jnp.float32)

    def step(k, rk):
        w = o_ref[:]
        o_ref[:] = w - 1e-6 * rk
        return jnp.sum(jnp.where(ii == k, w, 0.0), axis=0, keepdims=True)

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, rk)


def k_rank1(m_ref, o_ref, *, n):
    ii = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)

    def step(k, _):
        w = o_ref[:]
        r = jnp.sum(jnp.where(ii == k, w, 0.0), axis=0, keepdims=True)
        c = jnp.sum(jnp.where(jj == k, w, 0.0), axis=1, keepdims=True)
        o_ref[:] = w - 1e-6 * (c * r)
        return 0

    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    s8 = (8, 8, 128)
    s120 = (120, 120, 128)
    run("negate (8,8,128)", k_negate, s8)
    run("negate (120,120,128)", k_negate, s120)
    run("fori+lane-mask sel (8,8,128)",
        functools.partial(k_fori_mask, n=8), s8)
    run("fori+axis1 reduce (8,8,128)",
        functools.partial(k_axis1_reduce, n=8), s8)
    run("fori+axis0 reduce (8,8,128)",
        functools.partial(k_axis0_reduce, n=8), s8)
    run("fori+dyn read (8,8,128)",
        functools.partial(k_dyn_read, n=8), s8)
    run("fori+dyn store (8,8,128)",
        functools.partial(k_dyn_store, n=8), s8)
    run("fori+vector carry (8,8,128)",
        functools.partial(k_carry_vec, n=8), s8)
    run("fori+rank1 update (8,8,128)",
        functools.partial(k_rank1, n=8), s8)
    run("fori+rank1 update (120,120,128)",
        functools.partial(k_rank1, n=120), s120)
    run("fori+axis1 reduce (120,120,128)",
        functools.partial(k_axis1_reduce, n=120), s120)
    run("fori+axis0 reduce (120,120,128)",
        functools.partial(k_axis0_reduce, n=120), s120)


if __name__ == "__main__":
    main()
