"""Second Mosaic probe ladder. Round 1 (probe_mosaic.py) found: axis-0
(sublane-dim) masked reduces compile at (8,8,128) but CRASH the compiler
at (120,120,128); axis-1 reduces are fine at both. This ladder finds the
size threshold and validates the workarounds the production kernel needs:
thin transposes (symmetry-derived pivot rows), slab-chunked axis-0
reduces, full-size dynamic ds, and full-width vector carries.

    python scripts/probe_mosaic2.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, shape, **kw):
    x = jnp.ones(shape, jnp.float32)
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                   memory_space=pltpu.VMEM),
            **kw,
        )
        r = jax.block_until_ready(f(x))
        print(f"PASS {name}  (sum={float(r.sum()):.1f})", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


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


def k_axis0_reduce(m_ref, o_ref, *, n):
    ii = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 0)

    def step(k, _):
        w = o_ref[:]
        r = jnp.sum(jnp.where(ii == k, w, 0.0), axis=0, keepdims=True)
        o_ref[:] = w - 1e-6 * r
        return 0
    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_thin_transpose(m_ref, o_ref, *, n):
    jj = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)

    def step(k, _):
        w = o_ref[:]
        c = jnp.sum(jnp.where(jj == k, w, 0.0), axis=1,
                    keepdims=True)                     # (n,1,S)
        r = jnp.swapaxes(c, 0, 1)                      # (1,n,S)
        o_ref[:] = w - 1e-6 * (c * r)
        return 0
    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, 0)


def k_carry_const(m_ref, o_ref, *, n):
    rk = jnp.zeros((1,) + m_ref.shape[1:], jnp.float32)

    def step(k, rk):
        w = o_ref[:]
        o_ref[:] = w - 1e-6 * rk
        return rk + 1.0
    o_ref[:] = m_ref[:]
    jax.lax.fori_loop(0, n, step, rk)


def k_slab_axis0(m_ref, o_ref, *, n, chunk):
    nch = m_ref.shape[0] // chunk
    i3c = jax.lax.broadcasted_iota(
        jnp.int32, (chunk,) + (1, m_ref.shape[2]), 0)
    for c in range(nch):
        o_ref[pl.ds(c * chunk, chunk)] = m_ref[pl.ds(c * chunk, chunk)]

    def step(k, _):
        acc = jnp.zeros((1,) + m_ref.shape[1:], jnp.float32)
        for c in range(nch):
            w = o_ref[pl.ds(c * chunk, chunk)]
            acc = acc + jnp.sum(
                jnp.where(i3c + c * chunk == k, w, 0.0), axis=0,
                keepdims=True)
        o_ref[pl.ds(0, 1)] = acc
        return 0
    jax.lax.fori_loop(0, n, step, 0)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    s = (120, 120, 128)
    run("dyn read (120,120,128)", functools.partial(k_dyn_read, n=120), s)
    run("dyn store (120,120,128)", functools.partial(k_dyn_store, n=120), s)
    run("axis0 reduce (8,120,128)",
        functools.partial(k_axis0_reduce, n=8), (8, 120, 128))
    run("axis0 reduce (120,8,128)",
        functools.partial(k_axis0_reduce, n=120), (120, 8, 128))
    run("axis0 reduce (32,120,128)",
        functools.partial(k_axis0_reduce, n=32), (32, 120, 128))
    run("thin transpose rank1 (120,120,128)",
        functools.partial(k_thin_transpose, n=120), s)
    run("const vector carry (120,120,128)",
        functools.partial(k_carry_const, n=120), s)
    run("slab axis0 chunk=8 (120,120,128)",
        functools.partial(k_slab_axis0, n=120, chunk=8), s)


if __name__ == "__main__":
    main()
