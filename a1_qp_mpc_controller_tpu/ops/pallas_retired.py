"""RETIRED Pallas kernels — documented negative results, kept for the
record and for interpret-mode numerics tests; NOT on any production path.

Every kernel here was built, validated (interpret-mode equivalence vs the
flat Gauss-Jordan), and MEASURED SLOWER or Mosaic-incompatible on this
image's TPU v5e toolchain. The production surface lives in
ops/pallas_kernels.py (batched_inverse[_small], fused_admm[_shared],
batched_chol_linv); see docs/ROADMAP.md for the one-table index of these
negative results. Summary:

- spd_block_inverse           Schur recursion: fast but numerically DEAD
                              on the KKT family (kappa^2 eps -> NaN)
- batched_inverse_inplace     28.4 ms vs 11.5 ms (lane-masked col fixes)
- batched_inverse_combined    22.1 ms vs 11.7 ms (256-lane rows)
- batched_inverse_rank[_masked] roll/extraction cost eats the win;
                              rank 8/16 crash Mosaic's register alloc
- batched_inverse_spd         sweep operator, batch-leading: a wash
- batched_inverse_T           batch-in-lanes GJ: lane-dim grids crash
                              this Mosaic => single 128-block only
- batched_inverse_sweep_T[_chunked/_masked/_masked2]
                              batch-in-lanes sweeps: same lane-grid wall
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NOTE: pallas_kernels imports this module at its tail (backward-compat
# re-exports), so these names are already defined when this executes.
from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
    LANE, _gj_inverse_kernel, _round_up, batched_inverse_small,
)

@functools.partial(jax.jit, static_argnames=("base", "block", "interpret"))
def spd_block_inverse(m: jnp.ndarray, base: int = 32, block: int = 64,
                      interpret: bool = False) -> jnp.ndarray:
    """Batched SPD inverse via recursive Schur-complement block inversion:

        M = [[A, B], [B', C]],  S = C - B' A^-1 B  (SPD since M is)
        M^-1 = [[A^-1 + W S^-1 W', -W S^-1], [-S^-1 W', S^-1]],  W = A^-1 B

    The recursion turns almost all of the O(n^3) inversion work into
    batched (B, n/2, n/2) GEMMs (MXU), leaving only ``base``-sized
    Gauss-Jordan sweeps (:func:`batched_inverse_small`) on the VPU.
    Measured ~1.6x faster than the flat GJ kernel on v5e at batch 1024
    (7.1 ms vs 11.0 ms for 1024x(120,120)).

    WARNING (measured): the A^-1-then-Schur composition amplifies f32
    rounding by ~kappa(A)^2*eps and can lose positive definiteness — on
    the Ruiz-scaled MPC KKT family (kappa ~ 7e4) it produces NaN where
    sequential GJ holds a ~1e-3 residual. Use ONLY for well-conditioned
    batches (kappa <~ 1e3); the controller paths use
    :func:`batched_inverse_inplace`. Output is explicitly symmetrized."""
    b, n, _ = m.shape
    # pad to a power-of-two multiple of base with identity (block-diagonal
    # zero coupling => the padded inverse's top-left block is the answer)
    n_pad = base
    while n_pad < n:
        n_pad *= 2
    if n_pad != n:
        mm = jnp.zeros((b, n_pad, n_pad), m.dtype)
        mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
        mm = mm.at[:, :n, :n].set(m)
    else:
        mm = m

    def inv(x):
        k = x.shape[1]
        if k <= base:
            return batched_inverse_small(x, block=block,
                                         interpret=interpret)
        h = k // 2
        a = x[:, :h, :h]
        bm = x[:, :h, h:]
        c = x[:, h:, h:]
        ai = inv(a)
        w = ai @ bm                                   # (B,h,h) GEMM
        s = c - jnp.swapaxes(bm, 1, 2) @ w
        si = inv(s)
        tr = -(w @ si)
        tl = ai - tr @ jnp.swapaxes(w, 1, 2)
        top = jnp.concatenate([tl, tr], axis=2)
        bot = jnp.concatenate([jnp.swapaxes(tr, 1, 2), si], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    out = inv(mm)[:, :n, :n]
    return 0.5 * (out + jnp.swapaxes(out, 1, 2))

def _gj_inplace_kernel(m_ref, out_ref, *, n_steps: int):
    """In-place Gauss-Jordan inversion: the inverse overwrites the working
    matrix column by column (classic gaussj without the explicit identity
    — at pivot k only columns >= k of M and < k of M^-1 are live, so ONE
    (S, n, n) array carries both). Per pivot: two masked reductions (pivot
    row / column extraction) + one fused rank-1 read-modify-write.

    Same no-pivoting requirement (SPD) and the same numerics class as
    sequential GJ — NOT the Schur-recursion shortcut, which measured
    residual ~1e0/NaN on the MPC KKT family (kappa ~ 1e5 in f32) where
    sequential GJ holds ~1e-3.

    MEASURED NEGATIVE RESULT (v5e, 1024x(120,120)): 28.4 ms vs 11.5 ms
    for the two-array flat GJ — in principle this does ~half the VMEM
    traffic, but Mosaic lowers the lane-masked column-fix selects far
    worse than the flat kernel's plain rank-1 update. Kept as a
    documented alternative; production uses :func:`batched_inverse`."""
    s, n, lanes = m_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, lanes), 1)

    out_ref[:] = m_ref[:]

    def step(k, _):
        w = out_ref[:]
        at_row = row_ids == k
        at_col = col_ids == k
        r = jnp.sum(jnp.where(at_row, w, 0.0), axis=1)          # (S,L)
        c = jnp.sum(jnp.where(at_col, w, 0.0), axis=2)          # (S,n)
        d = jnp.sum(jnp.where(lane == k, r, 0.0), axis=1,
                    keepdims=True)                              # (S,1)
        inv_d = 1.0 / d
        rd = jnp.where(lane == k, inv_d, r * inv_d)             # (S,L)
        cm = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (s, n), 1) == k,
            0.0, c)                                             # (S,n)
        colfix = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (s, n), 1) == k,
            inv_d, -c * inv_d)                                  # (S,n)
        upd = w - cm[:, :, None] * rd[:, None, :]
        upd = jnp.where(at_row, rd[:, None, :], upd)
        out_ref[:] = jnp.where(at_col, colfix[:, :, None], upd)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_inverse_inplace(m: jnp.ndarray, block: int = 16,
                            interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the in-place GJ kernel:
    (B, n, n) -> (B, n, n). Same contract and numerics class as
    :func:`batched_inverse`, ~2x less VMEM traffic (one working array)."""
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    mm = jnp.zeros((b_pad, n_pad, n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_inplace_kernel, n_steps=n),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, :n]


def _gj_combined_kernel(w_ref, out_ref, *, n_steps: int, n_left: int):
    """Gauss-Jordan on the COMBINED working array W = [M | I] (S, n, 2L):
    one row extraction and one fused rank-1 read-modify-write cover both
    the matrix and the inverse — half the LOGICAL ops per pivot of the
    two-array :func:`_gj_inverse_kernel`.

    MEASURED NEGATIVE RESULT (v5e, 1024x(120,120)): 22.1 ms vs 11.7 ms
    for the two-array kernel — like the in-place and rank-r variants,
    Mosaic lowers the restructured update worse than the naive rank-1
    form (256-lane rows span two tiles per sublane). The flat kernel is
    the local optimum on this toolchain; kept as documentation."""
    s, n, lanes2 = w_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes2), 1)
    row_ids_l = jax.lax.broadcasted_iota(jnp.int32, (s, n, n_left), 1)
    col_ids_l = jax.lax.broadcasted_iota(jnp.int32, (s, n, n_left), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (s, lanes2), 1)

    # right half starts as the identity
    out_ref[:] = w_ref[:]
    eye = jnp.where(row_ids_l == col_ids_l, 1.0, 0.0).astype(w_ref.dtype)
    out_ref[:, :, n_left:2 * n_left] = eye

    def step(k, _):
        w = out_ref[:]
        at_row = row_ids == k
        row = jnp.sum(jnp.where(at_row, w, 0.0), axis=1)        # (S,2L)
        d = jnp.sum(jnp.where(lane2 == k, row, 0.0), axis=1,
                    keepdims=True)                              # (S,1)
        rd = row * (1.0 / d)                                    # (S,2L)
        col = jnp.sum(jnp.where(col_ids_l == k,
                                w[:, :, 0:n_left], 0.0), axis=2)  # (S,n)
        factor = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (s, n), 1) == k,
            0.0, col)
        upd = w - factor[:, :, None] * rd[:, None, :]
        out_ref[:] = jnp.where(at_row, rd[:, None, :], upd)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_inverse_combined(m: jnp.ndarray, block: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the combined-[M|I] GJ kernel:
    (B, n, n) -> (B, n, n). Same contract and numerics class as
    :func:`batched_inverse`."""
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    mm = jnp.zeros((b_pad, n_pad, 2 * n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_combined_kernel, n_steps=n, n_left=n_pad),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, 2 * n_pad), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, n_pad, 2 * n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, n_pad, 2 * n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, n_pad:n_pad + n]


def _gj_rank_r_kernel(m_ref, out_ref, *, n_steps: int, rank: int):
    """Rank-``rank`` aggregated Gauss-Jordan inversion.

    Per outer step, ``rank`` pivot rows are extracted with ONE dynamic
    roll (pltpu.roll with a traced shift) instead of per-pivot masked
    reductions, eliminated against each other sequentially on the small
    (S, rank, L) slab (progressive within-panel factors — numerically
    validated: resid 7.7e-4 at rank 2 / 3.6e-3 at rank 4 on the MPC KKT
    family, vs 8e-4 for pure sequential and 3e-1 at rank 8), and applied
    to both working arrays as one fused multi-rank-1 update — amortizing
    the row/column-extraction ALU over ``rank`` pivots.

    Requires n_steps % rank == 0; SPD input (no pivoting).
    """
    s, n, lanes = m_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 2)

    out_ref[:] = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(
        m_ref.dtype)

    def step(t, _):
        k0 = t * rank
        m = m_ref[:]
        inv = out_ref[:]
        # panel columns (original rows) and panel rows, via dynamic rolls
        a_lanes = pltpu.roll(m, (lanes - k0) % lanes, 2)   # cols k0.. -> 0..
        f_cols = a_lanes[:, :, 0:rank]                     # (S, n, r)
        slab_m = pltpu.roll(a_lanes, (n - k0) % n, 1)[:, 0:rank, :]
        # (S, r, L): rows k0..k0+r in LANE-ROLLED space (pivot j at lane j)
        slab_i = pltpu.roll(inv, (n - k0) % n, 1)[:, 0:rank, :]

        # sequential within-panel elimination (static tiny ops)
        for j in range(rank):
            piv = slab_m[:, j:j + 1, j:j + 1]              # (S,1,1)
            inv_p = 1.0 / piv
            rm = slab_m[:, j:j + 1, :] * inv_p             # (S,1,L)
            ri = slab_i[:, j:j + 1, :] * inv_p
            fac = slab_m[:, :, j:j + 1]                    # (S,r,1)
            fac = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (s, rank, 1), 1) == j,
                0.0, fac)
            slab_m = slab_m - fac * rm
            slab_i = slab_i - fac * ri
            one_hot = jax.lax.broadcasted_iota(
                jnp.int32, (s, rank, 1), 1) == j
            slab_m = jnp.where(one_hot, rm, slab_m)
            slab_i = jnp.where(one_hot, ri, slab_i)

        # back to original lane space
        r_m = pltpu.roll(slab_m, k0, 2)                    # (S,r,L)
        r_i = slab_i

        in_panel = (row_ids >= k0) & (row_ids < k0 + rank)   # (S,n,L)
        fz = jnp.where(in_panel[:, :, 0:rank], 0.0, f_cols)  # zero panel rows

        # fused multi-rank-1 update + panel-row write-back
        upd_m = m
        upd_i = inv
        for j in range(rank):
            upd_m = upd_m - fz[:, :, j:j + 1] * r_m[:, j:j + 1, :]
            upd_i = upd_i - fz[:, :, j:j + 1] * r_i[:, j:j + 1, :]
        # place the eliminated panel rows back: pad + roll into position
        # (concatenate, not .at[].set — Mosaic has no scatter lowering)
        zrows = jnp.zeros((s, n - rank, lanes), m.dtype)
        pad_m = jnp.concatenate([r_m, zrows], axis=1)
        pad_i = jnp.concatenate([r_i, zrows], axis=1)
        m_ref[:] = jnp.where(in_panel, pltpu.roll(pad_m, k0, 1), upd_m)
        out_ref[:] = jnp.where(in_panel, pltpu.roll(pad_i, k0, 1), upd_i)
        return 0

    jax.lax.fori_loop(0, n_steps // rank, step, 0)


def _gj_rank_masked_kernel(m_ref, out_ref, *, n_steps: int, rank: int):
    """Rank-``rank`` aggregated Gauss-Jordan with MASKED extractions (no
    pltpu.roll — the rolls are what ate the aggregation win in
    :func:`_gj_rank_r_kernel`, measured).

    Motivation: synthetic probes measured a fixed per-fori-step cost
    (~10 us/step at block 16) dominating pass costs — a 5-pass and a
    7-pass GJ body time identically — suggesting r-fold step aggregation
    should win. MEASURED OUTCOME (v5e, 2026-08-21): it does NOT — rank 4
    compiles but runs 14.8 ms (vs flat GJ 11.2), and Mosaic CRASHES
    (tpu_compile_helper exit 1) at rank 8/16: the many live panel values
    blow the register allocator, and the synthetic step-cost model does
    not transfer to real bodies. Kept as a documented negative result
    with interpret-mode numerics tests (exact sequential-GJ equivalence,
    2e-5 on the KKT family at any rank).

    Per panel step t (pivots k0..k0+r-1), against the PRE-PANEL m / inv:
    - pivot row j is extracted raw, then corrected by previous panel
      pivots (e = corrected-row entry at column k0+l), scaled by 1/d;
    - the factor column j is extracted raw and corrected by previous
      pivots' columns (g = scaled row l entry at column kj);
    - each factor column's own pivot-row entry is set to d-1 so the
      fused update also scales the pivot rows in place (r - (d-1) r/d =
      r/d), with the cross-term identity c_orig[kl] - (d_l-1) g = g
      keeping later corrections exact.

    Same numerics class as the roll-based rank kernel (progressive
    within-panel factors): validated 7e-4 at rank 8 on the
    swing-eliminated KKT family. Requires n_steps % rank == 0."""
    s, n, lanes = m_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 2)
    col_row = jax.lax.broadcasted_iota(jnp.int32, (s, 1, lanes), 2)
    col_of_col = jax.lax.broadcasted_iota(jnp.int32, (s, n, 1), 1)

    out_ref[:] = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(
        m_ref.dtype)

    def step(t, _):
        k0 = t * rank
        m = m_ref[:]
        inv = out_ref[:]
        rows_m = []
        rows_i = []
        cols = []
        for j in range(rank):
            kj = k0 + j
            at_row = row_ids == kj
            rm = jnp.sum(jnp.where(at_row, m, 0.0), axis=1,
                         keepdims=True)              # (S,1,n) raw row
            ri = jnp.sum(jnp.where(at_row, inv, 0.0), axis=1,
                         keepdims=True)
            cj = jnp.sum(jnp.where(col_ids == kj, m, 0.0), axis=2,
                         keepdims=True)              # (S,n,1) raw col
            for l in range(j):
                e = jnp.sum(jnp.where(col_row == k0 + l, rm, 0.0),
                            axis=2, keepdims=True)   # (S,1,1)
                rm = rm - e * rows_m[l]
                ri = ri - e * rows_i[l]
            d = jnp.sum(jnp.where(col_row == kj, rm, 0.0), axis=2,
                        keepdims=True)
            inv_d = 1.0 / d
            rm = rm * inv_d
            ri = ri * inv_d
            for l in range(j):
                g = jnp.sum(jnp.where(col_row == kj, rows_m[l], 0.0),
                            axis=2, keepdims=True)   # (S,1,1)
                cj = cj - cols[l] * g
            cj = jnp.where(col_of_col == kj, d - 1.0, cj)
            rows_m.append(rm)
            rows_i.append(ri)
            cols.append(cj)
        for j in range(rank):
            m = m - cols[j] * rows_m[j]
            inv = inv - cols[j] * rows_i[j]
        m_ref[:] = m
        out_ref[:] = inv
        return 0

    jax.lax.fori_loop(0, n_steps // rank, step, 0)


@functools.partial(jax.jit, static_argnames=("rank", "block", "interpret"))
def batched_inverse_rank_masked(m: jnp.ndarray, rank: int = 8,
                                block: int = 16,
                                interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the roll-free rank-aggregated
    GJ kernel: (B, n, n) -> (B, n, n). Same contract as
    :func:`batched_inverse`."""
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    n_steps = ((n + rank - 1) // rank) * rank   # extra pivots hit identity
    mm = jnp.zeros((b_pad, n_pad, n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_rank_masked_kernel, n_steps=n_steps,
                          rank=rank),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, :n]


@functools.partial(jax.jit, static_argnames=("rank", "block", "interpret"))
def batched_inverse_rank(m: jnp.ndarray, rank: int = 2, block: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the rank-r aggregated GJ
    kernel: (B, n, n) -> (B, n, n). Same contract as
    :func:`batched_inverse`. The kernel keeps ~8 (block, n, n) live
    temporaries (rolled copies, pads, updates), so ``block`` > 8 exceeds
    the 16 MB VMEM scoped limit at n=128."""
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    n_steps = ((n + rank - 1) // rank) * rank   # extra pivots hit identity
    mm = jnp.zeros((b_pad, n_pad, n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_rank_r_kernel, n_steps=n_steps, rank=rank),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, :n]

def _sweep_inverse_kernel(m_ref, out_ref):
    """SPD inversion via the symmetric sweep operator: sweeping every
    pivot of an SPD matrix yields -A^-1 (Goodnight 1979), and — unlike
    Gauss-Jordan with a separate identity — the working matrix stays
    SYMMETRIC, so the pivot column equals the pivot row and one array
    suffices. Per pivot: one masked row-extraction and one rank-1 FMA
    over the (S, n, n) block (vs ~6 full passes over two arrays for GJ).
    SPD => pivots are Schur-complement diagonals, all positive: no
    pivoting needed."""
    s, n, _ = m_ref.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, n), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, n), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)

    def step(k, a):
        at_row = row_ids == k
        at_col = col_ids == k
        r = jnp.sum(jnp.where(at_row, a, 0.0), axis=1)          # (S,n)
        d = jnp.sum(jnp.where(lane == k, r, 0.0), axis=1,
                    keepdims=True)                              # (S,1)
        inv_d = 1.0 / d
        rd = r * inv_d                                          # (S,n)
        upd = a - (r[:, :, None] * rd[:, None, :])              # rank-1
        out = jnp.where(at_row, rd[:, None, :], upd)
        out = jnp.where(at_col, rd[:, :, None], out)
        out = jnp.where(at_row & at_col, -inv_d[:, :, None], out)
        return out

    out_ref[:] = -jax.lax.fori_loop(0, n, step, m_ref[:])


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_inverse_spd(m: jnp.ndarray, block: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the sweep-operator kernel:
    (B, n, n) -> (B, n, n). Same contract as :func:`batched_inverse` but
    ~2x less VMEM traffic (exploits symmetry)."""
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    mm = jnp.zeros((b_pad, n_pad, n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        _sweep_inverse_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad, n_pad), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, :n]


def _gj_inverse_T_kernel(m_ref, out_ref, *, n_steps: int):
    """Transposed-layout Gauss-Jordan: arrays are (n_i, n_j, S) — ROWS in
    the untiled leading dim, COLUMNS in sublanes, the SCENARIO BATCH in
    lanes. Compared to the batch-leading `_gj_inverse_kernel`:

    - the pivot row is a FREE dynamic slice ``ref[pl.ds(k, 1)]`` (leading
      dim is untiled — dynamic indexing is legal there), not a masked
      full-array reduction;
    - the scaled pivot row writes back as a direct store, not a
      whole-array select;
    - the pivot column extraction is a keepdims sublane reduction whose
      (n, 1, S) result broadcasts into the rank-1 update with NO relayout;
    - n need only be a multiple of the 8-sublane granule (120 qualifies),
      so no identity padding and no wasted pivots — only the batch pads
      to the 128-lane width.
    """
    n_i, n_j, s = m_ref.shape
    j3 = jax.lax.broadcasted_iota(jnp.int32, (n_i, n_j, s), 1)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (n_i, 1, s), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n_j, s), 1)

    out_ref[:] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n_i, n_j, s), 0) == j3,
        1.0, 0.0).astype(m_ref.dtype)

    def step(k, _):
        m = m_ref[:]
        c = jnp.sum(jnp.where(j3 == k, m, 0.0), axis=1,
                    keepdims=True)                       # (n_i,1,S) col k
        rm = m_ref[pl.ds(k, 1)]                          # (1,n_j,S) row k
        ri = out_ref[pl.ds(k, 1)]
        d = jnp.sum(jnp.where(jj == k, rm, 0.0), axis=1,
                    keepdims=True)                       # (1,1,S)
        inv_d = 1.0 / d
        rdm = rm * inv_d
        rdi = ri * inv_d
        f = jnp.where(i3 == k, 0.0, c)                   # zero at pivot row
        m_ref[:] = m - f * rdm
        inv = out_ref[:]
        out_ref[:] = inv - f * rdi
        m_ref[pl.ds(k, 1)] = rdm
        out_ref[pl.ds(k, 1)] = rdi
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)


@functools.partial(jax.jit, static_argnames=("sblock", "interpret"))
def batched_inverse_T(m: jnp.ndarray, sblock: int = 128,
                      interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the transposed-layout GJ kernel:
    (B, n, n) -> (B, n, n). ``sblock`` scenarios ride the LANE axis per
    grid step; on hardware the lane-dim block size MUST be a multiple of
    128 (Mosaic block rule) — smaller values are for interpret-mode tests
    only. Two (120,120,128) f32 arrays are ~14.7 MB of VMEM."""
    b, n, _ = m.shape
    n_pad = _round_up(n, 8)
    b_pad = _round_up(b, sblock)
    mt = jnp.zeros((n_pad, n_pad, b_pad), m.dtype)
    mt = mt.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    mt = mt.at[:n, :n, :b].set(jnp.transpose(m, (1, 2, 0)))

    out = pl.pallas_call(
        functools.partial(_gj_inverse_T_kernel, n_steps=n),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), m.dtype),
        grid=(b_pad // sblock,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mt)
    return jnp.transpose(out[:n, :n, :b], (2, 0, 1))


def _sweep_inverse_T_chunked_kernel(m_ref, out_ref, *, n_steps: int,
                                    chunk: int):
    """Row-chunked variant of :func:`_sweep_inverse_T_kernel`.

    Identical math, but every full-array operation is issued as a static
    Python loop over leading-dim slabs of ``chunk`` rows, so no value in
    flight exceeds (chunk, n_j, S). Mosaic on this image crashes
    (`tpu_compile_helper exit 1`) when asked to materialize
    (120, 120, 128) values (~1.8k vector registers), while (8, n, 128)
    slabs compile and run — verified by a tiny-shape probe; see
    docs/ROADMAP.md round-3 notes."""
    n_i, n_j, s = out_ref.shape
    nch = n_i // chunk
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n_j, s), 1)
    j3c = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_j, s), 1)

    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        out_ref[sl] = m_ref[sl]

    def step(k, _):
        rk = out_ref[pl.ds(k, 1)]                        # (1,n_j,S) row k
        d = jnp.sum(jnp.where(jj == k, rk, 0.0), axis=1,
                    keepdims=True)                       # (1,1,S)
        inv_d = 1.0 / d
        rd_row = rk * inv_d
        for c in range(nch):
            sl = pl.ds(c * chunk, chunk)
            w = out_ref[sl]                              # (chunk,n_j,S)
            cc = jnp.sum(jnp.where(j3c == k, w, 0.0), axis=1,
                         keepdims=True)                  # (chunk,1,S)
            upd = w - cc * rd_row                        # rank-1 slab
            upd = jnp.where(j3c == k, cc * inv_d, upd)   # column fix
            out_ref[sl] = upd
        out_ref[pl.ds(k, 1)] = jnp.where(jj == k, -inv_d, rd_row)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        out_ref[sl] = -out_ref[sl]


@functools.partial(jax.jit, static_argnames=("sblock", "chunk",
                                             "interpret"))
def batched_inverse_sweep_T_chunked(m: jnp.ndarray, sblock: int = 128,
                                    chunk: int = 8,
                                    interpret: bool = False
                                    ) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the row-chunked transposed
    sweep kernel: (B, n, n) -> (B, n, n). The variant of
    :func:`batched_inverse_sweep_T` that this image's Mosaic build can
    compile at n=120."""
    b, n, _ = m.shape
    # pad to a multiple of lcm(8, chunk): the kernel slabs the leading dim
    # in exact ``chunk``-row steps (nch = n_i // chunk), so a chunk that
    # does not divide the padded n would silently drop trailing rows
    n_pad = _round_up(n, math.lcm(8, chunk))
    b_pad = _round_up(b, sblock)
    mt = jnp.zeros((n_pad, n_pad, b_pad), m.dtype)
    mt = mt.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    mt = mt.at[:n, :n, :b].set(jnp.transpose(m, (1, 2, 0)))

    out = pl.pallas_call(
        functools.partial(_sweep_inverse_T_chunked_kernel, n_steps=n,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), m.dtype),
        grid=(b_pad // sblock,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(mt)
    return jnp.transpose(out[:n, :n, :b], (2, 0, 1))


def _sweep_inverse_T_masked_kernel(m_ref, out_ref, *, n_steps: int,
                                   chunk: int):
    """Row-chunked transposed sweep with NO dynamic ref indexing.

    Probe status on this image's Mosaic (scripts/probe_mosaic*.py,
    2026-08-21): dynamic ``ref[pl.ds(k, 1)]`` leading-dim reads/STORES
    pass in isolation (the masked2 variant's dynamic-slice store probed
    PASS), but the specific read pattern in the CHUNKED sweep variant
    (_sweep_inverse_T_chunked_kernel: dynamic slab reads inside the
    pivot loop combined with in/out aliasing) crashes
    (`tpu_compile_helper exit 1`). The decisive, fully-reproduced
    crasher is ANY grid over the lane dimension (CLAUDE.md). This
    variant avoids both hazards:

    - all leading-dim slices are STATIC ``chunk``-row slabs;
    - the pivot row is CARRIED through the fori_loop as a (1, n, S)
      register value: while slab-updating for pivot k, the row k+1 of
      the updated matrix is accumulated by a masked sublane reduction —
      the data is already in registers, so extraction is ~free;
    - the pivot-row write becomes a masked select merged into the slab
      update pass.

    Net cost ~1 read + 1 write full-array stream per pivot (vs ~7 for
    the flat batch-leading GJ kernel)."""
    n_i, n_j, s = out_ref.shape
    nch = n_i // chunk
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n_j, s), 1)
    j3c = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_j, s), 1)
    i3c = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, s), 0)

    # copy in + extract row 0
    rk = jnp.zeros((1, n_j, s), out_ref.dtype)
    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        w = m_ref[sl]
        out_ref[sl] = w
        rk = rk + jnp.sum(jnp.where(i3c + c * chunk == 0, w, 0.0),
                          axis=0, keepdims=True)

    def step(k, rk):
        d = jnp.sum(jnp.where(jj == k, rk, 0.0), axis=1,
                    keepdims=True)                       # (1,1,S)
        inv_d = 1.0 / d
        rd_row = rk * inv_d
        rowk = jnp.where(jj == k, -inv_d, rd_row)        # final row k
        rk_next = jnp.zeros((1, n_j, s), out_ref.dtype)
        for c in range(nch):
            sl = pl.ds(c * chunk, chunk)
            w = out_ref[sl]                              # (chunk,n_j,S)
            cc = jnp.sum(jnp.where(j3c == k, w, 0.0), axis=1,
                         keepdims=True)                  # (chunk,1,S)
            upd = w - cc * rd_row                        # rank-1 slab
            upd = jnp.where(j3c == k, cc * inv_d, upd)   # column fix
            upd = jnp.where(i3c + c * chunk == k, rowk, upd)  # row fix
            out_ref[sl] = upd
            rk_next = rk_next + jnp.sum(
                jnp.where(i3c + c * chunk == k + 1, upd, 0.0),
                axis=0, keepdims=True)
        return rk_next

    jax.lax.fori_loop(0, n_steps, step, rk)
    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        out_ref[sl] = -out_ref[sl]


@functools.partial(jax.jit, static_argnames=("sblock", "chunk",
                                             "interpret", "alias"))
def batched_inverse_sweep_T_masked(m: jnp.ndarray, sblock: int = 128,
                                   chunk: int = 8,
                                   interpret: bool = False,
                                   alias: bool = True) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the masked row-carry
    transposed sweep kernel: (B, n, n) -> (B, n, n). The no-dynamic-
    indexing variant built for this image's Mosaic (which rejects
    ``ref[pl.ds(k, 1)]`` on the untiled dim outright). ``alias=False``
    disables the in/out VMEM aliasing (compile-compatibility probe)."""
    b, n, _ = m.shape
    n_pad = _round_up(n, math.lcm(8, chunk))
    b_pad = _round_up(b, sblock)
    mt = jnp.zeros((n_pad, n_pad, b_pad), m.dtype)
    mt = mt.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    mt = mt.at[:n, :n, :b].set(jnp.transpose(m, (1, 2, 0)))

    out = pl.pallas_call(
        functools.partial(_sweep_inverse_T_masked_kernel, n_steps=n,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), m.dtype),
        grid=(b_pad // sblock,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0} if alias else {},
        interpret=interpret,
    )(mt)
    return jnp.transpose(out[:n, :n, :b], (2, 0, 1))


def _sweep_inverse_T_masked2_kernel(m_ref, out_ref, *, n_steps: int,
                                    chunk: int):
    """Two-pass slab sweep with NO vector carry and NO broadcast row fix.

    Per pivot: pass 1 extracts the pivot row by slab-wise masked sublane
    reductions (probed PASS on this Mosaic); pass 2 does the bounded-slab
    rank-1 update + column fix; the pivot row is then written by ONE
    dynamic-slice store (probed PASS) instead of a (chunk,1,S) x
    (1,n,S) x (chunk,n,S) three-way broadcast select — the remaining
    unprobed construct in the row-carry variant."""
    n_i, n_j, s = out_ref.shape
    nch = n_i // chunk
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n_j, s), 1)
    j3c = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_j, s), 1)
    i3c = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, s), 0)

    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        out_ref[sl] = m_ref[sl]

    def step(k, _):
        rk = jnp.zeros((1, n_j, s), out_ref.dtype)
        for c in range(nch):
            sl = pl.ds(c * chunk, chunk)
            w = out_ref[sl]
            rk = rk + jnp.sum(
                jnp.where(i3c + c * chunk == k, w, 0.0), axis=0,
                keepdims=True)
        d = jnp.sum(jnp.where(jj == k, rk, 0.0), axis=1, keepdims=True)
        inv_d = 1.0 / d
        rd_row = rk * inv_d
        for c in range(nch):
            sl = pl.ds(c * chunk, chunk)
            w = out_ref[sl]
            cc = jnp.sum(jnp.where(j3c == k, w, 0.0), axis=1,
                         keepdims=True)
            upd = w - cc * rd_row
            upd = jnp.where(j3c == k, cc * inv_d, upd)
            out_ref[sl] = upd
        out_ref[pl.ds(k, 1)] = jnp.where(jj == k, -inv_d, rd_row)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    for c in range(nch):
        sl = pl.ds(c * chunk, chunk)
        out_ref[sl] = -out_ref[sl]


@functools.partial(jax.jit, static_argnames=("sblock", "chunk",
                                             "interpret", "alias"))
def batched_inverse_sweep_T_masked2(m: jnp.ndarray, sblock: int = 128,
                                    chunk: int = 8,
                                    interpret: bool = False,
                                    alias: bool = True) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the two-pass slab sweep
    kernel (every construct individually compile-probed on this image's
    Mosaic): (B, n, n) -> (B, n, n)."""
    b, n, _ = m.shape
    n_pad = _round_up(n, math.lcm(8, chunk))
    b_pad = _round_up(b, sblock)
    mt = jnp.zeros((n_pad, n_pad, b_pad), m.dtype)
    mt = mt.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    mt = mt.at[:n, :n, :b].set(jnp.transpose(m, (1, 2, 0)))

    out = pl.pallas_call(
        functools.partial(_sweep_inverse_T_masked2_kernel, n_steps=n,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), m.dtype),
        grid=(b_pad // sblock,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0} if alias else {},
        interpret=interpret,
    )(mt)
    return jnp.transpose(out[:n, :n, :b], (2, 0, 1))


def _sweep_inverse_T_kernel(m_ref, out_ref, *, n_steps: int,
                            sym_col: bool):
    """Transposed-layout symmetric sweep-operator inversion (single
    working array — sweeping every pivot of an SPD matrix yields -A^-1,
    and the working matrix stays symmetric throughout).

    Layout (n_i, n_j, S) as in :func:`_gj_inverse_T_kernel`. Per pivot:
    one pivot-column extraction, one fused rank-1 update + column fix,
    one direct pivot-row store — roughly 3 full-array passes against ~7
    for the two-array batch-leading GJ.

    ``sym_col``: exploit symmetry to obtain the pivot COLUMN by
    relayouting the freely-sliced pivot ROW ((1,n,S) -> (n,1,S) axis
    swap) instead of a masked full-array reduction — one fewer full pass
    if Mosaic lowers the thin transpose well."""
    n_i, n_j, s = m_ref.shape
    j3 = jax.lax.broadcasted_iota(jnp.int32, (n_i, n_j, s), 1)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (n_i, 1, s), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, n_j, s), 1)

    out_ref[:] = m_ref[:]

    def step(k, _):
        w = out_ref[:]
        rk = out_ref[pl.ds(k, 1)]                        # (1,n_j,S) row k
        if sym_col:
            c = jnp.swapaxes(rk, 0, 1)                   # (n_i,1,S) col k
        else:
            c = jnp.sum(jnp.where(j3 == k, w, 0.0), axis=1,
                        keepdims=True)
        d = jnp.sum(jnp.where(jj == k, rk, 0.0), axis=1,
                    keepdims=True)                       # (1,1,S)
        inv_d = 1.0 / d
        rd_row = rk * inv_d                              # (1,n_j,S)
        rd_col = c * inv_d                               # (n_i,1,S)
        upd = w - c * rd_row                             # rank-1 update
        upd = jnp.where(j3 == k, rd_col, upd)            # column fix
        out_ref[:] = upd
        out_ref[pl.ds(k, 1)] = jnp.where(jj == k, -inv_d, rd_row)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    out_ref[:] = -out_ref[:]


@functools.partial(jax.jit, static_argnames=("sblock", "sym_col",
                                             "interpret"))
def batched_inverse_sweep_T(m: jnp.ndarray, sblock: int = 128,
                            sym_col: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices with the transposed-layout sweep
    kernel: (B, n, n) -> (B, n, n). Single working array => a full
    128-lane scenario block at n=120 fits VMEM comfortably. Same numerics
    class as sequential GJ (rank-1 pivots, no Schur shortcuts)."""
    b, n, _ = m.shape
    n_pad = _round_up(n, 8)
    b_pad = _round_up(b, sblock)
    mt = jnp.zeros((n_pad, n_pad, b_pad), m.dtype)
    mt = mt.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    mt = mt.at[:n, :n, :b].set(jnp.transpose(m, (1, 2, 0)))

    out = pl.pallas_call(
        functools.partial(_sweep_inverse_T_kernel, n_steps=n,
                          sym_col=sym_col),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, b_pad), m.dtype),
        grid=(b_pad // sblock,),
        in_specs=[pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, sblock),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        # single working array: donate the (fresh, transposed) input so
        # the in/out VMEM windows coincide — halves resident VMEM, which
        # is what lets a full 128-lane scenario block fit at n=120
        input_output_aliases={0: 0},
        interpret=interpret,
    )(mt)
    # identity pad rows sweep to -1 on the diagonal and are sliced off;
    # the [:n,:n] block is exactly the inverse
    return jnp.transpose(out[:n, :n, :b], (2, 0, 1))
