"""Pallas TPU kernels for the batched solver hot path.

Two kernels:

- :func:`batched_inverse` — Gauss-Jordan inversion of a block of SPD KKT
  matrices in lock-step (every pivot step is a wide (S, n, n) VPU rank-1
  update). The KKT matrix P + sigma I + A' diag(rho) A is SPD, so no
  pivoting is needed.
- :func:`fused_admm` — the WHOLE fixed-iteration ADMM loop as one kernel.
  The iteration-major XLA loop re-reads each scenario's (120,120) KKT
  inverse and (200,120) constraint matrix from HBM on every one of the
  ~50 iterations (50 x ~150 MB at batch 1024); this kernel is
  scenario-major — each grid step pins a block of scenarios' operands in
  VMEM and runs all iterations there, so HBM traffic drops by ~iters x.
  Per-scenario matvecs become (S, m, n) broadcast-multiply + axis
  reductions: pure whole-block VPU work.

Matrices are padded to 128 (the TPU lane width); padding is constructed so
padded entries stay exactly zero through the iteration (see _pad notes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _gj_inverse_kernel(m_ref, out_ref, *, n_steps=None):
    """Invert S matrices of shape (n, n) in lock-step. m_ref/out_ref:
    (S, n, n) VMEM. All dynamic indexing goes through refs (pl.ds) —
    value-level dynamic_slice has no Pallas TPU lowering.

    ``n_steps`` bounds the pivot loop: if the actual matrix occupies only
    the leading ``n_steps`` rows/cols (identity padding beyond), the
    remaining pivots are no-ops (pivot 1, zero column) and are skipped.
    Blocks may be rectangular (rows padded to the sublane granule only,
    lanes to 128) as long as n_steps <= rows <= lanes."""
    s, n, lanes = m_ref.shape

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, lanes), 2)
    out_ref[:] = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(
        m_ref.dtype)

    def step(k, _):
        # Mosaic restricts dynamic slicing in the tiled (sublane/lane)
        # dims, so the pivot row/column are extracted with masked
        # reductions — every step is whole-block VPU work, which is
        # exactly the shape the hardware wants.
        m = m_ref[:]
        inv = out_ref[:]
        at_row = row_ids == k                   # (S,n,n)
        at_col = col_ids == k
        row_m = jnp.sum(jnp.where(at_row, m, 0.0), axis=1,
                        keepdims=True)          # (S,1,n) pivot row
        row_i = jnp.sum(jnp.where(at_row, inv, 0.0), axis=1,
                        keepdims=True)
        col = jnp.sum(jnp.where(at_col, m, 0.0), axis=2,
                      keepdims=True)            # (S,n,1) pivot column
        diag = jnp.sum(jnp.where(col_ids[:, :1, :] == k, row_m, 0.0),
                       axis=2, keepdims=True)   # (S,1,1)
        inv_d = 1.0 / diag
        row_m = row_m * inv_d
        row_i = row_i * inv_d
        # elimination factors: pivot column, with the PIVOT-ROW entry set
        # to diag - 1 instead of 0 — then the rank-1 update itself scales
        # the pivot row in place (r - (diag-1) r/diag = r/diag), saving
        # the two whole-block select-write passes the previous version
        # spent restoring the scaled rows. NOTE: measured NEUTRAL on v5e
        # (11.2 ms either way at 1024x120) — the kernel's cost is not
        # pass-count-bound — but the simpler body is kept.
        factor = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (s, n, 1), 1) == k,
            diag - 1.0, col)
        m_ref[:] = m - factor * row_m           # rank-1 update (VPU)
        out_ref[:] = inv - factor * row_i
        return 0

    jax.lax.fori_loop(0, n if n_steps is None else n_steps, step, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_inverse(m: jnp.ndarray, block: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """Invert a batch of SPD matrices: (B, n, n) -> (B, n, n).

    n is padded to the 128-lane width internally; B is padded to a multiple
    of ``block`` (the number of matrices inverted per grid step).
    """
    b, n, _ = m.shape
    n_pad = max(LANE, ((n + LANE - 1) // LANE) * LANE)
    b_pad = ((b + block - 1) // block) * block
    mm = jnp.zeros((b_pad, n_pad, n_pad), m.dtype)
    mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_inverse_kernel, n_steps=n),
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


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_inverse_small(m: jnp.ndarray, block: int = 64,
                          interpret: bool = False) -> jnp.ndarray:
    """Gauss-Jordan inverse for SMALL matrices (n <= ~64): rows are padded
    only to the 8-sublane granule (not the full 128 lane width), so the
    per-pivot VPU work is ~n x 128 instead of 128 x 128 — the base case of
    :func:`spd_block_inverse`."""
    b, n, _ = m.shape
    assert n <= LANE, "batched_inverse_small: n must fit one lane tile"
    r_pad = max(8, ((n + 7) // 8) * 8)
    b_pad = ((b + block - 1) // block) * block
    mm = jnp.zeros((b_pad, r_pad, LANE), m.dtype)
    mm = mm.at[:b, :n, :n].set(m)

    out = pl.pallas_call(
        functools.partial(_gj_inverse_kernel, n_steps=n),
        out_shape=jax.ShapeDtypeStruct((b_pad, r_pad, LANE), m.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, r_pad, LANE),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, r_pad, LANE),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mm)
    return out[:b, :n, :n]


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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


def _chol_linv_kernel(a_ref, out_ref, *, n_steps: int):
    """Batched panel kernel: SPD (S, p, p) -> L^{-1} (lower) where
    A = L L'. The sequential part of the blocked-Cholesky inverse
    (ops/linalg.spd_cholesky_inverse_hybrid): outer-product Cholesky
    followed by forward-substitution triangular inversion, in the
    batch-leading layout the flat GJ kernel uses (grid over the BATCH
    dim — grids over the lane dim crash this image's Mosaic, see
    docs/ROADMAP.md round-3 notes).

    Exploits the symmetry of the trailing matrix: the pivot row and
    column are extracted with one axis-1 and one axis-2 masked reduce
    (no transposes). L is accumulated directly in TRANSPOSED form (lt)
    so the substitution pass can read L's row k as an (S, p, 1) column
    of lt with a legal axis-2 reduce."""
    s, p, _ = a_ref.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, p, p), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, p, p), 2)

    def chol_step(k, carry):
        a, lt = carry
        rowk = jnp.sum(jnp.where(ii == k, a, 0.0), axis=1,
                       keepdims=True)                    # (S,1,p)
        akk = jnp.sum(jnp.where(jj == k, rowk, 0.0), axis=2,
                      keepdims=True)                     # (S,1,1)
        akk = jnp.maximum(akk, 1e-30)
        colk = jnp.sum(jnp.where(jj == k, a, 0.0), axis=2,
                       keepdims=True)                    # (S,p,1)
        a = a - jnp.where((ii > k) & (jj > k), colk * rowk / akk, 0.0)
        # row k of L' = column k of L: [0.. sqrt(akk) .. rowk/sqrt]
        sq = jnp.sqrt(akk)
        ltrow = jnp.where(jj > k, rowk / sq,
                          jnp.where(jj == k, sq, 0.0))   # (S,1,p)
        lt = jnp.where(ii == k, ltrow, lt)
        return a, lt

    a0 = a_ref[:]
    lt0 = jnp.zeros_like(a0)
    _, lt = jax.lax.fori_loop(0, n_steps, chol_step, (a0, lt0))

    def sub_step(k, m):
        lcol = jnp.sum(jnp.where(jj == k, lt, 0.0), axis=2,
                       keepdims=True)                    # (S,p,1) = L row k
        lkk = jnp.sum(jnp.where(ii == k, lcol, 0.0), axis=1,
                      keepdims=True)                     # (S,1,1)
        prod = jnp.sum(lcol * m, axis=1, keepdims=True)  # (S,1,p)
        ek = jnp.where(jj == k, 1.0, 0.0)[:, 0:1, :]     # (S,1,p)
        mrow = (ek - prod) / jnp.maximum(lkk, 1e-30)
        return jnp.where(ii == k, mrow, m)

    m0 = jnp.zeros_like(a0)
    out_ref[:] = jax.lax.fori_loop(0, n_steps, sub_step, m0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def batched_chol_linv(a: jnp.ndarray, block: int = 64,
                      interpret: bool = False) -> jnp.ndarray:
    """L^{-1} of a batch of SPD panels: (B, p, p) -> (B, p, p) lower
    triangular, A = L L'. Pads p to a multiple of 8 with an identity
    tail (harmless extra pivots)."""
    b, p, _ = a.shape
    p_pad = _round_up(p, 8)
    b_pad = _round_up(b, block)
    aa = jnp.zeros((b_pad, p_pad, p_pad), a.dtype)
    aa = aa.at[:, jnp.arange(p_pad), jnp.arange(p_pad)].set(1.0)
    aa = aa.at[:b, :p, :p].set(a)

    out = pl.pallas_call(
        functools.partial(_chol_linv_kernel, n_steps=p_pad),
        out_shape=jax.ShapeDtypeStruct((b_pad, p_pad, p_pad), a.dtype),
        grid=(b_pad // block,),
        in_specs=[pl.BlockSpec((block, p_pad, p_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, p_pad, p_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aa)
    return out[:b, :p, :p]


def _fused_admm_kernel(minv_ref, a_ref, q_ref, l_ref, u_ref, rho_ref,
                       x0_ref, y0_ref, z0_ref, xo_ref, yo_ref, zo_ref,
                       *, iters: int, sigma: float, alpha: float):
    """All `iters` ADMM iterations for a block of S scenarios, operands
    resident in VMEM. Same update as ops.qp.admm_solve's one_iter (scaled
    space, fixed rho); matvecs with per-scenario matrices are expressed as
    broadcast-multiply + axis reductions (VPU-shaped)."""
    m = minv_ref[:]          # (S, n, n)   KKT inverse
    a = a_ref[:]             # (S, M, n)   scaled constraint matrix
    q = q_ref[:]             # (S, n)
    lb = l_ref[:]            # (S, M)
    ub = u_ref[:]            # (S, M)
    rho = rho_ref[:]         # (S, M)
    inv_rho = 1.0 / rho

    def one_iter(_, xyz):
        x, y, z = xyz
        w = rho * z - y                                       # (S,M)
        rhs = sigma * x - q + jnp.sum(a * w[:, :, None], axis=1)
        xt = jnp.sum(m * rhs[:, None, :], axis=2)             # Minv @ rhs
        x1 = alpha * xt + (1.0 - alpha) * x
        ax = jnp.sum(a * xt[:, None, :], axis=2)              # A @ xt
        zp = alpha * ax + (1.0 - alpha) * z
        z1 = jnp.clip(zp + y * inv_rho, lb, ub)
        y1 = y + rho * (zp - z1)
        return x1, y1, z1

    x, y, z = jax.lax.fori_loop(
        0, iters, one_iter, (x0_ref[:], y0_ref[:], z0_ref[:]))
    xo_ref[:] = x
    yo_ref[:] = y
    zo_ref[:] = z


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "block", "interpret"))
def fused_admm(minv: jnp.ndarray, a_s: jnp.ndarray, qs: jnp.ndarray,
               ls: jnp.ndarray, us: jnp.ndarray, rho_vec: jnp.ndarray,
               x0: jnp.ndarray, y0: jnp.ndarray, z0: jnp.ndarray,
               *, iters: int, sigma: float = 1e-6, alpha: float = 1.6,
               block: int = 16, interpret: bool = False):
    """Run `iters` lock-step ADMM iterations for B scenarios.

    All operands are in the SCALED problem space (post Ruiz equilibration),
    exactly as inside ops.qp.admm_solve:
      minv (B,n,n), a_s (B,m,n), qs (B,n), ls/us/rho_vec (B,m),
      x0 (B,n), y0/z0 (B,m).
    Returns scaled (x, y, z).

    Padding invariants: n -> n_pad with zero rows/cols of minv/a_s/qs (a
    padded x entry stays 0: minv's padded rows are zero). m -> m_pad with
    zero a_s rows, l = u = 0, rho = 1 (a padded (y, z) pair starts at 0 and
    stays 0: zt = 0, z1 = clip(zp + y, 0, 0) = 0, y1 = y + zp).
    """
    b, n = qs.shape
    mcon = ls.shape[1]
    n_pad = _round_up(max(n, LANE), LANE)
    m_pad = _round_up(max(mcon, LANE), LANE)
    b_pad = _round_up(b, block)
    dtype = qs.dtype

    def pad3(x, d1, d2):
        out = jnp.zeros((b_pad, d1, d2), dtype)
        return out.at[:b, :x.shape[1], :x.shape[2]].set(x)

    def pad2(x, d1, fill=0.0):
        out = jnp.full((b_pad, d1), fill, dtype)
        return out.at[:b, :x.shape[1]].set(x)

    minv_p = pad3(minv, n_pad, n_pad)
    a_p = pad3(a_s, m_pad, n_pad)
    q_p = pad2(qs, n_pad)
    l_p = pad2(ls, m_pad)
    u_p = pad2(us, m_pad)
    rho_p = pad2(rho_vec, m_pad, fill=1.0)
    x_p = pad2(x0, n_pad)
    y_p = pad2(y0, m_pad)
    z_p = pad2(z0, m_pad)

    grid = (b_pad // block,)
    spec3 = lambda d1, d2: pl.BlockSpec((block, d1, d2),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
    spec2 = lambda d1: pl.BlockSpec((block, d1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)

    kern = functools.partial(_fused_admm_kernel, iters=iters,
                             sigma=float(sigma), alpha=float(alpha))
    x, y, z = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),
            jax.ShapeDtypeStruct((b_pad, m_pad), dtype),
            jax.ShapeDtypeStruct((b_pad, m_pad), dtype),
        ),
        grid=grid,
        in_specs=[spec3(n_pad, n_pad), spec3(m_pad, n_pad),
                  spec2(n_pad), spec2(m_pad), spec2(m_pad), spec2(m_pad),
                  spec2(n_pad), spec2(m_pad), spec2(m_pad)],
        out_specs=(spec2(n_pad), spec2(m_pad), spec2(m_pad)),
        interpret=interpret,
    )(minv_p, a_p, q_p, l_p, u_p, rho_p, x_p, y_p, z_p)
    return x[:b, :n], y[:b, :mcon], z[:b, :mcon]


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


def _fused_admm_shared_kernel(a0_ref, a1_ref, minv_ref, d_ref,
                              e_ref, me_ref, q_ref, l_ref, u_ref, rho_ref,
                              x0_ref, y0_ref, z0_ref,
                              xo_ref, yo_ref, zo_ref,
                              *, iters: int, sigma: float, alpha: float):
    """fused_admm with the constraint matrix in shared-basis form
    A_s = diag(e_s) (A0 + mu_s A1) diag(d_s):

    - the two A-products per iteration become scenario-rows x shared-matrix
      MXU matmuls ((S,M)@(M,n) / (S,n)@(n,M) via dot_general) instead of
      per-scenario broadcast-reductions;
    - the only per-scenario matvec left is with the KKT inverse, which is
      SYMMETRIC — so it reduces over the sublane axis (cheap) rather than
      the lane axis.

    mu is pre-folded into ``me = mu * e`` so every operand is a clean
    (S, n|M) tile: As' v = D (A0'(e v) + A1'(mu e v)),
    As x = e (A0 (D x)) + mu e (A1 (D x)).
    """
    a0 = a0_ref[:]           # (M, n) shared
    a1 = a1_ref[:]           # (M, n) shared
    m = minv_ref[:]          # (S, n_rows, n) symmetric KKT inverse:
    #                          rows padded only to the 8-sublane granule
    #                          (not the 128-lane width) — the x-update
    #                          reduce below is the kernel's largest
    #                          whole-block VPU op and runs over the rows
    n_rows = m.shape[1]
    d = d_ref[:]             # (S, n)
    e = e_ref[:]             # (S, M)
    me = me_ref[:]           # (S, M)  = mu * e
    q = q_ref[:]             # (S, n)
    lb = l_ref[:]            # (S, M)
    ub = u_ref[:]            # (S, M)
    rho = rho_ref[:]         # (S, M)
    inv_rho = 1.0 / rho

    f32 = jnp.float32
    # HIGHEST is essential: Mosaic's default f32 dot runs at bf16 MXU
    # precision, which floors the ADMM primal residual at ~1e-2 relative
    # (measured: the solver never meets OSQP's 1e-3 tolerances on-chip
    # while the interpret-mode kernel converges fine)
    hi = jax.lax.Precision.HIGHEST
    contract_m = (((1,), (0,)), ((), ()))   # (S,M)@(M,n) -> (S,n)
    contract_n = (((1,), (1,)), ((), ()))   # (S,n)@(M,n)' -> (S,M)

    def one_iter(_, xyz):
        x, y, z = xyz
        w = rho * z - y                                        # (S,M)
        atw = (jax.lax.dot_general(e * w, a0, contract_m,
                                   preferred_element_type=f32,
                                   precision=hi)
               + jax.lax.dot_general(me * w, a1, contract_m,
                                     preferred_element_type=f32,
                                     precision=hi))
        rhs = sigma * x - q + d * atw                          # (S,n)
        # symmetric Minv x-update: sum_i minv[i, j] rhs[i] over the
        # (possibly sublane-only-padded) row extent; padded minv COLS
        # are zero so xt's padding stays exactly 0. NOTE: a basic-slice
        # spelling rhs[:, :n_rows, None] mis-lowers to a gather inside
        # the Mosaic kernel trace — use an explicit static lax.slice
        rhs_rows = jax.lax.slice_in_dim(rhs, 0, n_rows, axis=1)
        xt = jnp.sum(m * rhs_rows[:, :, None], axis=1)
        x1 = alpha * xt + (1.0 - alpha) * x
        xd = d * xt
        ax = (e * jax.lax.dot_general(xd, a0, contract_n,
                                      preferred_element_type=f32,
                                      precision=hi)
              + me * jax.lax.dot_general(xd, a1, contract_n,
                                         preferred_element_type=f32,
                                         precision=hi))
        zp = alpha * ax + (1.0 - alpha) * z
        z1 = jnp.clip(zp + y * inv_rho, lb, ub)
        y1 = y + rho * (zp - z1)
        return x1, y1, z1

    x, y, z = jax.lax.fori_loop(
        0, iters, one_iter, (x0_ref[:], y0_ref[:], z0_ref[:]))
    xo_ref[:] = x
    yo_ref[:] = y
    zo_ref[:] = z


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "block", "interpret"))
def fused_admm_shared(a0: jnp.ndarray, a1: jnp.ndarray, minv: jnp.ndarray,
                      mu: jnp.ndarray, d: jnp.ndarray, e: jnp.ndarray,
                      qs: jnp.ndarray, ls: jnp.ndarray, us: jnp.ndarray,
                      rho_vec: jnp.ndarray,
                      x0: jnp.ndarray, y0: jnp.ndarray, z0: jnp.ndarray,
                      *, iters: int, sigma: float = 1e-6,
                      alpha: float = 1.6, block: int = 32,
                      interpret: bool = False):
    """Batched fixed-iteration ADMM where the (unscaled) constraint matrix
    has the shared-basis form A_s = A0 + mu_s A1 and Ruiz scaling (d_s,
    e_s) is applied implicitly. ``minv`` must be the SYMMETRIC scaled-KKT
    inverse. Scaled-space x0/y0/z0 in, scaled (x, y, z) out.

    Padding: n and m padded to 128 multiples; pad rows get l = u = 0,
    rho = 1, e = 0 (so padded constraint rows contribute nothing), pad
    cols get d = 0, q = 0, zero minv rows/cols (padded x entries stay 0).
    """
    b, n = qs.shape
    mcon = ls.shape[1]
    n_pad = _round_up(max(n, LANE), LANE)
    m_pad = _round_up(max(mcon, LANE), LANE)
    b_pad = _round_up(b, block)
    dtype = qs.dtype

    def pad_shared(x):
        out = jnp.zeros((m_pad, n_pad), dtype)
        return out.at[:x.shape[0], :x.shape[1]].set(x)

    def pad3(x, d1, d2):
        out = jnp.zeros((b_pad, d1, d2), dtype)
        return out.at[:b, :x.shape[1], :x.shape[2]].set(x)

    def pad2(x, d1, fill=0.0):
        out = jnp.full((b_pad, d1), fill, dtype)
        return out.at[:b, :x.shape[1]].set(x)

    a0_p = pad_shared(a0)
    a1_p = pad_shared(a1)
    n_rows = _round_up(n, 8)        # sublane granule, not lane width
    minv_p = pad3(minv, n_rows, n_pad)
    d_p = pad2(d, n_pad)
    e_p = pad2(e, m_pad)
    me_p = pad2(mu[:, None] * e, m_pad)
    q_p = pad2(qs, n_pad)
    l_p = pad2(ls, m_pad)
    u_p = pad2(us, m_pad)
    rho_p = pad2(rho_vec, m_pad, fill=1.0)
    x_p = pad2(x0, n_pad)
    y_p = pad2(y0, m_pad)
    z_p = pad2(z0, m_pad)

    grid = (b_pad // block,)
    shared_spec = pl.BlockSpec((m_pad, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    spec3 = lambda d1, d2: pl.BlockSpec((block, d1, d2),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
    spec2 = lambda d1: pl.BlockSpec((block, d1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)

    kern = functools.partial(_fused_admm_shared_kernel, iters=iters,
                             sigma=float(sigma), alpha=float(alpha))
    x, y, z = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),
            jax.ShapeDtypeStruct((b_pad, m_pad), dtype),
            jax.ShapeDtypeStruct((b_pad, m_pad), dtype),
        ),
        grid=grid,
        in_specs=[shared_spec, shared_spec, spec3(n_rows, n_pad),
                  spec2(n_pad), spec2(m_pad), spec2(m_pad),
                  spec2(n_pad), spec2(m_pad), spec2(m_pad), spec2(m_pad),
                  spec2(n_pad), spec2(m_pad), spec2(m_pad)],
        out_specs=(spec2(n_pad), spec2(m_pad), spec2(m_pad)),
        interpret=interpret,
    )(a0_p, a1_p, minv_p, d_p, e_p, me_p, q_p, l_p, u_p, rho_p,
      x_p, y_p, z_p)
    return x[:b, :n], y[:b, :mcon], z[:b, :mcon]
