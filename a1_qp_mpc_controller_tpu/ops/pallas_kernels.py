"""Pallas TPU kernels for the batched solver hot path (PRODUCTION
surface; retired negative-result variants live in ops/pallas_retired.py).

The production kernels:

- :func:`batched_inverse` / :func:`batched_inverse_small` — Gauss-Jordan
  inversion of a block of SPD KKT matrices in lock-step (every pivot
  step is a wide (S, n, n) VPU rank-1 update). The KKT matrix
  P + sigma I + A' diag(rho) A is SPD, so no pivoting is needed. The
  ``_small`` variant pads rows only to the 8-sublane granule for
  n <= 64 (the contact-pattern-reduced KKT family).
- :func:`fused_admm` / :func:`fused_admm_shared` — the WHOLE
  fixed-iteration ADMM loop as one kernel. The iteration-major XLA loop
  re-reads each scenario's (120,120) KKT inverse and (200,120)
  constraint matrix from HBM on every one of the ~50 iterations
  (50 x ~150 MB at batch 1024); this kernel is scenario-major — each
  grid step pins a block of scenarios' operands in VMEM and runs all
  iterations there, so HBM traffic drops by ~iters x. The ``_shared``
  variant never materializes per-scenario constraint matrices
  (A = A0 + mu A1, shared MXU GEMMs).
- :func:`batched_chol_linv` — batched panel L^-1 for the blocked
  Cholesky route (ops/linalg.spd_cholesky_inverse_hybrid).

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


# ---------------------------------------------------------------------
# Backward-compat re-exports: the retired negative-result kernels moved
# to ops/pallas_retired.py (round 5); existing imports keep working.
from a1_qp_mpc_controller_tpu.ops.pallas_retired import (  # noqa: E402,F401
    batched_inverse_T, batched_inverse_combined, batched_inverse_inplace,
    batched_inverse_rank, batched_inverse_rank_masked, batched_inverse_spd,
    batched_inverse_sweep_T, batched_inverse_sweep_T_chunked,
    batched_inverse_sweep_T_masked, batched_inverse_sweep_T_masked2,
    spd_block_inverse,
)
