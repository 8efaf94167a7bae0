"""Small-matrix batched linear algebra shaped for TPU.

XLA's batched ``jnp.linalg.{inv,solve}`` lower to LU with partial pivoting
— a long chain of tiny sequential kernels that measures ~60 ms for
1024x(120,120) and ~several ms even for 1024x(28,28) on v5e. For the SPD
matrices this framework solves against (ADMM KKT, EKF innovation,
stand-QP KKT), pivoting is unnecessary, and the inverse can be built from
batched GEMMs via recursive Schur-complement block inversion:

    M = [[A, B], [B', C]],  S = C - B' A^-1 B   (SPD when M is)
    M^-1 = [[A^-1 + W S^-1 W', -W S^-1], [-S^-1 W', S^-1]],  W = A^-1 B

The recursion bottoms out in an UNROLLED no-pivot Gauss-Jordan sweep
(``base`` pivots of rank-1 updates — fine for SPD). Everything is plain
jnp, so it vmaps, jits, differentiates, and runs identically on CPU/TPU —
this is the vmap-friendly sibling of the Pallas kernels in
ops/pallas_kernels.py (which need to run outside vmap).

Reference counterpart: Eigen dense solves — ``fullPivHouseholderQr`` in
the EKF (A1BasicEKF.cpp:134-138) and OSQP's internal QDLDL factorization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _gj_inverse_unrolled(m: jnp.ndarray) -> jnp.ndarray:
    """Unrolled no-pivot Gauss-Jordan inverse of the last-two-axes matrix
    (any leading batch dims). For SPD (or diagonally dominant) matrices
    only. O(n) unrolled rank-1 updates — use small n (<= ~16)."""
    n = m.shape[-1]
    inv = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), m.shape)
    for k in range(n):
        pivot = m[..., k:k + 1, k:k + 1]              # (..., 1, 1)
        inv_d = 1.0 / pivot
        row_m = m[..., k:k + 1, :] * inv_d            # (..., 1, n)
        row_i = inv[..., k:k + 1, :] * inv_d
        col = m[..., :, k:k + 1]                      # (..., n, 1)
        # elimination factors: pivot column with the pivot row zeroed
        keep = 1.0 - jax.nn.one_hot(k, n, dtype=m.dtype)[:, None]  # (n,1)
        factor = col * keep
        m = m - factor * row_m
        inv = inv - factor * row_i
        m = m.at[..., k, :].set(row_m[..., 0, :])
        inv = inv.at[..., k, :].set(row_i[..., 0, :])
    return inv


@partial(jax.jit, static_argnames=("base", "equilibrate"))
def spd_inverse(m: jnp.ndarray, base: int = 8,
                equilibrate: bool = True) -> jnp.ndarray:
    """Inverse of SPD matrices (..., n, n) via recursive Schur complement.

    All heavy work is batched GEMMs (MXU); only ``base``-sized unrolled
    Gauss-Jordan sweeps remain. Output is explicitly symmetrized. n need
    not be a power of two — odd sizes split unevenly.

    Schur-complement recursion amplifies rounding by ~kappa^2*eps in the
    worst case, so by default the matrix is Jacobi-equilibrated first
    (S' = D S D, D = diag(S)^-1/2): for matrices whose conditioning comes
    from heterogeneous scales — the EKF innovation with its 1e3 contact
    noise inflation — this removes almost all of the spread at the cost
    of two broadcasts.

    WARNING (measured): on matrices whose conditioning is STRUCTURAL
    (not diagonal-scale) — e.g. the Ruiz-scaled condensed-MPC KKT at
    kappa ~ 7e4 — the kappa^2 amplification is real: residual ~1e0/NaN
    in f32 where sequential GJ holds ~1e-3. Keep this for the EKF-class
    matrices it is tested on; use the sequential-GJ Pallas kernels
    (ops/pallas_kernels.batched_inverse_inplace) for KKT batches.
    """
    if equilibrate:
        d = jax.lax.rsqrt(jnp.maximum(
            jnp.diagonal(m, axis1=-2, axis2=-1), 1e-30))
        dd = d[..., :, None] * d[..., None, :]  # exactly symmetric
        out = spd_inverse(m * dd, base=base, equilibrate=False)
        return out * dd
    def inv(x):
        k = x.shape[-1]
        if k <= base:
            return _gj_inverse_unrolled(x)
        h = k // 2
        a = x[..., :h, :h]
        b = x[..., :h, h:]
        c = x[..., h:, h:]
        ai = inv(a)
        w = jnp.matmul(ai, b, precision=_HIGH)
        s = c - jnp.matmul(jnp.swapaxes(b, -1, -2), w, precision=_HIGH)
        si = inv(s)
        tr = -jnp.matmul(w, si, precision=_HIGH)
        tl = ai - jnp.matmul(tr, jnp.swapaxes(w, -1, -2), precision=_HIGH)
        top = jnp.concatenate([tl, tr], axis=-1)
        bot = jnp.concatenate([jnp.swapaxes(tr, -1, -2), si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    out = inv(m)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


@partial(jax.jit, static_argnames=("base",))
def spd_solve(m: jnp.ndarray, rhs: jnp.ndarray, base: int = 8
              ) -> jnp.ndarray:
    """Solve M X = RHS for SPD M (..., n, n), RHS (..., n, k) or (..., n).
    Explicit-inverse-then-GEMM: for the small-n batched regime this is
    faster on TPU than any triangular-solve chain, and backward-stable
    enough for f32 KF/ADMM use (SPD, moderately conditioned)."""
    minv = spd_inverse(m, base=base)
    if rhs.ndim == m.ndim - 1:
        return jnp.einsum("...ij,...j->...i", minv, rhs, precision=_HIGH)
    return jnp.matmul(minv, rhs, precision=_HIGH)


# ---------------------------------------------------------------------------
# Blocked Cholesky inverse (the numerically-sound MXU route for the ADMM
# KKT family). The Schur recursion above is fine for EKF-class matrices
# but FAILS on the ADMM KKT family even after swing elimination (measured
# resid 0.15-5.9 at kappa ~1.5-3e3: intermediate Schur complements are
# far worse conditioned than the matrix). Cholesky's triangular factors
# have bounded growth for ANY SPD matrix, so the blocked right-looking
# factorization + block triangular inverse is stable where blocked
# Gauss-Jordan / Schur recursion are not. All panel-level work is batched
# GEMMs through XLA (which lowers einsum bmm well on TPU — unlike
# Mosaic's in-kernel batched small-k dots, which run at ~0.6 TFLOP/s and
# killed the Pallas version of this algorithm in round 2).
# ---------------------------------------------------------------------------


def _chol_unblocked(a: jnp.ndarray, r: int) -> jnp.ndarray:
    """Batched dense Cholesky of (B, r, r) SPD -> lower L, via r
    sequential outer-product steps (fori_loop; masked, vectorized over
    the batch). jnp.linalg.cholesky is avoided: its TPU lowering is the
    same pathological tiny-kernel chain as batched LU."""
    i = jnp.arange(r)[None, :, None]
    j = jnp.arange(r)[None, None, :]

    def body(k, a):
        ck = jax.lax.dynamic_slice_in_dim(a, k, 1, axis=2)       # (B,r,1)
        akk = jnp.maximum(
            jax.lax.dynamic_slice_in_dim(ck, k, 1, axis=1), 1e-30)
        sq = jnp.sqrt(akk)                                       # (B,1,1)
        lcol = jnp.where(i > k, ck / sq, jnp.where(i == k, sq, ck))
        outer = (ck / akk) * jnp.swapaxes(ck, 1, 2)              # (B,r,r)
        a = a - jnp.where((i > k) & (j > k), outer, 0.0)
        return jax.lax.dynamic_update_slice_in_dim(a, lcol, k, axis=2)

    a = jax.lax.fori_loop(0, r, body, a)
    return jnp.where(i >= j, a, 0.0)


def _tri_lower_inv(lo: jnp.ndarray, r: int) -> jnp.ndarray:
    """Batched inverse of lower-triangular (B, r, r) by forward
    substitution over rows."""
    j = jnp.arange(r)[None, None, :]
    x = jnp.zeros_like(lo)

    def body(k, x):
        lrow = jax.lax.dynamic_slice_in_dim(lo, k, 1, axis=1)    # (B,1,r)
        lkk = jax.lax.dynamic_slice_in_dim(lrow, k, 1, axis=2)   # (B,1,1)
        s = jnp.einsum("bir,brj->bij", lrow, x, precision=_HIGH)
        xrow = (jnp.where(j == k, 1.0, 0.0) - s) / lkk
        return jax.lax.dynamic_update_slice_in_dim(x, xrow, k, axis=1)

    return jax.lax.fori_loop(0, r, body, x)


@partial(jax.jit, static_argnames=("panel",))
def spd_cholesky_inverse(k_mat: jnp.ndarray, panel: int = 30
                         ) -> jnp.ndarray:
    """Inverse of SPD matrices (B, n, n) via blocked Cholesky:

    1. right-looking blocked factorization K = L L' (panel Cholesky +
       triangular panel inverse as sequential masked steps; trailing
       updates as batched GEMMs),
    2. block lower-triangular inversion M = L^-1 (batched GEMMs),
    3. X = M' M (one batched GEMM).

    ~n^3 * 5/3 MACs per matrix, all in einsum bmm form. When n is not a
    multiple of ``panel`` the matrix is padded up with an identity tail
    (block-diagonal zero coupling => the padded inverse's top-left block
    is exact), so any horizon works with the default panel."""
    b, n, _ = k_mat.shape
    if n % panel != 0:
        n_pad = ((n + panel - 1) // panel) * panel
        mm = jnp.zeros((b, n_pad, n_pad), k_mat.dtype)
        mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
        mm = mm.at[:, :n, :n].set(k_mat)
        return spd_cholesky_inverse(mm, panel)[:, :n, :n]
    np_ = n // panel

    a = k_mat
    lfull = jnp.zeros_like(k_mat)
    linv_diag = []
    for pi in range(np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        a11 = a[:, p0:p1, p0:p1]
        l11 = _chol_unblocked(a11, panel)
        l11inv = _tri_lower_inv(l11, panel)
        linv_diag.append(l11inv)
        lfull = lfull.at[:, p0:p1, p0:p1].set(l11)
        if p1 < n:
            a21 = a[:, p1:, p0:p1]                   # (B, n-p1, panel)
            # L21 = A21 L11^-T
            l21 = jnp.einsum("bij,bkj->bik", a21, l11inv,
                             precision=_HIGH)
            lfull = lfull.at[:, p1:, p0:p1].set(l21)
            a = a.at[:, p1:, p1:].add(
                -jnp.einsum("bik,bjk->bij", l21, l21, precision=_HIGH))

    # block lower-triangular inverse: M_ii = L_ii^-1;
    # M_ij = -L_ii^-1 (sum_{j<=k<i} L_ik M_kj)   for i > j
    mfull = jnp.zeros_like(k_mat)
    for pi in range(np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        mfull = mfull.at[:, p0:p1, p0:p1].set(linv_diag[pi])
    for pi in range(1, np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        for pj in range(pi):
            q0, q1 = pj * panel, (pj + 1) * panel
            acc = jnp.zeros((b, panel, panel), k_mat.dtype)
            for pk in range(pj, pi):
                r0, r1 = pk * panel, (pk + 1) * panel
                acc = acc + jnp.einsum(
                    "bik,bkj->bij", lfull[:, p0:p1, r0:r1],
                    mfull[:, r0:r1, q0:q1], precision=_HIGH)
            mij = -jnp.einsum("bik,bkj->bij", linv_diag[pi], acc,
                              precision=_HIGH)
            mfull = mfull.at[:, p0:p1, q0:q1].set(mij)

    # X = L^-T L^-1 = M' M
    return jnp.einsum("bki,bkj->bij", mfull, mfull, precision=_HIGH)


@partial(jax.jit, static_argnames=("panel", "interpret"))
def spd_cholesky_inverse_hybrid(k_mat: jnp.ndarray, panel: int = 30,
                                interpret: bool = False) -> jnp.ndarray:
    """:func:`spd_cholesky_inverse` with the sequential panel work
    (Cholesky + triangular inverse) in the batch-leading Pallas kernel
    (ops/pallas_kernels.batched_chol_linv) and everything else — trailing
    updates, block triangular inverse, final M'M — as XLA batched GEMMs.
    The pure-XLA version measured 14.4 ms at 1024x(120,120) on v5e
    (sequential dynamic-slice steps dominate); this moves those ~240
    steps into two fori loops inside one kernel per panel."""
    from a1_qp_mpc_controller_tpu.ops.pallas_kernels import (
        batched_chol_linv,
    )

    b, n, _ = k_mat.shape
    if n % panel != 0:
        n_pad = ((n + panel - 1) // panel) * panel
        mm = jnp.zeros((b, n_pad, n_pad), k_mat.dtype)
        mm = mm.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
        mm = mm.at[:, :n, :n].set(k_mat)
        return spd_cholesky_inverse_hybrid(mm, panel,
                                           interpret)[:, :n, :n]
    np_ = n // panel

    a = k_mat
    lfull = jnp.zeros_like(k_mat)
    linv_diag = []
    for pi in range(np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        l11inv = batched_chol_linv(a[:, p0:p1, p0:p1],
                                   interpret=interpret)
        linv_diag.append(l11inv)
        if p1 < n:
            a21 = a[:, p1:, p0:p1]
            l21 = jnp.einsum("bij,bkj->bik", a21, l11inv,
                             precision=_HIGH)
            lfull = lfull.at[:, p1:, p0:p1].set(l21)
            a = a.at[:, p1:, p1:].add(
                -jnp.einsum("bik,bjk->bij", l21, l21, precision=_HIGH))

    mfull = jnp.zeros_like(k_mat)
    for pi in range(np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        mfull = mfull.at[:, p0:p1, p0:p1].set(linv_diag[pi])
    for pi in range(1, np_):
        p0, p1 = pi * panel, (pi + 1) * panel
        for pj in range(pi):
            q0, q1 = pj * panel, (pj + 1) * panel
            acc = jnp.zeros((b, panel, panel), k_mat.dtype)
            for pk in range(pj, pi):
                r0, r1 = pk * panel, (pk + 1) * panel
                acc = acc + jnp.einsum(
                    "bik,bkj->bij", lfull[:, p0:p1, r0:r1],
                    mfull[:, r0:r1, q0:q1], precision=_HIGH)
            mij = -jnp.einsum("bik,bkj->bij", linv_diag[pi], acc,
                              precision=_HIGH)
            mfull = mfull.at[:, p0:p1, q0:q1].set(mij)

    return jnp.einsum("bki,bkj->bij", mfull, mfull, precision=_HIGH)
