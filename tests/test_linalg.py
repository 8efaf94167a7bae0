"""ops/linalg: batched SPD inverse/solve vs numpy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a1_qp_mpc_controller_tpu.ops import linalg


def _spd(rng, b, n, cond=100.0):
    q, _ = np.linalg.qr(rng.normal(size=(b, n, n)))
    ev = np.exp(rng.uniform(0, np.log(cond), size=(b, n)))
    return (q * ev[:, None, :]) @ np.swapaxes(q, 1, 2)


@pytest.mark.parametrize("n", [4, 7, 12, 18, 28, 64])
def test_spd_inverse_matches_numpy(rng, n):
    m = _spd(rng, 16, n).astype(np.float32)
    got = np.asarray(linalg.spd_inverse(jnp.asarray(m)))
    want = np.linalg.inv(m.astype(np.float64))
    resid = np.max(np.abs(
        np.eye(n) - got @ m.astype(np.float64)))
    assert resid < 5e-3, resid
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-4)


def test_spd_inverse_symmetric_output(rng):
    m = _spd(rng, 8, 28).astype(np.float32)
    got = np.asarray(linalg.spd_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(got, np.swapaxes(got, 1, 2), atol=0)


@pytest.mark.parametrize("rhs_shape", ["matrix", "vector"])
def test_spd_solve(rng, rhs_shape):
    n, b = 28, 8
    m = _spd(rng, b, n).astype(np.float32)
    if rhs_shape == "matrix":
        rhs = rng.normal(size=(b, n, 5)).astype(np.float32)
    else:
        rhs = rng.normal(size=(b, n)).astype(np.float32)
    got = np.asarray(linalg.spd_solve(jnp.asarray(m), jnp.asarray(rhs)))
    rhs64 = rhs.astype(np.float64)
    if rhs_shape == "vector":
        want = np.linalg.solve(m.astype(np.float64), rhs64[..., None])[
            ..., 0]
    else:
        want = np.linalg.solve(m.astype(np.float64), rhs64)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-4)


def test_spd_inverse_under_vmap_and_jit(rng):
    m = jnp.asarray(_spd(rng, 4, 18).astype(np.float32))
    direct = linalg.spd_inverse(m)
    vmapped = jax.jit(jax.vmap(lambda x: linalg.spd_inverse(x)))(m)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(vmapped),
                               rtol=1e-5, atol=1e-6)


def test_spd_inverse_unbatched(rng):
    m = jnp.asarray(_spd(rng, 1, 12)[0].astype(np.float32))
    got = np.asarray(linalg.spd_inverse(m))
    want = np.linalg.inv(np.asarray(m, np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)


def test_ekf_innovation_conditioning(rng):
    """The EKF's S conditioning is dominated by heterogeneous DIAGONAL
    scales (1e3 contact noise inflation, 1e5 no-flat-ground rows on a
    1e-3 base) — exactly what Jacobi equilibration removes. Build an
    EKF-shaped matrix: moderate-kappa core under a wild diagonal."""
    n, b = 28, 32
    core = _spd(rng, b, n, cond=300.0)
    scale = np.exp(rng.uniform(np.log(1e-3), np.log(1e5), size=(b, n)))
    d = np.sqrt(scale)
    m = (core * d[:, None, :] * d[:, :, None]).astype(np.float32)
    got = np.asarray(linalg.spd_inverse(jnp.asarray(m)))
    # scaled residual: D^-1 (I - X M) D is the equilibrated-space error
    resid = np.eye(n) - got @ m.astype(np.float64)
    resid = np.max(np.abs(resid / d[:, None, :] * d[:, :, None]))
    assert resid < 5e-3, resid


def test_spd_cholesky_inverse_stable_on_kkt_family():
    """Blocked-Cholesky inverse (pure XLA + the hybrid with the Pallas
    panel kernel): stable at ~1e-4 residual on the swing-eliminated MPC
    KKT family where Schur recursion diverges (resid 0.15-5.9 measured —
    intermediate Schur complements are far worse conditioned than the
    matrix)."""
    import jax

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import grf
    from a1_qp_mpc_controller_tpu.models import srb
    from a1_qp_mpc_controller_tpu.ops import qp as qpx
    from a1_qp_mpc_controller_tpu.ops.linalg import (
        spd_cholesky_inverse, spd_cholesky_inverse_hybrid,
    )

    cfg, params = load_profile("gazebo_mpc")
    settings = qpx.QPSettings(rho=grf._MPC_RHO0, adaptive_rho=False)
    p0, q0, a0m, lb, ub = srb.reference_mpc_problem(params)
    c = jnp.array([True, False, False, True])
    p2, q2, l2, u2 = srb.eliminate_swing(p0, q0, lb, ub, c, cfg.horizon)
    scal = qpx.compute_scaling(p2, q2, a0m, l2, u2)
    jitter = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                           (6, 1, 1))
    m_b = jax.vmap(lambda p: qpx.scaled_kkt_matrix(
        p, q2, a0m, l2, u2, settings, jnp.float32(grf._MPC_RHO0), scal)
    )(p2[None] * jitter)
    m64 = np.asarray(m_b, np.float64)
    eye = np.eye(m_b.shape[1])
    for f in (lambda m: spd_cholesky_inverse(m, panel=30),
              lambda m: spd_cholesky_inverse_hybrid(m, panel=30,
                                                    interpret=True)):
        x = np.asarray(f(m_b))
        r = np.abs(eye - np.einsum("bij,bjk->bik", x, m64)).max()
        assert r < 5e-4, r

def test_spd_cholesky_inverse_nonmultiple_n(rng):
    """n not a multiple of the panel (e.g. horizon 8 -> n=96 with the
    default panel=30) pads with an identity tail instead of asserting
    (round-3 advisor finding)."""
    for n in (96, 50):
        m = jnp.asarray(_spd(rng, 3, n), jnp.float32)
        x = np.asarray(linalg.spd_cholesky_inverse(m, panel=30))
        ref = np.linalg.inv(np.asarray(m, np.float64))
        assert np.abs(x - ref).max() < 5e-4 * np.abs(ref).max()
