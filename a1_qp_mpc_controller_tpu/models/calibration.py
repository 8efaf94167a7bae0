"""Kinematic calibration: estimate the per-leg contact offsets rho_opt
from observed data — the use-case the reference generates its
``dfk_drho`` / ``dJ_drho`` matrices for (A1Kinematics.h:16-19 splits the
parameters into rho_opt "to be optimized" and rho_fix; the companion
paper of the reference, Yang et al., calibrates rho_opt online from leg
odometry).

Two estimators, both pure jnp (jit/vmap-able, run on TPU):

- :func:`calibrate_foot_positions` — batched Gauss-Newton on FK
  residuals against observed foot positions (e.g. from motion capture or
  a known calibration rig). Uses the analytic ``dfk_drho`` Jacobian.
- :func:`calibrate_leg_odometry` — the self-supervised variant: during
  stance, the world-frame foot velocity is zero, so the body-frame
  relation v_body + omega x p_foot + J q_dot + (dfk/drho) rho_dot = 0
  constrains rho_opt from proprioception alone. Solves the stacked
  least-squares over a window of samples (rho_dot = 0, rho constant).

The reference carries these derivative matrices in A1Kinematics but the
open-source release never wires an optimizer to them; this module
completes the capability with autodiff-exact Jacobians instead of MATLAB
codegen.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.models import kinematics as kin

_HIGH = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("iters",))
def calibrate_foot_positions(q_samples: jnp.ndarray,
                             p_observed: jnp.ndarray,
                             rho_fix: jnp.ndarray,
                             rho0: jnp.ndarray | None = None,
                             iters: int = 10,
                             damping: float = 1e-6
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-leg Gauss-Newton: find rho_opt (3,) minimizing
    ||fk(q_t, rho) - p_obs_t||^2 over T samples.

    Args: q_samples (T, 3) joint angles, p_observed (T, 3) measured foot
    positions (hip frame), rho_fix (5,). Returns (rho_opt (3,),
    final rms residual ())."""
    t = q_samples.shape[0]
    rho = jnp.zeros(3, q_samples.dtype) if rho0 is None else rho0

    def gn_step(_, rho):
        resid = jax.vmap(lambda q, p: kin.fk(q, rho, rho_fix) - p)(
            q_samples, p_observed)                       # (T,3)
        jac = jax.vmap(lambda q: kin.dfk_drho(q, rho, rho_fix))(
            q_samples)                                   # (T,3,3)
        jtj = jnp.einsum("tij,tik->jk", jac, jac, precision=_HIGH)
        jtr = jnp.einsum("tij,ti->j", jac, resid, precision=_HIGH)
        step = jnp.linalg.solve(
            jtj + damping * jnp.eye(3, dtype=rho.dtype), jtr)
        return rho - step

    rho = jax.lax.fori_loop(0, iters, gn_step, rho)
    resid = jax.vmap(lambda q, p: kin.fk(q, rho, rho_fix) - p)(
        q_samples, p_observed)
    return rho, jnp.sqrt(jnp.mean(resid ** 2))


@jax.jit
def calibrate_leg_odometry(q_samples: jnp.ndarray,
                           qd_samples: jnp.ndarray,
                           body_vel_rel: jnp.ndarray,
                           rho_fix: jnp.ndarray,
                           damping: float = 1e-8) -> jnp.ndarray:
    """Self-supervised rho_opt from stance-phase proprioception.

    During stance the foot is stationary, so the body-frame foot
    velocity must cancel the body's motion:

        J(q, rho) q_dot = -(v_body + omega x p_foot)  =: b_t

    J depends on rho; linearizing around rho = 0 with the analytic
    dJ/drho gives a least-squares problem LINEAR in rho:

        [J0 q_dot]_t + [ (dJ/drho . rho) q_dot ]_t = b_t
        => A_t rho = b_t - J0_t q_dot,   A_t[i,k] = dJ_drho[i*3+j, k] qd[j]

    Args: q_samples (T,3), qd_samples (T,3), body_vel_rel (T,3) the
    right-hand side b_t (measured relative foot velocity the kinematics
    must explain). Returns rho_opt (3,)."""
    def row(q, qd):
        j0 = kin.jac(q, jnp.zeros(3, q.dtype), rho_fix)       # (3,3)
        djdr = kin.dJ_drho(q, jnp.zeros(3, q.dtype), rho_fix)  # (9,3)
        # dJ/drho is (9,3) with row-major (i,j) flattening of J[i,j]:
        # (d J[i,j] / d rho_k) qd[j] summed over j -> A[i,k]
        a = jnp.einsum("ijk,j->ik", djdr.reshape(3, 3, 3), qd,
                       precision=_HIGH)
        return a, j0 @ qd

    a_t, jqd_t = jax.vmap(row)(q_samples, qd_samples)        # (T,3,3),(T,3)
    resid = body_vel_rel - jqd_t                             # (T,3)
    ata = jnp.einsum("tik,til->kl", a_t, a_t, precision=_HIGH)
    atb = jnp.einsum("tik,ti->k", a_t, resid, precision=_HIGH)
    return jnp.linalg.solve(ata + damping * jnp.eye(3, dtype=ata.dtype),
                            atb)
