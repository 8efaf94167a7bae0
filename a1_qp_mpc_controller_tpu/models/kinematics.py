"""A1 leg kinematics, derived from the leg geometry (not transcribed from the
reference's MATLAB-generated closed forms, legKinematics/A1Kinematics.cpp).

Chain (body frame, one leg): hip-roll joint q0 about +x at the hip mount
(offset ``ox, oy``), hip-pitch q1 about +y after the motor lateral offset
``d``, knee-pitch q2 about +y after the upper leg (length ``lu``), foot at the
end of the lower leg (length ``ll``) plus the calibration contact offset
``rho_opt = (cx, cy, cz)``:

    p(q) = [ox, oy, 0] + Rx(q0) ([0, d, 0] + Ry(q1) ([0, 0, -lu]
                                  + Ry(q2) [cx, cy, cz - ll]))

Parameter split matches the reference (A1Kinematics.h:16-19):
``rho_opt`` (3: contact offset, optimizable) and ``rho_fix`` (5: leg offset
x/y, motor offset, upper/lower leg length).

Jacobians and the calibration derivatives (d fk/d rho, dJ/dq, dJ/drho —
A1Kinematics.h:22-30) come from ``jax.jacfwd`` on the closed-form FK: on TPU
these trace into the same handful of fused sin/cos/multiply ops the MATLAB
codegen produces, with no hand-derivation to maintain.

All public functions take per-leg arguments and vmap over legs (and over a
scenario batch) cleanly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.utils import mathx


def fk(q: jnp.ndarray, rho_opt: jnp.ndarray, rho_fix: jnp.ndarray
       ) -> jnp.ndarray:
    """Forward kinematics: joint angles (3,) -> foot position (3,), body frame.

    Parity with A1Kinematics::fk (A1Kinematics.cpp:7-11).
    """
    ox, oy, d, lu, ll = (rho_fix[0], rho_fix[1], rho_fix[2], rho_fix[3],
                         rho_fix[4])
    cx, cy, cz = rho_opt[0], rho_opt[1], rho_opt[2]
    s0, c0 = jnp.sin(q[0]), jnp.cos(q[0])
    s1, c1 = jnp.sin(q[1]), jnp.cos(q[1])
    s12, c12 = jnp.sin(q[1] + q[2]), jnp.cos(q[1] + q[2])

    # foot point in the knee-pitch (calf) frame
    fx = cx * c12 + (cz - ll) * s12
    fy = cy
    fz = -cx * s12 + (cz - ll) * c12
    # add upper leg, still in the hip-pitch frame (y unchanged by Ry)
    hx = fx - lu * s1
    hy = fy + d
    hz = fz - lu * c1
    # hip-roll rotation about x, then hip mount offset
    px = ox + hx
    py = oy + c0 * hy - s0 * hz
    pz = s0 * hy + c0 * hz
    return jnp.stack([px, py, pz])


jac = jax.jacfwd(fk)            # (3,3) d fk / d q   (A1Kinematics::jac)
dfk_drho = jax.jacfwd(fk, 1)    # (3,3) d fk / d rho_opt (A1Kinematics::dfk_drho)


def dJ_dq(q, rho_opt, rho_fix):
    """(9,3) derivative of the flattened Jacobian w.r.t. q
    (A1Kinematics::dJ_dq)."""
    j = jax.jacfwd(lambda qq: jac(qq, rho_opt, rho_fix).reshape(-1))(q)
    return j


def dJ_drho(q, rho_opt, rho_fix):
    """(9,3) derivative of the flattened Jacobian w.r.t. rho_opt
    (A1Kinematics::dJ_drho)."""
    return jax.jacfwd(
        lambda rr: jac(q, rr, rho_fix).reshape(-1))(rho_opt)


# vmapped over the four legs: joint_pos (4,3), rho_* (4,k) -> (4,3) / (4,3,3)
fk_all_legs = jax.vmap(fk)
jac_all_legs = jax.vmap(jac)


def foot_fanout(joint_pos: jnp.ndarray, joint_vel: jnp.ndarray,
                rho_opt: jnp.ndarray, rho_fix: jnp.ndarray):
    """The per-pose FK fan-out the reference runs in its pose callback
    (GazeboA1ROS.cpp:264-281): foot positions (4,3), per-leg Jacobians
    (4,3,3), and foot velocities J q_dot (4,3), all body frame."""
    q = joint_pos.reshape(4, 3)
    qd = joint_vel.reshape(4, 3)
    pos = fk_all_legs(q, rho_opt, rho_fix)
    jacs = jac_all_legs(q, rho_opt, rho_fix)
    vel = jnp.einsum("lij,lj->li", jacs, qd)
    return pos, jacs, vel


@partial(jax.jit, static_argnames=("iters",))
def ik(p_target: jnp.ndarray, rho_opt: jnp.ndarray, rho_fix: jnp.ndarray,
       q0: jnp.ndarray | None = None, iters: int = 12) -> jnp.ndarray:
    """Damped-Newton inverse kinematics (3,) -> joint angles (3,).

    The reference has no IK (Gazebo supplies joint states); our in-framework
    plant needs it to synthesize joint sensors from simulated foot positions.
    """
    if q0 is None:
        q0 = jnp.array([0.0, 0.75, -1.5], p_target.dtype)

    def body(q, _):
        err = p_target - fk(q, rho_opt, rho_fix)
        J = jac(q, rho_opt, rho_fix)
        # Levenberg damping keeps the iteration stable near singularities
        JtJ = J.T @ J + 1e-6 * jnp.eye(3, dtype=q.dtype)
        dq = mathx.solve3(JtJ, J.T @ err)
        return q + dq, None

    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q


def ik_all_legs(p_targets: jnp.ndarray, rho_opt: jnp.ndarray,
                rho_fix: jnp.ndarray, q0: jnp.ndarray | None = None,
                iters: int = 12) -> jnp.ndarray:
    """Per-leg IK: (4,3) targets (+ optional (4,3) warm start) -> (4,3)
    joint angles."""
    if q0 is None:
        q0 = jnp.broadcast_to(jnp.array([0.0, 0.75, -1.5], p_targets.dtype),
                              p_targets.shape)
    return jax.vmap(ik, in_axes=(0, 0, 0, 0, None))(
        p_targets, rho_opt, rho_fix, q0, iters)
