"""Small math utilities (reference: utils/Utils.{h,cpp}).

All functions are pure jnp, shape-static, and written to vmap cleanly over a
leading batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_euler(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) -> (roll, pitch, yaw), yaw in (-pi, pi].

    Same convention as the reference (Utils.cpp:7-33), which deliberately
    avoids Eigen's ``eulerAngles`` 0..pi yaw range (test_rotation.cpp).
    """
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    y_sqr = y * y
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y_sqr)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y_sqr + z * z)
    yaw = jnp.arctan2(t3, t4)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rot(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) -> 3x3 rotation matrix (body -> world)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack([
        jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], -1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], -1),
    ], axis=-2)
    return r


def euler_to_quat(euler: jnp.ndarray) -> jnp.ndarray:
    """(roll, pitch, yaw) -> quaternion (w,x,y,z), R = Rz(yaw)Ry(pitch)Rx(roll)."""
    hr, hp, hy = euler[..., 0] / 2, euler[..., 1] / 2, euler[..., 2] / 2
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def rot_z(yaw: jnp.ndarray) -> jnp.ndarray:
    """Yaw-only rotation matrix (reference: AngleAxisd(yaw, UnitZ),
    GazeboA1ROS.cpp:262)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix (Utils.cpp:35-41); batches over
    leading axes."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], axis=-2)


def pseudo_inverse_3x3(m: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Regularized closed-form inverse of a 3x3 SPD matrix.

    Stands in for the reference's SVD pseudo-inverse (Utils.cpp:44-52),
    which it only ever applies to the SPD normal matrix W'W of the terrain
    plane fit (A1RobotControl.cpp:578). A Tikhonov ridge handles the
    rank-deficient case (collinear contact points) that the SVD cutoff
    handled; adjugate/determinant is closed-form VPU work, whereas SVD on
    TPU lowers to an expensive iterative kernel."""
    m = m + eps * jnp.trace(m)[..., None, None] * jnp.eye(3, dtype=m.dtype)
    # adjugate
    a = m
    cof = jnp.stack([
        jnp.stack([a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1],
                   a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                   a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]],
                  -1),
        jnp.stack([a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2],
                   a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                   a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]],
                  -1),
        jnp.stack([a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0],
                   a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                   a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]],
                  -1),
    ], axis=-2)
    det = (a[..., 0, 0] * cof[..., 0, 0] + a[..., 0, 1] * cof[..., 1, 0]
           + a[..., 0, 2] * cof[..., 2, 0])
    return cof / det[..., None, None]


def inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of GENERAL 3x3 matrices, batched
    over any leading axes.

    TPU-first replacement for ``jnp.linalg.inv`` on tiny systems: XLA's
    batched LU lowering is a pathological chain of tiny kernels on TPU
    (several ms even at (B,28,28), CLAUDE.md), while the adjugate is a
    handful of fused VPU multiplies. No pivoting — same failure mode at
    exact singularity as unpivoted LU; callers regularize where the
    matrix can degenerate (e.g. Levenberg damping in IK)."""
    a00, a01, a02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a10, a11, a12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    a20, a21, a22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def inv3_spd(m: jnp.ndarray) -> jnp.ndarray:
    """:func:`inv3` specialized to SYMMETRIC 3x3 blocks (reads only the
    upper triangle; ~half the cofactor work). Batched over leading
    axes."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / det
    row0 = jnp.stack([co00, co01, co02], axis=-1)
    row1 = jnp.stack([co01, co11, co12], axis=-1)
    row2 = jnp.stack([co02, co12, co22], axis=-1)
    return jnp.stack([row0, row1, row2],
                     axis=-2) * inv_det[..., None, None]


def solve3(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``jnp.linalg.solve`` for 3x3 systems via :func:`inv3`:
    (..., 3, 3) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", inv3(m), b)


def cal_dihedral_angle(n1: jnp.ndarray, n2: jnp.ndarray) -> jnp.ndarray:
    """Unsigned angle between two plane normals (Utils.cpp:54-62)."""
    cos_a = jnp.abs(jnp.sum(n1 * n2, axis=-1)) / (
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1))
    return jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))


def wrap_yaw_error(err: jnp.ndarray, desired: jnp.ndarray,
                   actual: jnp.ndarray) -> jnp.ndarray:
    """Reference's yaw-wrap guard (A1RobotControl.cpp:328-332): if the raw yaw
    error exceeds 1.5*pi, re-reference desired yaw by +-2*pi."""
    pi = 3.1415926
    err = jnp.where(err > pi * 1.5, desired - 2 * pi - actual, err)
    err = jnp.where(err < -pi * 1.5, desired + 2 * pi - actual, err)
    return err
