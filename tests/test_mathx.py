import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from a1_qp_mpc_controller_tpu.utils import mathx
from a1_qp_mpc_controller_tpu.utils.bezier import bezier_curve, swing_foot_pos
from a1_qp_mpc_controller_tpu.utils.filters import make_filter, filter_update


def random_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def test_quat_to_rot_matches_scipy(rng):
    for _ in range(20):
        q = random_quat(rng)
        r = mathx.quat_to_rot(jnp.asarray(q, jnp.float32))
        # scipy uses x,y,z,w ordering
        r_ref = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-5)


def test_quat_to_euler_roundtrip(rng):
    # euler -> quat -> euler identity within gimbal-safe range
    for _ in range(50):
        eul = rng.uniform([-3.0, -1.4, -3.0], [3.0, 1.4, 3.0])
        q = mathx.euler_to_quat(jnp.asarray(eul, jnp.float32))
        eul2 = mathx.quat_to_euler(q)
        np.testing.assert_allclose(np.asarray(eul2), eul, atol=1e-4)


def test_quat_to_euler_vs_scipy_zyx(rng):
    for _ in range(20):
        q = random_quat(rng)
        eul = mathx.quat_to_euler(jnp.asarray(q, jnp.float32))
        ref = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_euler("ZYX")
        np.testing.assert_allclose(np.asarray(eul), ref[::-1], atol=1e-4)


def test_rotation_consistency(rng):
    # R(quat) == Rz(yaw) Ry(pitch) Rx(roll) for the recovered euler angles
    for _ in range(20):
        q = random_quat(rng)
        r = np.asarray(mathx.quat_to_rot(jnp.asarray(q, jnp.float32)))
        eul = np.asarray(mathx.quat_to_euler(jnp.asarray(q, jnp.float32)))
        r_ref = Rotation.from_euler("ZYX", eul[::-1]).as_matrix()
        np.testing.assert_allclose(r, r_ref, atol=1e-4)


def test_skew(rng):
    v = rng.standard_normal(3)
    w = rng.standard_normal(3)
    s = np.asarray(mathx.skew(jnp.asarray(v, jnp.float32)))
    np.testing.assert_allclose(s @ w, np.cross(v, w), atol=1e-5)
    # batch
    vb = rng.standard_normal((4, 3)).astype(np.float32)
    sb = np.asarray(mathx.skew(jnp.asarray(vb)))
    assert sb.shape == (4, 3, 3)
    np.testing.assert_allclose(sb[2] @ w, np.cross(vb[2], w), atol=1e-4)


def test_rot_z():
    r = np.asarray(mathx.rot_z(jnp.float32(0.3)))
    ref = Rotation.from_euler("z", 0.3).as_matrix()
    np.testing.assert_allclose(r, ref, atol=1e-6)


def test_dihedral_angle():
    a = jnp.array([0.0, 0, 1])
    b = jnp.array([0.0, 1, 1])
    ang = mathx.cal_dihedral_angle(a, b)
    np.testing.assert_allclose(float(ang), np.pi / 4, atol=1e-5)
    # sign-insensitive (abs of dot)
    ang2 = mathx.cal_dihedral_angle(a, -b)
    np.testing.assert_allclose(float(ang2), np.pi / 4, atol=1e-5)


def test_wrap_yaw_error():
    d, a = jnp.float32(3.0), jnp.float32(-3.0)
    err = mathx.wrap_yaw_error(d - a, d, a)
    np.testing.assert_allclose(float(err), 3.0 - 2 * 3.1415926 + 3.0,
                               atol=1e-5)


def test_bezier_endpoints_and_midpoint():
    pts = jnp.array([1.0, 1.0, 5.0, 5.0, 5.0])
    assert abs(float(bezier_curve(jnp.float32(0.0), pts)) - 1.0) < 1e-6
    assert abs(float(bezier_curve(jnp.float32(1.0), pts)) - 5.0) < 1e-6
    # Bernstein partition of unity: constant control points reproduce const
    const = jnp.full((5,), 2.5)
    assert abs(float(bezier_curve(jnp.float32(0.37), const)) - 2.5) < 1e-5


def test_swing_foot_curve_lifts_z():
    start = jnp.array([0.0, 0.0, -0.35])
    final = jnp.array([0.1, 0.0, -0.35])
    mid = swing_foot_pos(jnp.float32(0.5), start, final)
    # z apex should clearly exceed endpoints (clearance 0.4 at P2)
    assert float(mid[2]) > -0.35 + 0.05
    at0 = swing_foot_pos(jnp.float32(0.0), start, final)
    at1 = swing_foot_pos(jnp.float32(1.0), start, final)
    np.testing.assert_allclose(np.asarray(at0), np.asarray(start), atol=1e-5)
    np.testing.assert_allclose(np.asarray(at1), np.asarray(final), atol=1e-5)


def test_window_filter_matches_numpy(rng):
    f = make_filter((), 5)
    xs = rng.standard_normal(20).astype(np.float32)
    for i, x in enumerate(xs):
        f, avg = filter_update(f, jnp.float32(x))
        lo = max(0, i - 4)
        np.testing.assert_allclose(float(avg), xs[lo:i + 1].mean(),
                                   rtol=1e-5, atol=1e-6)


def test_window_filter_channels(rng):
    f = make_filter((4, 3), 60)
    xs = rng.standard_normal((100, 4, 3)).astype(np.float32)
    for i in range(100):
        f, avg = filter_update(f, jnp.asarray(xs[i]))
    np.testing.assert_allclose(np.asarray(avg), xs[40:].mean(0),
                               rtol=1e-4, atol=1e-5)
