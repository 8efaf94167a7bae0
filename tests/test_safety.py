import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.control import safety


def test_wire_reorder_is_involution(rng):
    x = jnp.asarray(rng.standard_normal(12), jnp.float32)
    y = safety.reorder_for_wire(safety.reorder_for_wire(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    # front pairs swapped: leg 0 <-> leg 1
    y1 = safety.reorder_for_wire(x)
    np.testing.assert_allclose(np.asarray(y1[0:3]), np.asarray(x[3:6]))


def test_torque_limit():
    tau = jnp.array([50.0, -50.0, 10.0] * 4)
    out = np.asarray(safety.torque_limit(tau))
    assert out.max() == 33.5 and out.min() == -33.5
    assert out[2] == 10.0


def test_position_limit_ramps_to_zero():
    q = jnp.zeros(12).at[1].set(4.19)  # thigh at max
    tau = jnp.ones(12) * 5.0
    out = np.asarray(safety.position_limit(tau, q))
    assert out[1] == 0.0          # pushing further: zeroed
    assert out[0] == 5.0          # others untouched
    # pulling back is allowed
    out2 = np.asarray(safety.position_limit(-tau, q))
    assert out2[1] == -5.0


def test_power_protect_scales():
    """NOTE: this asserts OUR safety ANALOG's semantics — a whole-body
    ~100 W/level budget with uniform torque scaling — not the Unitree
    SDK's (proprietary, per-motor) PowerProtect behavior, which the
    reference calls as a black box (HardwareA1ROS.cpp:194-196). The
    analog is deliberately conservative: it can only reduce torque
    magnitudes."""
    tau = jnp.full(12, 20.0)
    vel = jnp.full(12, 10.0)   # 2.4 kW
    out = np.asarray(safety.power_protect(tau, vel, power_level=5))
    power = np.abs(out * np.asarray(vel)).sum()
    assert power <= 500.0 + 1.0
    # low power untouched
    out2 = np.asarray(safety.power_protect(tau, jnp.full(12, 0.1), 5))
    np.testing.assert_allclose(out2, 20.0)
