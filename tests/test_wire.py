"""UDP wire-loop tests: packing, the zero-torque handshake, and a
closed-loop stand over the loopback mock robot (HardwareA1ROS.cpp:230-260
parity for the transport layer)."""

import dataclasses

import pytest

import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.adapters import hardware as hw
from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.runtime import wire
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import JoyCmd


def test_wire_roundtrip_state():
    rng = np.random.default_rng(0)
    quat = rng.normal(size=4).astype(np.float32)
    gyro = rng.normal(size=3).astype(np.float32)
    acc = rng.normal(size=3).astype(np.float32)
    q = rng.normal(size=12).astype(np.float32)
    dq = rng.normal(size=12).astype(np.float32)
    ff = rng.normal(size=4).astype(np.float32)
    buf = wire.pack_low_state(7, quat, gyro, acc, q, dq, ff)
    seq, ls = wire.unpack_low_state(buf)
    assert seq == 7
    np.testing.assert_array_equal(np.asarray(ls.imu_quat), quat)
    np.testing.assert_array_equal(np.asarray(ls.motor_q), q)
    np.testing.assert_array_equal(np.asarray(ls.foot_force), ff)


def test_wire_roundtrip_cmd():
    tau = jnp.arange(12, dtype=jnp.float32)
    cmd = hw.egress(tau, jnp.zeros(12), jnp.zeros(12))
    buf = wire.pack_low_cmd(3, cmd)
    seq, tau_wire = wire.unpack_low_cmd(buf)
    assert seq == 3
    np.testing.assert_array_equal(tau_wire, np.asarray(cmd.tau))
    # wire -> controller order recovers the safety-filtered torques
    np.testing.assert_array_equal(
        tau_wire[np.asarray(hw.SWAP_JOINT_INDICES)],
        np.asarray(hw.egress(tau, jnp.zeros(12), jnp.zeros(12)).tau)[
            np.asarray(hw.SWAP_JOINT_INDICES)])


def test_handshake_and_closed_loop_stand():
    """Full loopback loop: the zero-torque udp_init_send handshake is
    observed by the robot endpoint BEFORE any control torque, then one
    second of 500 Hz wire frames / 400 Hz control keeps the mock robot
    standing."""
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50,
                              mpc_solver_mode="fixed")
    terr = terrain_mod.Terrain.flat()
    mock = wire.MockA1Robot(params, terr)
    runner = wire.HardwareWireRunner(cfg, params, mock.addr)
    try:
        # handshake: robot must see exactly the zero-torque burst first
        import threading
        n_hs = 10
        t = threading.Thread(target=lambda: [mock.serve_once()
                                             for _ in range(n_hs)])
        t.start()
        got = runner.handshake(n_hs)
        t.join()
        assert got == n_hs
        assert mock.zero_torque_cmds == n_hs
        assert not mock.nonzero_seen

        rep = runner.run(1.0, JoyCmd.zeros(), mock)
        assert rep["frames"] == 500
        assert rep["ctrl_steps"] == 400
        assert not rep["nan"]
        assert 0.2 < rep["final_root"][2] < 0.4
    finally:
        runner.close()
        mock.close()


def test_sdk_wire_struct_sizes_and_roundtrip():
    """Unitree SDK v3.2 packed-struct layout (runtime/sdk_wire.py):
    documented struct sizes pinned, LowState/LowCmd pack->unpack
    round-trips exactly, CRC validates and detects tampering."""
    from a1_qp_mpc_controller_tpu.runtime import sdk_wire as sw

    assert sw._IMU.size == 56
    assert sw._MOTOR_STATE.size == 44
    assert sw._MOTOR_CMD.size == 36
    assert sw.LOW_STATE_SIZE == 1020
    assert sw.LOW_CMD_SIZE == 796

    rng = np.random.default_rng(5)
    quat = rng.standard_normal(4).astype(np.float32)
    quat /= np.linalg.norm(quat)
    gyro = rng.standard_normal(3).astype(np.float32)
    acc = rng.standard_normal(3).astype(np.float32)
    q = rng.standard_normal(12).astype(np.float32)
    dq = rng.standard_normal(12).astype(np.float32)
    ff = np.array([12.0, 60.0, -3.0, 255.0], np.float32)
    buf = sw.pack_low_state_sdk(77, quat, gyro, acc, q, dq, ff)
    assert len(buf) == sw.LOW_STATE_SIZE
    tick, ls = sw.unpack_low_state_sdk(buf)
    assert tick == 77
    np.testing.assert_array_equal(np.asarray(ls.imu_quat), quat)
    np.testing.assert_array_equal(np.asarray(ls.motor_q), q)
    np.testing.assert_array_equal(np.asarray(ls.motor_dq), dq)
    np.testing.assert_array_equal(np.asarray(ls.foot_force),
                                  np.round(ff))  # int16 counts
    # CRC tamper detection
    bad = bytearray(buf)
    bad[100] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        sw.unpack_low_state_sdk(bytes(bad))

    tau = rng.standard_normal(12).astype(np.float32)
    cmd = hw.egress(jnp.asarray(tau), jnp.zeros(12), jnp.zeros(12))
    cbuf = sw.pack_low_cmd_sdk(9, cmd)
    assert len(cbuf) == sw.LOW_CMD_SIZE
    tick, tau_out = sw.unpack_low_cmd_sdk(cbuf)
    assert tick == 9
    np.testing.assert_array_equal(tau_out, np.asarray(cmd.tau))
    bad = bytearray(cbuf)
    bad[20] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        sw.unpack_low_cmd_sdk(bytes(bad))


def test_sdk_wire_closed_loop_stand():
    """The SDK byte-layout wire option drives the same loopback loop as
    the native format: handshake + 0.5 s of 500 Hz frames / 400 Hz
    control keeps the mock robot standing (wire_format='sdk' end to
    end)."""
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50,
                              mpc_solver_mode="fixed")
    terr = terrain_mod.Terrain.flat()
    mock = wire.MockA1Robot(params, terr, wire_format="sdk")
    runner = wire.HardwareWireRunner(cfg, params, mock.addr,
                                     wire_format="sdk")
    try:
        import threading
        t = threading.Thread(target=lambda: [mock.serve_once()
                                             for _ in range(5)])
        t.start()
        got = runner.handshake(5)
        t.join()
        assert got == 5
        rep = runner.run(0.5, JoyCmd.zeros(), mock)
        assert rep["frames"] == 250
        assert rep["ctrl_steps"] == 200
        assert not rep["nan"]
        assert 0.2 < rep["final_root"][2] < 0.4
    finally:
        runner.close()
        mock.close()


def test_sdk_crc_table_matches_bitwise():
    """The table-driven CRC (hot path) is exactly Unitree's published
    bitwise algorithm (kept as the validation reference)."""
    from a1_qp_mpc_controller_tpu.runtime import sdk_wire as sw

    rng = np.random.default_rng(11)
    for n in (1, 7, 199, 254):
        w = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        assert sw.crc32_core(w) == sw._crc32_core_bitwise(w), n
