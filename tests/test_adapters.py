"""Platform adapter tests: wire reordering, filtering, joystick semantics,
egress formats (SURVEY.md §2 rows 10-12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a1_qp_mpc_controller_tpu.adapters import (
    gazebo, hardware, isaac, joystick,
)
from a1_qp_mpc_controller_tpu.control import safety


class TestJoystick:
    def _axes(self, **kw):
        a = np.zeros(8, np.float32)
        for k, v in kw.items():
            a[getattr(joystick, f"AXIS_{k.upper()}")] = v
        return jnp.asarray(a)

    def test_axis_scaling(self):
        st = joystick.JoyState.init()
        axes = self._axes(velx=1.0, vely=-1.0, yaw=0.5, height=1.0,
                          pitch=-1.0, roll=1.0)
        _, cmd = joystick.map_joy(st, axes, jnp.zeros(11, jnp.int32))
        assert float(cmd.velx) == pytest.approx(0.6)       # JOY_CMD_VELX_MAX
        assert float(cmd.vely) == pytest.approx(-0.3)
        assert float(cmd.yaw_rate) == pytest.approx(0.4)
        assert float(cmd.velz) == pytest.approx(0.04)
        assert float(cmd.pitch_rate) == pytest.approx(-0.4)
        assert float(cmd.roll_rate) == pytest.approx(0.4)

    def test_button_a_toggles_once_per_press(self):
        st = joystick.JoyState.init()
        axes = jnp.zeros(8)
        press = jnp.zeros(11, jnp.int32).at[joystick.BUTTON_A].set(1)
        release = jnp.zeros(11, jnp.int32)
        # press: 0 -> 1
        st, cmd = joystick.map_joy(st, axes, press)
        assert int(cmd.ctrl_state) == 1
        # held: stays 1 (the reference consumes one request per press)
        st, cmd = joystick.map_joy(st, axes, press)
        assert int(cmd.ctrl_state) == 1
        # release + press again: toggles back to 0
        st, cmd = joystick.map_joy(st, axes, release)
        st, cmd = joystick.map_joy(st, axes, press)
        assert int(cmd.ctrl_state) == 0

    def test_exit_latches(self):
        st = joystick.JoyState.init()
        axes = jnp.zeros(8)
        lb = jnp.zeros(11, jnp.int32).at[joystick.BUTTON_LB].set(1)
        st, cmd = joystick.map_joy(st, axes, lb)
        assert bool(cmd.exit)
        st, cmd = joystick.map_joy(st, axes, jnp.zeros(11, jnp.int32))
        assert bool(cmd.exit)  # stays latched


class TestHardwareWire:
    def test_swap_is_involution(self):
        x = jnp.arange(12.0)
        sw = hardware.SWAP_JOINT_INDICES
        assert np.array_equal(np.asarray(x[sw][sw]), np.asarray(x))
        f = jnp.arange(4.0)
        sf = hardware.SWAP_FOOT_INDICES
        assert np.array_equal(np.asarray(f[sf][sf]), np.asarray(f))

    def test_ingest_reorders_and_filters(self):
        # wire order FR,FL,RR,RL: motor_q = leg index repeated
        motor_q = jnp.repeat(jnp.array([1.0, 0.0, 3.0, 2.0]), 3)
        state = hardware.LowState(
            imu_quat=jnp.array([1.0, 0, 0, 0]),
            imu_gyro=jnp.zeros(3), imu_acc=jnp.zeros(3),
            motor_q=motor_q, motor_dq=motor_q * 10.0,
            foot_force=jnp.array([10.0, 0.0, 30.0, 20.0]),
        )
        filt = hardware.make_foot_force_filter()
        sensors, filt = hardware.ingest(state, filt)
        # controller order: leg i has q == i
        np.testing.assert_allclose(
            np.asarray(sensors.joint_pos),
            np.repeat(np.arange(4.0), 3))
        np.testing.assert_allclose(
            np.asarray(sensors.foot_force), [0.0, 10.0, 20.0, 30.0])
        # filter converges to the steady value after the window fills
        for _ in range(hardware.FOOT_FILTER_WINDOW_SIZE):
            sensors, filt = hardware.ingest(state, filt)
        np.testing.assert_allclose(
            np.asarray(sensors.foot_force), [0.0, 10.0, 20.0, 30.0],
            atol=1e-5)

    def test_egress_wire_order_and_modes(self):
        tau = jnp.arange(12.0) * 0.1
        qpos = jnp.zeros(12)
        qvel = jnp.zeros(12)
        cmd = hardware.egress(tau, qpos, qvel, power_level=10)
        assert np.all(np.asarray(cmd.mode) == 0x0A)
        assert np.all(np.asarray(cmd.kp) == 0)
        # position/velocity control shut off
        assert np.all(np.asarray(cmd.q) == hardware.POS_STOP_F)
        assert np.all(np.asarray(cmd.dq) == hardware.VEL_STOP_F)
        # wire reorder: cmd.tau[wire i] = safe_tau[controller swap_i]
        safe_tau = safety.apply_all(tau, qpos, qvel, 10)
        np.testing.assert_allclose(
            np.asarray(cmd.tau),
            np.asarray(safe_tau)[np.asarray(hardware.SWAP_JOINT_INDICES)])

    def test_egress_applies_safety(self):
        tau = jnp.full((12,), 100.0)  # way over the 33.5 Nm limit
        cmd = hardware.egress(tau, jnp.zeros(12), jnp.zeros(12),
                              power_level=10)
        assert np.max(np.abs(np.asarray(cmd.tau))) <= safety.TORQUE_LIMIT


class TestGazebo:
    def test_ingest_never_feeds_position(self):
        raw = gazebo.GazeboRawState(
            joint_q=jnp.ones(12), joint_dq=jnp.ones(12),
            foot_wrench_z=jnp.ones(4),
            odom_quat=jnp.array([1.0, 0, 0, 0]),
            imu_acc=jnp.ones(3), imu_gyro=jnp.ones(3))
        s = gazebo.ingest(raw)
        assert np.all(np.asarray(s.root_pos) == 0)
        assert np.all(np.asarray(s.root_lin_vel) == 0)
        np.testing.assert_allclose(np.asarray(s.joint_pos), 1.0)

    def test_egress_tau_only(self):
        tau = jnp.arange(12.0)
        cmds = gazebo.egress(tau)
        assert np.all(np.asarray(cmds.mode) == 0x0A)
        assert np.all(np.asarray(cmds.kp) == 0)
        assert np.all(np.asarray(cmds.kd) == 0)
        np.testing.assert_allclose(np.asarray(cmds.tau), np.asarray(tau))


class TestIsaac:
    def test_ingest_consumes_gt_position(self):
        raw = isaac.IsaacRawState(
            joint_q=jnp.zeros(12), joint_dq=jnp.zeros(12),
            foot_force=jnp.array([1.0, 2, 3, 4]),
            contact_flag=jnp.array([1.0, 0, 0, 1]),
            gt_quat=jnp.array([1.0, 0, 0, 0]),
            gt_pos=jnp.array([1.0, 2.0, 0.3]),
            imu_acc=jnp.zeros(3), imu_gyro=jnp.zeros(3))
        s = isaac.ingest(raw, root_lin_vel=jnp.array([0.1, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(s.root_pos), [1.0, 2.0, 0.3])
        np.testing.assert_allclose(np.asarray(s.root_lin_vel),
                                   [0.1, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(s.foot_force), [1, 2, 3, 4])

    def test_egress(self):
        cmd = isaac.egress(jnp.arange(12.0))
        np.testing.assert_allclose(np.asarray(cmd.effort),
                                   np.arange(12.0))


class TestAdaptersJitVmap:
    def test_hardware_ingest_jits_and_vmaps(self):
        b = 8
        state = hardware.LowState(
            imu_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, 4)),
            imu_gyro=jnp.zeros((b, 3)), imu_acc=jnp.zeros((b, 3)),
            motor_q=jnp.zeros((b, 12)), motor_dq=jnp.zeros((b, 12)),
            foot_force=jnp.ones((b, 4)))
        filt = jax.vmap(lambda _: hardware.make_foot_force_filter())(
            jnp.arange(b))
        sensors, filt2 = jax.jit(jax.vmap(hardware.ingest))(state, filt)
        assert sensors.joint_pos.shape == (b, 12)
        assert filt2.buf.shape == filt.buf.shape
