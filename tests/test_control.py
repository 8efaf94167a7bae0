"""Unit tests for the control-core stages (gait, swing, torque, FSM)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.control import fsm, gait, swing, torque
from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState, JoyCmd


def setup(profile="gazebo_mpc"):
    cfg, params = load_profile(profile)
    cs = CtrlState.init(cfg, params)
    mem = CtrlMem.init(cfg)
    return cfg, params, cs, mem


def test_gait_counters_standstill():
    cfg, params, cs, _ = setup()
    cs = cs.replace(movement_mode=jnp.int32(0))
    cs2 = gait.update_plan(cfg, params, cs, jnp.float32(0.0025))
    # standstill: counters pinned at trot reset, all feet planned stance
    np.testing.assert_allclose(np.asarray(cs2.gait_counter),
                               [0, 120, 120, 0])
    assert np.asarray(cs2.plan_contacts).all()


def test_gait_counters_walk_advance_and_wrap():
    cfg, params, cs, _ = setup()
    cs = cs.replace(movement_mode=jnp.int32(1))
    dt = jnp.float32(0.0025)
    for _ in range(10):
        cs = gait.update_plan(cfg, params, cs, dt)
    speed = float(params.gait_counter_speed[0])
    np.testing.assert_allclose(np.asarray(cs.gait_counter),
                               np.mod([0 + 10 * speed, 120 + 10 * speed,
                                       120 + 10 * speed, 10 * speed], 240),
                               rtol=1e-5)
    # FL in stance half, FR in swing half
    assert bool(cs.plan_contacts[0]) and not bool(cs.plan_contacts[1])


def test_raibert_foothold_shifts_with_velocity():
    cfg, params, cs, _ = setup()
    cs = cs.replace(movement_mode=jnp.int32(1),
                    root_lin_vel=jnp.array([0.5, 0.0, 0.0]))
    cs2 = gait.update_plan(cfg, params, cs, jnp.float32(0.0025))
    # moving faster than desired (0) -> foothold ahead of neutral
    delta = np.asarray(cs2.foot_pos_target_rel - params.default_foot_pos)
    assert (delta[:, 0] > 0.02).all()
    # clamped at 0.1
    assert (delta[:, 0] <= 0.1 + 1e-6).all()


def test_raibert_clamp():
    cfg, params, cs, _ = setup()
    cs = cs.replace(movement_mode=jnp.int32(1),
                    root_lin_vel=jnp.array([5.0, -5.0, 0.0]))
    cs2 = gait.update_plan(cfg, params, cs, jnp.float32(0.0025))
    delta = np.asarray(cs2.foot_pos_target_rel - params.default_foot_pos)
    np.testing.assert_allclose(delta[:, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(delta[:, 1], -0.1, atol=1e-6)


def test_swing_stance_feet_refresh_start():
    cfg, params, cs, mem = setup()
    cs = cs.replace(gait_counter=jnp.array([10.0, 200.0, 200.0, 10.0]),
                    foot_pos_abs=params.default_foot_pos)
    cs2, mem2 = swing.generate_swing_legs_ctrl(cfg, params, cs, mem,
                                               jnp.float32(0.0025))
    # stance legs (0,3) refresh start to current; swing legs (1,2) keep old
    np.testing.assert_allclose(np.asarray(cs2.foot_pos_start[0]),
                               np.asarray(cs2.foot_pos_cur[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs2.foot_pos_start[1]),
                               np.zeros(3), atol=1e-6)


def test_early_contact_detection():
    cfg, params, cs, mem = setup()
    # leg 1 late in swing (counter > 1.5*120=180) with big foot force
    cs = cs.replace(gait_counter=jnp.array([10.0, 200.0, 150.0, 10.0]),
                    plan_contacts=jnp.array([True, False, False, True]),
                    foot_force=jnp.array([0.0, 50.0, 50.0, 0.0]))
    cs2, _ = swing.generate_swing_legs_ctrl(cfg, params, cs, mem,
                                            jnp.float32(0.0025))
    assert bool(cs2.early_contacts[1])      # late swing + force -> early
    assert not bool(cs2.early_contacts[2])  # too early in swing (150<180)
    assert bool(cs2.contacts[1])
    assert not bool(cs2.contacts[2])


def test_torque_warmup_and_mapping():
    cfg, params, cs, mem = setup()
    cs = cs.replace(contacts=jnp.array([True, True, False, False]),
                    foot_forces_grf=jnp.tile(jnp.array([0.0, 0, 30.0]),
                                             (4, 1)),
                    foot_forces_kin=jnp.tile(jnp.array([1.0, 0, 0]), (4, 1)))
    # warmup: zero torques for first ticks
    cs2, mem2 = torque.compute_joint_torques(cfg, params, cs, mem)
    np.testing.assert_allclose(np.asarray(cs2.joint_torques), 0.0)
    mem = mem.replace(tick=jnp.int32(50))
    cs3, _ = torque.compute_joint_torques(cfg, params, cs, mem)
    tau = np.asarray(cs3.joint_torques).reshape(4, 3)
    jf = np.asarray(cs.j_foot)  # identity jacobians in init state
    # stance legs: tau = J'(-F) + gravity ff
    expect = -np.asarray(cs.foot_forces_grf[0]) + np.asarray(
        params.torques_gravity).reshape(4, 3)[0]
    np.testing.assert_allclose(tau[0], expect, atol=1e-5)
    # swing legs: J tau = km*F_kin (J=I here)
    expect_sw = (np.asarray(params.km_foot)
                 * np.asarray(cs.foot_forces_kin[2])
                 + np.asarray(params.torques_gravity).reshape(4, 3)[2])
    np.testing.assert_allclose(tau[2], expect_sw, atol=1e-5)
    del jf


def test_fsm_position_locking():
    cfg, params, cs, _ = setup()
    dt = jnp.float32(0.0025)
    cs = cs.replace(root_pos=jnp.array([1.0, 2.0, 0.3]))
    # enter walk with velocity command: chase xy, zero xy gains
    joy = JoyCmd.zeros().replace(velx=jnp.float32(0.3),
                                 ctrl_state=jnp.int32(1))
    cs2 = fsm.joystick_update(cfg, params, cs, joy, dt)
    assert int(cs2.movement_mode) == 1
    np.testing.assert_allclose(np.asarray(cs2.root_pos_d[:2]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(cs2.kp_linear[:2]), 0.0)
    # leave walk: lock current position with lock gains
    joy0 = JoyCmd.zeros()
    cs3 = fsm.joystick_update(cfg, params, cs2, joy0, dt)
    assert int(cs3.movement_mode) == 0
    np.testing.assert_allclose(np.asarray(cs3.root_pos_d[:2]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(cs3.kp_linear[:2]),
                               np.asarray(params.kp_linear_lock_xy))


def test_fsm_height_integration_clamp():
    cfg, params, cs, _ = setup()
    dt = jnp.float32(0.0025)
    joy_up = JoyCmd.zeros().replace(velz=jnp.float32(10.0))
    for _ in range(20):
        cs = fsm.joystick_update(cfg, params, cs, joy_up, dt)
    assert abs(float(cs.joy_body_height) - 0.32) < 1e-6  # clamped at max


def test_terrain_adaptation_flat_is_zero():
    import dataclasses as dc
    from a1_qp_mpc_controller_tpu.control import grf
    cfg, params, cs, mem = setup()
    cfg = dc.replace(cfg, use_terrain_adapt=True)
    cs = cs.replace(
        root_pos=jnp.array([0.0, 0.0, 0.3]),
        foot_pos_recent_contact=params.default_foot_pos)
    cs2, mem2 = grf.terrain_adaptation(cfg, cs, mem)
    assert abs(float(cs2.terrain_pitch_angle)) < 1e-4


def test_rescue_flag_policy_round5():
    """Round-5 rescue-flag policy (control/grf.mpc_problem): flips flag;
    the dense head flags every tick; the strided tail flags only on
    stride-aligned ticks; the 0.5 N drift-predictive trigger flags on
    last-tick first-step force slew; calm ticks don't flag."""
    from a1_qp_mpc_controller_tpu.control import grf

    cfg, params, cs, mem = setup()
    cfg = dataclasses.replace(cfg, mpc_solver_mode="fixed",
                              mpc_cooldown_ticks=32,
                              mpc_cooldown_stride=4,
                              mpc_cooldown_dense=12,
                              mpc_drift_rescue_n=0.5)
    dt = jnp.float32(cfg.control_dt)
    cs = cs.replace(root_pos=jnp.array([0.0, 0.0, 0.3]),
                    foot_pos_abs=params.default_foot_pos,
                    contacts=jnp.array([True, False, False, True]))
    base = mem.replace(mpc_warm_started=jnp.asarray(True),
                       mpc_prev_contacts=cs.contacts)

    def flag(m):
        return bool(grf.mpc_problem(cfg, params, cs, m, dt).rescue_flag)

    # calm tick: warm-started, same contacts, no cooldown, no slew
    assert not flag(base)
    # contact flip
    m = base.replace(mpc_prev_contacts=jnp.array([True] * 4))
    prob = grf.mpc_problem(cfg, params, cs, m, dt)
    assert bool(prob.flipped) and bool(prob.rescue_flag)
    # dense head: cooldown counts DOWN from 32; cd=21 -> since_flip 11
    # (<= dense 12) flags on ANY tick parity
    m = base.replace(mpc_flip_cooldown=jnp.int32(21),
                     tick=jnp.int32(103))
    assert flag(m)
    # strided tail: cd=10 -> since_flip 22; flags only when tick % 4 == 0
    m = base.replace(mpc_flip_cooldown=jnp.int32(10),
                     tick=jnp.int32(104))
    assert flag(m)
    m = base.replace(mpc_flip_cooldown=jnp.int32(10),
                     tick=jnp.int32(103))
    assert not flag(m)
    # drift trigger: last-tick first-step force slew above 0.5 N
    dx = jnp.zeros_like(base.mpc_warm_dx).at[2].set(0.6)
    assert flag(base.replace(mpc_warm_dx=dx))
    assert not flag(base.replace(mpc_warm_dx=dx * 0.5))
    # slew in a LATER horizon step's variables does not trigger
    dx_late = jnp.zeros_like(base.mpc_warm_dx).at[30].set(5.0)
    assert not flag(base.replace(mpc_warm_dx=dx_late))
