"""Closed-loop integration tests: stand, trot, slope — the in-framework
equivalent of the reference's Gazebo validation workflow (README.md:160-187),
with assertions instead of eyeballs."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from a1_qp_mpc_controller_tpu.config import load_profile
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.sim import terrain as tr


def run(profile, n_steps, walk_after=None, velx=0.0, terrain=None,
        mpc_iters=400, substeps=5):
    cfg, params = load_profile(profile)
    cfg = dataclasses.replace(cfg, mpc_qp_iters=mpc_iters)
    terrain = terrain if terrain is not None else tr.Terrain.flat()
    carry = cl.make_standing_start(cfg, params, terrain)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=velx)
    return cl.rollout(cfg, params, terrain, carry, joy, n_steps,
                      substeps=substeps)


@pytest.mark.parametrize("profile", ["gazebo_mpc", "gazebo_qp"])
def test_stand_holds_height_and_attitude(profile):
    _, trace = run(profile, 800)
    rp = np.asarray(trace.root_pos)
    eu = np.asarray(trace.root_euler_est)
    assert not np.isnan(rp).any()
    # height within 3 cm of the 0.3 m command over the last second
    assert np.abs(rp[-400:, 2] - 0.3).max() < 0.03
    assert np.abs(eu[-400:, :2]).max() < 0.05
    # xy drift small
    assert np.abs(rp[-1, :2]).max() < 0.05


def test_trot_tracks_forward_velocity():
    _, trace = run("gazebo_mpc", 2000, walk_after=400, velx=0.3)
    rp = np.asarray(trace.root_pos)
    v = np.asarray(trace.root_lin_vel)
    assert not np.isnan(rp).any()
    # moving forward at a significant fraction of the command
    assert v[1200:, 0].mean() > 0.15
    assert rp[-1, 0] > 0.5
    # height and attitude sane throughout
    assert np.abs(rp[800:, 2] - 0.3).max() < 0.06
    assert np.abs(np.asarray(trace.root_euler_est)[800:, 0]).max() < 0.15


def test_trot_gait_alternates_contacts():
    _, trace = run("gazebo_mpc", 1200, walk_after=400, velx=0.2)
    c = np.asarray(trace.contacts[500:1100])
    # diagonal pairs move together (early-contact events may desynchronize
    # a pair for a few ticks, so require strong but not perfect agreement)
    assert (c[:, 0] == c[:, 3]).mean() > 0.9
    assert (c[:, 1] == c[:, 2]).mean() > 0.9
    # both phases occur
    assert (c[:, 0] & ~c[:, 1]).any()
    assert (c[:, 1] & ~c[:, 0]).any()
    # each leg spends roughly half the time in stance
    duty = c.mean(0)
    assert (duty > 0.35).all() and (duty < 0.8).all()


def test_forces_respect_friction_cone_and_bounds():
    from a1_qp_mpc_controller_tpu.utils import mathx
    cfg, params = load_profile("gazebo_mpc")
    _, trace = run("gazebo_mpc", 1200, walk_after=400, velx=0.2)
    # the QP constrains WORLD-frame forces; the trace stores body frame
    # (A1RobotControl.cpp:555-561) — rotate back before checking
    eul = jnp.asarray(np.asarray(trace.root_euler_est))
    rots = np.asarray(mathx.quat_to_rot(mathx.euler_to_quat(eul)))
    f_body = np.asarray(trace.foot_forces_grf)
    f = np.einsum("tab,tlb->tla", rots, f_body)
    fz = f[:, :, 2]
    assert fz.max() <= 180.0 + 1.5
    assert fz.min() >= -1.5
    mu = float(params.mu_mpc)
    # cone satisfied where normal force significant (solver tolerance slack)
    mask = fz > 5.0
    assert (np.abs(f[:, :, 0][mask]) <= mu * fz[mask] + 1.5).all()
    assert (np.abs(f[:, :, 1][mask]) <= mu * fz[mask] + 1.5).all()


def test_slope_trot_with_terrain_adaptation():
    terrain = tr.Terrain.slope(0.2, start=0.3, length=5.0)
    _, trace = run("gazebo_mpc", 2400, walk_after=400, velx=0.3,
                   terrain=terrain)
    rp = np.asarray(trace.root_pos)
    assert not np.isnan(rp).any()
    assert rp[-1, 0] > 0.7          # made progress up the slope
    # climbed: z above flat-ground height
    assert rp[-1, 2] > 0.35
    # body pitched nose-up, tracking the slope direction
    assert np.asarray(trace.root_euler_est)[-400:, 1].mean() < -0.05


def test_estimator_in_the_loop_tracks_truth():
    _, trace = run("gazebo_mpc", 1500, walk_after=400, velx=0.2)
    est = np.asarray(trace.est_root_pos)
    true_p = np.asarray(trace.root_pos)
    err = np.abs(est[600:] - true_p[600:])
    assert err[:, 2].max() < 0.02   # height estimate within 2 cm
    # xy integrates leg odometry: allow slow drift but not divergence
    assert err[-1, :2].max() < 0.15


def test_swing_tracking_telemetry():
    """Per-foot swing telemetry (the reference publishes swing path +
    foot-pose error topics, A1RobotControl.cpp:65-144): during a steady
    trot, swing feet must track the Bezier target; a regression in swing
    control is now visible in the trace instead of silent."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50,
                              mpc_solver_mode="fixed")
    terr = terrain_mod.Terrain.flat()
    carry = cl.make_standing_start(cfg, params, terr)
    joy = cl.joy_schedule(800, walk_after=400, velx=0.3)
    carry, trace = cl.rollout(cfg, params, terr, carry, joy, 800)
    err = np.asarray(trace.swing_err)          # (T,4)
    contacts = np.asarray(trace.contacts)      # (T,4)
    # steady-trot window: swing feet (not in contact) track the target
    sw = ~contacts[600:]
    assert sw.any()
    swing_errs = err[600:][sw]
    # measured baseline: mean 3.3 cm, p95 5.7 cm (PD swing force lags
    # the Bezier by a few cm, as the reference's does); thresholds are a
    # regression tripwire just above that
    assert float(np.percentile(swing_errs, 95)) < 0.07   # < 7 cm p95
    assert float(swing_errs.mean()) < 0.04               # < 4 cm mean
    # channels are consistent: err equals |target - actual|
    d = np.linalg.norm(np.asarray(trace.swing_target)
                       - np.asarray(trace.swing_actual), axis=-1)
    np.testing.assert_allclose(d, err, rtol=1e-5, atol=1e-6)
