"""Runtime layer tests: native executor, checkpointing, telemetry, CLI."""

import io
import json
import subprocess
import sys
import time

import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.runtime import checkpoint, telemetry
from a1_qp_mpc_controller_tpu.runtime.native import RtLoop, SensorRing


def test_sensor_ring_latest_wins():
    r = SensorRing(4)
    assert r.pop_latest() is None
    for i in range(10):
        r.push(np.full(4, float(i), np.float32))
    out = r.pop_latest()
    np.testing.assert_allclose(out, 9.0)
    assert r.pop_latest() is None  # drained


def test_sensor_ring_overwrite_drops_oldest():
    r = SensorRing(2, capacity_pow2=2)  # 4 slots
    for i in range(10):
        r.push(np.full(2, float(i), np.float32))
    assert r.dropped > 0
    np.testing.assert_allclose(r.pop_latest(), 9.0)


def test_rt_loop_rate_and_stats():
    # Wall-clock jitter depends on machine load (the full suite saturates
    # the box); take the best of 3 short runs before judging.
    last = None
    for _ in range(3):
        count = [0]

        def work(_tick):
            count[0] += 1

        loop = RtLoop(0.005, work, compensate=True)
        loop.start()
        time.sleep(0.25)
        loop.stop()
        s = loop.stats()
        assert s["iterations"] == count[0]
        last = s
        if (30 <= s["iterations"] <= 60 and s["missed_deadlines"] == 0
                and s["mean_jitter_ms"] < 1.0):
            return
    assert 30 <= last["iterations"] <= 60
    assert last["missed_deadlines"] == 0
    assert last["mean_jitter_ms"] < 1.0


def test_rt_loop_overrun_accounting():
    def slow(_tick):
        time.sleep(0.01)  # 10 ms work in a 5 ms loop

    loop = RtLoop(0.005, slow, compensate=True)
    loop.start()
    time.sleep(0.2)
    loop.stop()
    s = loop.stats()
    assert s["missed_deadlines"] == s["iterations"] > 0


def test_checkpoint_roundtrip(tmp_path):
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import terrain as tr
    cfg, params = load_profile("gazebo_mpc")
    carry = cl.make_standing_start(cfg, params, tr.Terrain.flat())
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, carry)
    fresh = cl.make_standing_start(cfg, params, tr.Terrain.flat())
    restored = checkpoint.load(path, fresh)
    assert checkpoint.roundtrip_equal(carry, restored)


def test_checkpoint_resume_continues_exactly():
    """Rollout(40) == rollout(20) -> checkpoint -> rollout(20)."""
    import dataclasses
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import terrain as tr
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25, mpc_solver_mode="fixed")
    terr = tr.Terrain.flat()
    carry0 = cl.make_standing_start(cfg, params, terr)
    joy = cl.joy_schedule(40)
    full, trace_full = cl.rollout(cfg, params, terr, carry0, joy, 40)

    import jax.tree_util as jtu
    half1, _ = cl.rollout(cfg, params, terr, carry0,
                          jtu.tree_map(lambda a: a[:20], joy), 20)
    half2, _ = cl.rollout(cfg, params, terr, half1,
                          jtu.tree_map(lambda a: a[20:], joy), 20)
    np.testing.assert_allclose(np.asarray(half2.ps.root_pos),
                               np.asarray(full.ps.root_pos), atol=1e-6)


def test_telemetry_summary_and_jsonl():
    import dataclasses
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import terrain as tr
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25, mpc_solver_mode="fixed")
    terr = tr.Terrain.flat()
    carry = cl.make_standing_start(cfg, params, terr)
    _, trace = cl.rollout(cfg, params, terr, carry, cl.joy_schedule(30), 30)
    s = telemetry.summarize_trace(trace)
    assert s["ticks"] == 30 and not s["nan"]
    buf = io.StringIO()
    n = telemetry.write_jsonl(trace, buf, every=5)
    assert n == 6
    row = json.loads(buf.getvalue().splitlines()[0])
    assert "pos" in row and len(row["fz"]) == 4


def test_cli_sim_smoke():
    out = subprocess.run(
        [sys.executable, "-m", "a1_qp_mpc_controller_tpu", "--cpu", "sim",
         "--seconds", "0.5", "--mpc-iters", "25", "--solver-mode", "fixed",
         "--walk-after", "10.0"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout)
    assert rep["nan"] is False


def test_cli_bad_terrain_errors():
    out = subprocess.run(
        [sys.executable, "-m", "a1_qp_mpc_controller_tpu", "--cpu", "sim",
         "--terrain", "volcano"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "volcano" in out.stderr


def test_time_scan_measures_and_preserves_dependency():
    import jax.numpy as jnp
    from a1_qp_mpc_controller_tpu.runtime.profiling import time_scan

    calls = []
    per = time_scan(lambda c: c * 1.000001 + 1.0,
                    jnp.ones((64, 64)), repeats=5, reps=2,
                    name="unit", printer=calls.append)
    assert per > 0
    assert len(calls) == 1 and "unit" in calls[0]


def test_dual_rate_estimation_schedule_stable():
    """Hardware schedule parity: the EKF runs at the 500 Hz sensor rate
    (the reference runs update_estimation inside the UDP receive thread,
    HardwareA1ROS.cpp:336-341, A1Params.h:12) while control runs at
    400 Hz consuming the latest estimate. The deterministic interleaved
    sim must hold the trot stable: correct step counts, body height held,
    forward progress, no NaN."""
    import dataclasses

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.runtime.realtime import run_dual_rate_sim
    from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
    from a1_qp_mpc_controller_tpu.types import JoyCmd

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50, mpc_solver_mode="fixed")
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    rep = run_dual_rate_sim(cfg, params, terrain_mod.Terrain.flat(),
                            seconds=2.0, joy=joy, walk_after_s=1.0)
    assert rep["est_steps"] == 1000          # 2 s at 500 Hz
    assert rep["ctrl_steps"] == 800          # 2 s at 400 Hz
    assert not rep["nan"]
    assert 0.2 < rep["final_z_m"] < 0.4      # height held
    assert rep["final_x_m"] > 0.1            # walked forward


def test_realtime_runner_sensor_rate_ekf_smoke():
    """Threaded hardware-parity mode: RealtimeRunner with the EKF in the
    500 Hz sensor loop and control at 400 Hz consuming the latest
    estimate — runs wall-clock threads briefly, produces stats, keeps
    the plant finite. Runs in a SUBPROCESS: wall-clock native threads +
    fresh XLA compiles inside the long-lived pytest process triggered a
    rare jaxlib segfault (observed twice in ~20-minute full-suite runs,
    never in isolation)."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "from a1_qp_mpc_controller_tpu.runtime.realtime import "
        "RealtimeRunner\n"
        "r = RealtimeRunner(mpc_iters=25, solver_mode='fixed', "
        "estimation_rate_hz=500.0)\n"
        "s = r.run(0.4)\n"
        "assert s['iterations'] > 0, s\n"
        "assert not np.isnan(np.asarray(s['root_pos'])).any(), s\n"
        "assert 0.1 < s['root_pos'][2] < 0.5, s\n"
        "print('SMOKE_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SMOKE_OK" in out.stdout


def test_merge_estimate_cs_preserves_planning_fields():
    """The sensor-rate estimate publish must not clobber concurrent
    control-thread planning updates (lost-update race, round-3 advisor
    finding): merge_estimate_cs takes estimation-owned fields from the
    estimate snapshot and keeps the control thread's planning fields."""
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import (
        merge_estimate_cs,
    )
    from a1_qp_mpc_controller_tpu.types import CtrlState

    cfg, params = load_profile("gazebo_mpc")
    base = CtrlState.init(cfg, params)
    # control thread advanced planning state since the estimate snapshot
    ctrl = base.replace(
        gait_counter=base.gait_counter + 7.0,
        foot_pos_target_rel=base.foot_pos_target_rel + 0.05,
        movement_mode=jnp.int32(1),
    )
    # estimation thread produced fresh sensor-derived state
    est = base.replace(
        root_pos=jnp.array([0.1, 0.2, 0.31]),
        root_lin_vel=jnp.array([0.3, 0.0, 0.0]),
        joint_pos=base.joint_pos + 0.01,
        foot_pos_abs=base.foot_pos_abs + 0.02,
    )
    merged = merge_estimate_cs(est, ctrl)
    # estimation fields come from est
    np.testing.assert_allclose(np.asarray(merged.root_pos),
                               [0.1, 0.2, 0.31])
    np.testing.assert_allclose(np.asarray(merged.joint_pos),
                               np.asarray(est.joint_pos))
    np.testing.assert_allclose(np.asarray(merged.foot_pos_abs),
                               np.asarray(est.foot_pos_abs))
    # planning fields come from ctrl (NOT discarded)
    np.testing.assert_allclose(np.asarray(merged.gait_counter),
                               np.asarray(ctrl.gait_counter))
    np.testing.assert_allclose(np.asarray(merged.foot_pos_target_rel),
                               np.asarray(ctrl.foot_pos_target_rel))
    assert int(merged.movement_mode) == 1


def test_cli_sim_time_precondition_refusal():
    """Startup precondition parity (MainGazebo.cpp:31-37 /
    MainHardware.cpp:30-37): a simulated-time executor refuses a
    hardware (use_sim_time=false) profile and vice versa; the explicit
    override flag proceeds."""
    base = [sys.executable, "-m", "a1_qp_mpc_controller_tpu", "--cpu"]
    out = subprocess.run(
        base + ["sim", "--profile", "hardware_qp", "--seconds", "0.01"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "startup precondition" in out.stderr
    out = subprocess.run(
        base + ["wire", "--profile", "gazebo_mpc", "--seconds", "0.01"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "startup precondition" in out.stderr
    # override proceeds past the check (and the tiny sim completes)
    out = subprocess.run(
        base + ["sim", "--profile", "hardware_qp", "--seconds", "0.05",
                "--override-sim-time-check"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]


def test_realtime_telemetry_jsonl_live_stream(tmp_path):
    """--telemetry-jsonl live debug stream (the rviz-topic stand-in,
    A1RobotControl.cpp:60-146): the runner appends valid JSON records of
    pose/contacts/GRF/torque state during the run."""
    import json

    from a1_qp_mpc_controller_tpu.runtime.realtime import RealtimeRunner

    out = tmp_path / "live.jsonl"
    r = RealtimeRunner(mpc_iters=25, solver_mode="fixed",
                       telemetry_jsonl=str(out), telemetry_every=5)
    r.run(0.3)
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= 3, lines
    rec = json.loads(lines[-1])
    for k in ("tick", "t_s", "root_pos", "root_pos_d", "contacts",
              "foot_forces_grf", "joint_torques"):
        assert k in rec, k
    assert len(rec["root_pos"]) == 3
    assert len(rec["joint_torques"]) == 12
