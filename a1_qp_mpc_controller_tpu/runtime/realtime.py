"""Single-scenario real-time harness: the functional equivalent of the
reference's Main{Gazebo,Hardware,Isaac} executables (SURVEY.md §1 L5).

Thread topology mirrors the reference:

- a *sensor producer* (here: the in-framework plant, or any external feed)
  pushes frames into the native SPSC ring at its own rate (the reference's
  500 Hz UDP receive thread, HardwareA1ROS.cpp:89);
- the native periodic executor runs the jitted control tick at 400 Hz with
  solve-time compensation (MainHardware.cpp:85-130), consuming the freshest
  sensor frame each period;
- per-tick latency, jitter and deadline-miss statistics come from the
  native loop.

The control math itself is one pre-compiled XLA program with donated
buffers — the "shared blackboard" is the (CtrlState, CtrlMem) pytree
handed from tick to tick.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams, load_profile
from a1_qp_mpc_controller_tpu.control.controller import control_tick
from a1_qp_mpc_controller_tpu.runtime.native import RtLoop, SensorRing
from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod
from a1_qp_mpc_controller_tpu.types import JoyCmd, SensorData

SENSOR_FRAME_LEN = 4 + 3 + 3 + 3 + 3 + 12 + 12 + 4  # 44 floats


def pack_sensors(s: SensorData) -> np.ndarray:
    return np.concatenate([
        np.asarray(s.root_quat), np.asarray(s.root_pos),
        np.asarray(s.root_lin_vel), np.asarray(s.imu_acc),
        np.asarray(s.imu_ang_vel), np.asarray(s.joint_pos),
        np.asarray(s.joint_vel), np.asarray(s.foot_force),
    ]).astype(np.float32)


def unpack_sensors(frame: np.ndarray) -> SensorData:
    f = frame
    return SensorData(
        root_quat=jnp.asarray(f[0:4]), root_pos=jnp.asarray(f[4:7]),
        root_lin_vel=jnp.asarray(f[7:10]), imu_acc=jnp.asarray(f[10:13]),
        imu_ang_vel=jnp.asarray(f[13:16]), joint_pos=jnp.asarray(f[16:28]),
        joint_vel=jnp.asarray(f[28:40]), foot_force=jnp.asarray(f[40:44]),
    )


def run_dual_rate_sim(cfg: A1Config, params: RobotParams,
                      terrain: terrain_mod.Terrain, seconds: float,
                      joy: JoyCmd, sensor_dt: float = 0.002,
                      walk_after_s: float = 0.5) -> dict:
    """Deterministic (non-threaded) simulation of the hardware dual-rate
    schedule: estimation at the sensor rate (500 Hz — the reference runs
    the EKF inside the UDP receive thread, HardwareA1ROS.cpp:336-341),
    control at 400 Hz consuming the latest estimate. Events are ordered
    on a merged timeline with the sensor thread winning ties, exactly
    like the receive thread running ahead of the control thread. Used by
    tests to prove the two-rate schedule is stable."""
    from a1_qp_mpc_controller_tpu.control.controller import (
        control_tick_noest_jit, estimate_step_jit, merge_estimate_mem,
    )

    carry = cl.make_standing_start(cfg, params, terrain)
    cs, mem, ps = carry.cs, carry.mem, carry.ps
    prev_vel = carry.prev_root_lin_vel
    ctrl_dt = float(cfg.control_dt)
    s_dt = jnp.float32(sensor_dt)
    c_dt = jnp.float32(ctrl_dt)
    torques = cs.joint_torques
    n_est = int(round(seconds / sensor_dt))
    n_ctrl = int(round(seconds / ctrl_dt))
    events = sorted(
        [(i * sensor_dt, 0, i) for i in range(1, n_est + 1)]
        + [(i * ctrl_dt, 1, i) for i in range(1, n_ctrl + 1)])
    joy_stand = JoyCmd.zeros()
    n_ctrl_done = 0
    est_count = 0
    for t_ev, kind, _idx in events:
        if kind == 0:
            # sensor thread: plant advances at the sensor rate with the
            # latest torques; ingest + EKF on the fresh frame
            sensors = plant_mod.read_sensors(params, ps, prev_vel, s_dt)
            prev_vel = ps.root_lin_vel
            ps = plant_mod.plant_step(params, terrain, ps, torques, s_dt)
            cs, mem = estimate_step_jit(cfg, params, cs, mem, sensors,
                                        s_dt)
            est_count += 1
        else:
            j = joy if t_ev >= walk_after_s else joy_stand
            cs, mem, torques = control_tick_noest_jit(cfg, params, cs,
                                                      mem, j, c_dt)
            n_ctrl_done += 1
    root = np.asarray(ps.root_pos)
    return {
        "est_steps": est_count,
        "ctrl_steps": n_ctrl_done,
        "final_x_m": float(root[0]),
        "final_z_m": float(root[2]),
        "nan": bool(np.isnan(root).any()
                    or np.isnan(np.asarray(torques)).any()),
    }


class RealtimeRunner:
    """Runs the controller at a fixed wall-clock rate against a sensor ring,
    with an in-process plant producer (swap the producer for a robot I/O
    shim on real hardware).

    ``estimation_rate_hz``: when set (hardware parity: 500.0), the EKF
    runs inside the sensor-rate loop on every frame — the reference runs
    estimation in its 500 Hz UDP receive thread
    (HardwareA1ROS.cpp:336-341) — and the 400 Hz control tick consumes
    the latest estimate without re-ingesting. When None (sim parity),
    estimation runs inside the control tick as Gazebo/Isaac do."""

    def __init__(self, profile: str = "gazebo_mpc",
                 mpc_iters: int = 50, solver_mode: str = "fixed",
                 terrain: Optional[terrain_mod.Terrain] = None,
                 estimation_rate_hz: Optional[float] = None,
                 telemetry_jsonl: Optional[str] = None,
                 telemetry_every: int = 10):
        cfg, params = load_profile(profile)
        self.cfg: A1Config = dataclasses.replace(
            cfg, mpc_qp_iters=mpc_iters, mpc_solver_mode=solver_mode)
        self.params: RobotParams = params
        self.terrain = terrain or terrain_mod.Terrain.flat()
        self.dt = jnp.float32(self.cfg.control_dt)

        carry = cl.make_standing_start(self.cfg, self.params, self.terrain)
        self.cs, self.mem, self.ps = carry.cs, carry.mem, carry.ps
        self.prev_vel = carry.prev_root_lin_vel
        self.joy = JoyCmd.zeros()
        self.ring = SensorRing(SENSOR_FRAME_LEN)

        self.est_rate = estimation_rate_hz
        self.sensor_dt = (1.0 / estimation_rate_hz
                          if estimation_rate_hz else 0.002)
        cfg_ = self.cfg

        @jax.jit
        def _tick(params, cs, mem, sensors, joy, dt):
            return control_tick(cfg_, params, cs, mem, sensors, joy, dt)

        self._tick = _tick
        # warm every compile used by the RT threads so no compilation
        # happens inside the loop (deadline discipline)
        s0 = plant_mod.read_sensors(self.params, self.ps, self.prev_vel,
                                    self.dt)
        out = self._tick(self.params, self.cs, self.mem, s0, self.joy,
                         self.dt)
        out[2].block_until_ready()
        ps_warm = plant_mod.plant_step(self.params, self.terrain, self.ps,
                                       out[2], self.dt)
        ps_warm.root_pos.block_until_ready()
        if self.est_rate:
            from a1_qp_mpc_controller_tpu.control.controller import (
                control_tick_noest, estimate_step,
            )

            @jax.jit
            def _est(params, cs, mem, sensors, dt):
                return estimate_step(cfg_, params, cs, mem, sensors, dt)

            @jax.jit
            def _tick_ne(params, cs, mem, joy, dt):
                return control_tick_noest(cfg_, params, cs, mem, joy, dt)

            self._est = _est
            self._tick_ne = _tick_ne
            e0 = _est(self.params, self.cs, self.mem, s0,
                      jnp.float32(self.sensor_dt))
            o0 = _tick_ne(self.params, e0[0], e0[1], self.joy, self.dt)
            o0[2].block_until_ready()
        self.torques = jnp.zeros((12,), jnp.float32)
        self._latencies_ms: list = []
        # live debug stream: one JSON line per N control ticks with the
        # quantities the reference publishes as rviz/debug topics during
        # a run (estimated pose, desired pose, contacts, GRFs, torques —
        # A1RobotControl.cpp:60-146); `tail -f` is the rviz stand-in
        self._telemetry_every = max(1, telemetry_every)
        # append mode: the CLI help promises "append one JSON line" and a
        # long-lived embedder may run() repeatedly against one file
        self._telemetry_fp = (open(telemetry_jsonl, "a")
                              if telemetry_jsonl else None)
        self._tick_count = 0

    def _emit_telemetry(self) -> None:
        if self._telemetry_fp is None:
            return
        self._tick_count += 1
        if self._tick_count % self._telemetry_every:
            return
        import json
        cs = self.cs
        rec = {
            "tick": self._tick_count,
            "t_s": round(self._tick_count * float(self.cfg.control_dt),
                         4),
            "root_pos": np.asarray(cs.root_pos).round(4).tolist(),
            "root_pos_d": np.asarray(cs.root_pos_d).round(4).tolist(),
            "root_euler": np.asarray(cs.root_euler).round(4).tolist(),
            "root_euler_d": np.asarray(cs.root_euler_d).round(4).tolist(),
            "root_lin_vel": np.asarray(cs.root_lin_vel).round(4).tolist(),
            "contacts": np.asarray(cs.contacts).astype(int).tolist(),
            "foot_forces_grf": np.asarray(
                cs.foot_forces_grf).round(2).tolist(),
            "joint_torques": np.asarray(
                cs.joint_torques).round(3).tolist(),
            "terrain_pitch": round(float(cs.terrain_pitch_angle), 4),
        }
        self._telemetry_fp.write(json.dumps(rec) + "\n")
        self._telemetry_fp.flush()

    # sensor producer: advance the plant with the latest torques and push
    def _produce(self, _tick_idx: int) -> None:
        s = plant_mod.read_sensors(self.params, self.ps, self.prev_vel,
                                   self.dt)
        self.ring.push(pack_sensors(s))

    def _produce_estimate(self, _tick_idx: int) -> None:
        """Sensor-rate thread in hardware-parity mode: advance the plant at
        the SENSOR rate with the latest torques, push the frame, and run
        ingest+EKF on it (the reference's receive thread ingests and
        estimates, HardwareA1ROS.cpp:245-378; the robot's physics runs
        continuously). Advancing the plant here — not in the control loop
        — keeps the finite-difference IMU acceleration consistent with
        the sensor period, matching run_dual_rate_sim's deterministic
        schedule."""
        s_dt = jnp.float32(self.sensor_dt)
        s = plant_mod.read_sensors(self.params, self.ps, self.prev_vel,
                                   s_dt)
        self.prev_vel = self.ps.root_lin_vel
        self.ps = plant_mod.plant_step(self.params, self.terrain, self.ps,
                                       self.torques, s_dt)
        self.ring.push(pack_sensors(s))
        frame = self.ring.pop_latest()
        if frame is None:
            return
        cs, mem = self._est(self.params, self.cs, self.mem,
                            unpack_sensors(frame), s_dt)
        # publish only estimation-owned fields, re-merged against the
        # control thread's CURRENT (cs, mem) so a concurrent planning or
        # warm-start write is never lost — the field-wise analog of the
        # reference's receive thread writing only estimation blackboard
        # fields
        from a1_qp_mpc_controller_tpu.control.controller import (
            merge_estimate_cs, merge_estimate_mem,
        )
        self.mem = merge_estimate_mem(mem, self.mem)
        self.cs = merge_estimate_cs(cs, self.cs)

    def _consume(self, _tick_idx: int) -> None:
        frame = self.ring.pop_latest()
        if frame is None:
            return
        sensors = unpack_sensors(frame)
        t0 = time.perf_counter()
        cs, mem, torques = self._tick(self.params, self.cs, self.mem,
                                      sensors, self.joy, self.dt)
        torques.block_until_ready()
        self._latencies_ms.append((time.perf_counter() - t0) * 1e3)
        self.cs, self.mem = cs, mem
        self.prev_vel = self.ps.root_lin_vel
        self.ps = plant_mod.plant_step(self.params, self.terrain, self.ps,
                                       torques, self.dt)
        self._emit_telemetry()

    def _consume_noest(self, _tick_idx: int) -> None:
        """Control-rate thread in hardware-parity mode: consume the
        latest estimate snapshot, no re-ingest. The plant advances in the
        sensor loop (_produce_estimate); this thread only publishes the
        new torque command, like the reference's send_cmd."""
        t0 = time.perf_counter()
        cs, mem, torques = self._tick_ne(self.params, self.cs, self.mem,
                                         self.joy, self.dt)
        torques.block_until_ready()
        self._latencies_ms.append((time.perf_counter() - t0) * 1e3)
        self.cs, self.mem, self.torques = cs, mem, torques
        self._emit_telemetry()

    def run(self, seconds: float, joy: Optional[JoyCmd] = None) -> dict:
        if joy is not None:
            self.joy = joy
        if self.est_rate:
            sensor_loop = RtLoop(self.sensor_dt, self._produce_estimate,
                                 compensate=False)
            ctrl_loop = RtLoop(float(self.cfg.control_dt),
                               self._consume_noest, compensate=True)
        else:
            sensor_loop = RtLoop(self.sensor_dt, self._produce,
                                 compensate=False)
            ctrl_loop = RtLoop(float(self.cfg.control_dt), self._consume,
                               compensate=True)
        sensor_loop.start()
        ctrl_loop.start()
        time.sleep(seconds)
        ctrl_loop.stop()
        sensor_loop.stop()
        stats = ctrl_loop.stats()
        lat = sorted(self._latencies_ms)
        if lat:
            stats["solve_p50_ms"] = lat[len(lat) // 2]
            stats["solve_p99_ms"] = lat[int(len(lat) * 0.99)]
        stats["ring_dropped"] = self.ring.dropped
        stats["root_pos"] = np.asarray(self.ps.root_pos).tolist()
        if self._telemetry_fp is not None:
            self._telemetry_fp.flush()
        return stats

    def close(self) -> None:
        """Release the telemetry file handle (idempotent). Call when
        embedding RealtimeRunner long-lived; __exit__ calls it too."""
        if self._telemetry_fp is not None:
            self._telemetry_fp.close()
            self._telemetry_fp = None

    def __enter__(self) -> "RealtimeRunner":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
