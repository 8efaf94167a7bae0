"""Hardware wire loop: UDP transport for the LowState/LowCmd exchange.

The reference's hardware path talks to the robot over the Unitree SDK's
UDP link: a zero-torque ``udp_init_send`` handshake at startup
(HardwareA1ROS.cpp:230-243) and then a 500 Hz receive thread ingesting
``LowState`` (HardwareA1ROS.cpp:245-378) while ``send_cmd`` pushes
torque-only ``LowCmd`` packets back (HardwareA1ROS.cpp:177-197). This
module reproduces that transport against a LOOPBACK mock robot (backed by
the in-framework plant), closing the I/O-loop gap that
``adapters/hardware.py`` (wire formats only) left open.

Wire format (ours — the SDK's packed struct is proprietary): little-
endian, u32 magic + u32 sequence + float32 payload.

- LowState payload: quat(4) gyro(3) acc(3) q(12) dq(12) foot_force(4)
  = 38 floats, WIRE leg order (FR,FL,RR,RL).
- LowCmd payload: mode(12) q(12) dq(12) kp(12) kd(12) tau(12)
  = 72 floats, WIRE order.

The deterministic runner steps the exchange synchronously (one state per
2 ms of robot time, control every 2.5 ms) — the timing-accurate threaded
schedule is exercised separately by ``realtime.RealtimeRunner``; this
module's job is the WIRE: sockets, packing, the handshake, and the leg
reorder round-trip.
"""

from __future__ import annotations

import socket
import struct
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.adapters import hardware as hw
from a1_qp_mpc_controller_tpu.config import A1Config, RobotParams
from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod

# wire format registry: 'native' is our compact float32 frame; 'sdk'
# is the Unitree legged SDK v3.2 packed-struct byte layout
# (runtime/sdk_wire.py) — same four-function contract
STATE_MAGIC = 0xA15E_ED01
CMD_MAGIC = 0xA1C0_FFEE
_HDR = struct.Struct("<II")
STATE_FLOATS = 4 + 3 + 3 + 12 + 12 + 4
CMD_FLOATS = 6 * 12

# wire leg order involution (FL,FR,RL,RR <-> FR,FL,RR,RL)
_SWAP_J = np.asarray(hw.SWAP_JOINT_INDICES)
_SWAP_F = np.asarray(hw.SWAP_FOOT_INDICES)


def pack_low_state(seq: int, quat, gyro, acc, q_wire, dq_wire,
                   foot_wire) -> bytes:
    payload = np.concatenate([
        np.asarray(quat, np.float32).ravel(),
        np.asarray(gyro, np.float32).ravel(),
        np.asarray(acc, np.float32).ravel(),
        np.asarray(q_wire, np.float32).ravel(),
        np.asarray(dq_wire, np.float32).ravel(),
        np.asarray(foot_wire, np.float32).ravel(),
    ])
    assert payload.size == STATE_FLOATS
    return _HDR.pack(STATE_MAGIC, seq & 0xFFFFFFFF) + payload.tobytes()


def unpack_low_state(buf: bytes) -> Tuple[int, hw.LowState]:
    magic, seq = _HDR.unpack_from(buf)
    if magic != STATE_MAGIC:
        raise ValueError(f"bad LowState magic {magic:#x}")
    f = np.frombuffer(buf, np.float32, STATE_FLOATS, _HDR.size)
    return seq, hw.LowState(
        imu_quat=jnp.asarray(f[0:4]), imu_gyro=jnp.asarray(f[4:7]),
        imu_acc=jnp.asarray(f[7:10]), motor_q=jnp.asarray(f[10:22]),
        motor_dq=jnp.asarray(f[22:34]), foot_force=jnp.asarray(f[34:38]))


def pack_low_cmd(seq: int, cmd: hw.LowCmd) -> bytes:
    payload = np.concatenate([
        np.asarray(cmd.mode, np.float32).ravel(),
        np.asarray(cmd.q, np.float32).ravel(),
        np.asarray(cmd.dq, np.float32).ravel(),
        np.asarray(cmd.kp, np.float32).ravel(),
        np.asarray(cmd.kd, np.float32).ravel(),
        np.asarray(cmd.tau, np.float32).ravel(),
    ])
    assert payload.size == CMD_FLOATS
    return _HDR.pack(CMD_MAGIC, seq & 0xFFFFFFFF) + payload.tobytes()


def unpack_low_cmd(buf: bytes) -> Tuple[int, np.ndarray]:
    """Returns (seq, tau_wire (12,)) — the only fields the mock robot
    acts on (mode/q/dq/kp/kd are the constant torque-only settings)."""
    magic, seq = _HDR.unpack_from(buf)
    if magic != CMD_MAGIC:
        raise ValueError(f"bad LowCmd magic {magic:#x}")
    f = np.frombuffer(buf, np.float32, CMD_FLOATS, _HDR.size)
    return seq, f[60:72].copy()


def wire_functions(fmt: str):
    """(pack_state, unpack_state, pack_cmd, unpack_cmd) for a format
    name: 'native' (our float32 frames) or 'sdk' (Unitree SDK v3.2
    packed structs, runtime/sdk_wire.py)."""
    if fmt == "native":
        return (pack_low_state, unpack_low_state, pack_low_cmd,
                unpack_low_cmd)
    if fmt == "sdk":
        from a1_qp_mpc_controller_tpu.runtime import sdk_wire
        return (sdk_wire.pack_low_state_sdk, sdk_wire.unpack_low_state_sdk,
                sdk_wire.pack_low_cmd_sdk, sdk_wire.unpack_low_cmd_sdk)
    raise ValueError(f"unknown wire format {fmt!r}")


class MockA1Robot:
    """Loopback robot endpoint: receives LowCmd over UDP, advances the
    in-framework plant by one sensor period per command, replies with the
    resulting LowState (wire leg order) — the role Gazebo + the SDK's
    onboard side play for the reference."""

    def __init__(self, params: RobotParams, terrain: terrain_mod.Terrain,
                 sensor_dt: float = 0.002, wire_format: str = "native"):
        self._pack_state, _, _, self._unpack_cmd = wire_functions(
            wire_format)
        self.params = params
        self.terrain = terrain
        self.sensor_dt = jnp.float32(sensor_dt)
        self.ps = plant_mod.init_standing(params, terrain)
        self.prev_vel = self.ps.root_lin_vel
        # warm the plant/sensor jits so the first wire exchange is not
        # delayed by compilation (discard results — state is untouched)
        ps_w = plant_mod.plant_step(params, terrain, self.ps,
                                    jnp.zeros(12, jnp.float32),
                                    self.sensor_dt)
        plant_mod.read_sensors(params, ps_w, self.prev_vel,
                               self.sensor_dt).root_quat.block_until_ready()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(2.0)
        self.addr = self.sock.getsockname()
        self.zero_torque_cmds = 0
        self.nonzero_seen = False
        self.seq = 0

    def serve_once(self) -> None:
        buf, peer = self.sock.recvfrom(4096)
        _, tau_wire = self._unpack_cmd(buf)
        if not self.nonzero_seen:
            if np.abs(tau_wire).max() == 0.0:
                self.zero_torque_cmds += 1
            else:
                self.nonzero_seen = True
        # wire -> controller joint order, drive the plant
        tau_ctrl = jnp.asarray(tau_wire[_SWAP_J])
        self.prev_vel = self.ps.root_lin_vel
        self.ps = plant_mod.plant_step(self.params, self.terrain, self.ps,
                                       tau_ctrl, self.sensor_dt)
        s = plant_mod.read_sensors(self.params, self.ps, self.prev_vel,
                                   self.sensor_dt)
        # controller order -> wire order for the reply
        jp = np.asarray(s.joint_pos)[_SWAP_J]
        jv = np.asarray(s.joint_vel)[_SWAP_J]
        ff = np.asarray(s.foot_force)[_SWAP_F]
        self.seq += 1
        self.sock.sendto(
            self._pack_state(self.seq, s.root_quat, s.imu_ang_vel,
                             s.imu_acc, jp, jv, ff), peer)

    def close(self) -> None:
        self.sock.close()


class HardwareWireRunner:
    """Controller endpoint of the UDP loop.

    ``handshake()`` performs the reference's ``udp_init_send``: a burst
    of zero-torque commands that establishes the link before any control
    runs (HardwareA1ROS.cpp:230-243). ``run()`` then drives the
    dual-rate exchange: every received LowState is ingested through
    ``adapters.hardware.ingest`` + the sensor-rate estimator
    (HardwareA1ROS.cpp:336-341); a control tick fires each time the
    2.5 ms control period elapses on the robot clock, and its torques go
    back as a safety-filtered LowCmd."""

    def __init__(self, cfg: A1Config, params: RobotParams,
                 robot_addr, sensor_dt: float = 0.002,
                 power_level: int = 5, wire_format: str = "native"):
        from a1_qp_mpc_controller_tpu.runtime.native import SensorRing
        from a1_qp_mpc_controller_tpu.runtime.realtime import (
            SENSOR_FRAME_LEN, pack_sensors, unpack_sensors,
        )
        from a1_qp_mpc_controller_tpu.types import CtrlMem, CtrlState

        self.cfg = cfg
        self.params = params
        self.robot_addr = robot_addr
        self.sensor_dt = sensor_dt
        self.power_level = power_level
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(2.0)
        self.cs = CtrlState.init(cfg, params)
        self.mem = CtrlMem.init(cfg, params)
        self.foot_filter = hw.make_foot_force_filter()
        self.ring = SensorRing(SENSOR_FRAME_LEN)
        self._pack = pack_sensors
        self._unpack = unpack_sensors
        (_, self._unpack_state, self._pack_cmd, _) = wire_functions(
            wire_format)
        self.seq = 0
        self.torques = jnp.zeros(12, jnp.float32)

    def _send_cmd(self, torques: jnp.ndarray) -> None:
        cmd = hw.egress(torques, self.cs.joint_pos, self.cs.joint_vel,
                        self.power_level)
        self.seq += 1
        self.sock.sendto(self._pack_cmd(self.seq, cmd),
                         self.robot_addr)

    def _recv_state(self) -> Optional[hw.LowState]:
        try:
            buf, _ = self.sock.recvfrom(4096)
        except socket.timeout:
            return None
        _, ls = self._unpack_state(buf)
        return ls

    def handshake(self, n: int = 10) -> int:
        """udp_init_send parity: n zero-torque commands; returns how many
        state replies arrived (link-up check)."""
        got = 0
        zeros = jnp.zeros(12, jnp.float32)
        for _ in range(n):
            self._send_cmd(zeros)
            if self._recv_state() is not None:
                got += 1
        return got

    def run(self, seconds: float, joy, mock: MockA1Robot) -> dict:
        """Synchronous dual-rate exchange against ``mock`` (which must be
        served in lock-step from this thread: each send triggers
        ``mock.serve_once()``)."""
        from a1_qp_mpc_controller_tpu.control.controller import (
            control_tick_noest_jit, estimate_step_jit,
        )
        n_frames = int(round(seconds / self.sensor_dt))
        ctrl_dt = float(self.cfg.control_dt)
        t_robot = 0.0
        t_next_ctrl = ctrl_dt
        s_dt = jnp.float32(self.sensor_dt)
        c_dt = jnp.float32(ctrl_dt)
        ctrl_steps = 0
        for _ in range(n_frames):
            self._send_cmd(self.torques)
            mock.serve_once()
            ls = self._recv_state()
            if ls is None:
                continue
            sensors, self.foot_filter = hw.ingest(ls, self.foot_filter)
            # through the native ring (the transport seam the threaded
            # runner uses)
            self.ring.push(self._pack(sensors))
            frame = self.ring.pop_latest()
            sensors = self._unpack(frame)
            self.cs, self.mem = estimate_step_jit(
                self.cfg, self.params, self.cs, self.mem, sensors, s_dt)
            t_robot += self.sensor_dt
            if t_robot + 1e-9 >= t_next_ctrl:
                self.cs, self.mem, self.torques = control_tick_noest_jit(
                    self.cfg, self.params, self.cs, self.mem, joy, c_dt)
                t_next_ctrl += ctrl_dt
                ctrl_steps += 1
        return {
            "frames": n_frames,
            "ctrl_steps": ctrl_steps,
            "ring_dropped": self.ring.dropped,
            "final_root": np.asarray(mock.ps.root_pos).tolist(),
            "nan": bool(np.isnan(np.asarray(mock.ps.root_pos)).any()),
        }

    def close(self) -> None:
        self.sock.close()
