"""Decompose the batched 'build' phase (ingest..mpc_problem) on TPU with
scan-based timing. Identifies whether the EKF innovation solve, the
condense/cost GEMMs, or the small-op soup dominates.

    python scripts/profile_build.py --batch 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 10  # on-device repetitions per dispatch


def time_scan(step, init, name, reps=3):
    from a1_qp_mpc_controller_tpu.runtime.profiling import (
        time_scan as _ts,
    )
    return _ts(step, init, repeats=R, reps=reps, name=name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control import fsm, gait, grf, swing
    from a1_qp_mpc_controller_tpu.control.ingest import ingest_sensors
    from a1_qp_mpc_controller_tpu.models import estimator
    from a1_qp_mpc_controller_tpu.parallel.batched import randomize_params
    from a1_qp_mpc_controller_tpu.types import (
        CtrlMem, CtrlState, JoyCmd, SensorData,
    )

    b = args.batch
    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=50, mpc_solver_mode="fixed")
    key = jax.random.PRNGKey(0)
    pb = randomize_params(key, b, params)
    cs = jax.vmap(lambda _: CtrlState.init(cfg, params))(jnp.arange(b))
    cs = cs.replace(
        root_pos=jnp.concatenate(
            [jax.random.uniform(key, (b, 2), minval=-0.05, maxval=0.05),
             jnp.full((b, 1), 0.3)], axis=1),
        foot_pos_abs=jnp.broadcast_to(params.default_foot_pos, (b, 4, 3)),
        contacts=jnp.broadcast_to(jnp.array([True, False, False, True]),
                                  (b, 4)))
    mem = jax.vmap(lambda _: CtrlMem.init(cfg, params))(jnp.arange(b))
    sensors = jax.vmap(lambda _: SensorData.zeros())(jnp.arange(b))
    sensors = sensors.replace(
        root_quat=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, 4)),
        foot_force=jnp.full((b, 4), 60.0))
    joy = JoyCmd.zeros().replace(ctrl_state=jnp.int32(1),
                                 velx=jnp.float32(0.3))
    dt = jnp.float32(cfg.control_dt)
    print(f"batch={b} device={jax.devices()[0]} (scan x{R})")

    def vm(f):
        return jax.vmap(f)

    def ingest_step(c):
        cs, mem = c
        cs, mem = vm(lambda p, c1, m1, s: ingest_sensors(cfg, p, c1, m1, s)
                     )(pb, cs, mem, sensors)
        return cs, mem
    time_scan(ingest_step, (cs, mem), "ingest_sensors")

    def fsm_gait_step(c):
        cs = c
        cs = vm(lambda p, c1: fsm.joystick_update(cfg, p, c1, joy, dt)
                )(pb, cs)
        cs = vm(lambda p, c1: gait.update_plan(cfg, p, c1, dt))(pb, cs)
        return cs
    time_scan(fsm_gait_step, cs, "fsm + gait")

    def swing_step(c):
        cs, mem = c
        cs, mem = vm(lambda p, c1, m1: swing.generate_swing_legs_ctrl(
            cfg, p, c1, m1, dt))(pb, cs, mem)
        return cs, mem
    time_scan(swing_step, (cs, mem), "swing ctrl")

    def ekf_step(c):
        cs, ekf = c
        ekf, cs = vm(lambda p, c1, e1: estimator.step(cfg, p, c1, e1, dt)
                     )(pb, cs, ekf)
        return cs, ekf
    time_scan(ekf_step, (cs, mem.ekf), "EKF step")

    def terrain_step(c):
        cs, mem = c
        cs, mem = vm(lambda c1, m1: grf.terrain_adaptation(cfg, c1, m1)
                     )(cs, mem)
        return cs, mem
    time_scan(terrain_step, (cs, mem), "terrain adaptation")

    def prob_step(c):
        cs, mem = c
        prob = vm(lambda p, c1, m1: grf.mpc_problem(
            cfg, p, c1, m1, dt, with_a_mat=False))(pb, cs, mem)
        cs = cs.replace(root_pos=cs.root_pos + 0.0 * prob.q_vec[:, :3])
        return cs, mem
    time_scan(prob_step, (cs, mem), "mpc_problem (condense+cost+bounds)")


if __name__ == "__main__":
    main()
