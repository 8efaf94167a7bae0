"""Diagnose the golden-gate tail of the shipped fixed-budget config.

Round-4 verdict residual (b): the 25-it + 150-it-rescue config ships 13
of 3600 ticks beyond 2 N from the f64 optimum (max 6.2 N), sitting 7-28
ticks after contact flips — outside the 4-tick rescue cooldown. This
probe reruns the dense 10 s trot and records, for EVERY tick: the force
deviation vs the f64 optimum, ticks since the last contact flip, whether
the rescue fired, and the shipped solution's f64 KKT residuals — to find
a trigger signal that catches the offenders without an always-on tail.

    python scripts/probe_golden_tail.py [out.npz]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np


def main():
    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.control.controller import control_tick_jit
    from a1_qp_mpc_controller_tpu.ops import qp_ref
    from a1_qp_mpc_controller_tpu.runtime.golden import rebuild_mpc_qp
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
    from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--polish-every", type=int, default=0)
    ap.add_argument("--polish-iters", type=int, default=0)
    ap.add_argument("--extrapolate", type=float, default=0.0)
    ap.add_argument("--cooldown", type=int, default=4)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--every", type=int, default=1,
                    help="audit every N-th tick in [t0, t1]")
    ap.add_argument("--dense", type=int, default=4)
    ap.add_argument("--drift", type=float, default=0.0)
    ap.add_argument("--t0", type=int, default=0,
                    help="first tick to f64-audit")
    ap.add_argument("--t1", type=int, default=10 ** 9,
                    help="last tick to f64-audit")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/golden_tail.npz")
    cli = ap.parse_args()

    cfg, params = load_profile("gazebo_mpc")
    cfg = dataclasses.replace(cfg, mpc_qp_iters=25,
                              mpc_solver_mode="fixed",
                              mpc_rescue_iters=150,
                              mpc_polish_every=cli.polish_every,
                              mpc_polish_iters=cli.polish_iters,
                              mpc_warm_extrapolate=cli.extrapolate,
                              mpc_cooldown_ticks=cli.cooldown,
                              mpc_cooldown_stride=cli.stride,
                              mpc_cooldown_dense=cli.dense,
                              mpc_drift_rescue_n=cli.drift)
    terr = terrain_mod.Terrain.flat()
    seconds, walk_after_s = cli.seconds, 1.0
    n_steps = int(seconds / cfg.control_dt)
    walk_after = int(walk_after_s / cfg.control_dt)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=0.3)
    carry = cl.make_standing_start(cfg, params, terr)
    dt = jnp.float32(cfg.control_dt)

    cs, mem, ps = carry.cs, carry.mem, carry.ps
    prev = carry.prev_root_lin_vel
    prev_contacts = np.asarray(cs.contacts)
    ticks_since_flip = 10_000

    rows = []
    for t in range(n_steps):
        j = jtu.tree_map(lambda a: a[t], joy)
        sensors = plant_mod.read_sensors(params, ps, prev, dt)
        cs, mem, tq = control_tick_jit(cfg, params, cs, mem, sensors, j,
                                       dt)
        prev = ps.root_lin_vel
        ps = plant_mod.plant_step(params, terr, ps, tq, dt)
        contacts = np.asarray(cs.contacts)
        if (contacts != prev_contacts).any():
            ticks_since_flip = 0
        else:
            ticks_since_flip += 1
        prev_contacts = contacts
        if t < walk_after or t < cli.t0 or t > cli.t1 \
                or (t - cli.t0) % cli.every:
            continue
        p_mat, q_vec, a_mat, lb, ub = rebuild_mpc_qp(cfg, params, cs, dt)
        p64 = np.asarray(p_mat, np.float64)
        q64 = np.asarray(q_vec, np.float64)
        a64 = np.asarray(a_mat, np.float64)
        l64 = np.asarray(lb, np.float64)
        u64 = np.asarray(ub, np.float64)
        x64, _, _, info = qp_ref.solve_qp_ref(p64, q64, a64, l64, u64,
                                              eps=1e-9)
        f_ref = x64[:12].reshape(4, 3)
        f_ours = (np.asarray(cs.root_rot_mat)
                  @ np.asarray(cs.foot_forces_grf).T)
        dev = np.abs(f_ours.T - f_ref).max()
        # shipped full solution + its f64 KKT residuals
        x = np.asarray(mem.mpc_warm_x, np.float64)
        y = np.asarray(mem.mpc_warm_y, np.float64)
        ax = a64 @ x
        prim_inf = np.maximum(np.maximum(l64 - ax, ax - u64), 0.0).max()
        dual = np.abs(p64 @ x + q64 + a64.T @ y).max()
        # distance of the full first-step x from the optimum
        x_dev = np.abs(x[:12] - x64[:12]).max()
        rows.append((t, dev, x_dev, ticks_since_flip, prim_inf, dual,
                     float(np.abs(x64[:12]).max())))
        if t % 400 == 0:
            print(f"t={t} dev={dev:.3f}", flush=True)

    arr = np.array(rows)
    out = cli.out
    np.savez(out, rows=arr)
    dev = arr[:, 1]
    bad = arr[dev > 2.0]
    print(f"\nsamples={len(arr)} frac>2N={(dev > 2).mean():.4f} "
          f"max={dev.max():.2f}")
    print("offenders (t, dev, x_dev, since_flip, prim_inf, dual, |f*|):")
    for r in bad:
        print(f"  t={int(r[0]):4d} dev={r[1]:5.2f} x_dev={r[2]:5.2f} "
              f"since_flip={int(r[3]):3d} prim={r[4]:.2e} "
              f"dual={r[5]:.2e} fmax={r[6]:.0f}")
    # what threshold on the f64 dual residual separates the offenders?
    ok = arr[dev <= 2.0]
    for q in (0.5, 0.9, 0.99, 1.0):
        print(f"  ok dual q{q}: {np.quantile(ok[:, 5], q):.3e}")
    if len(bad):
        print(f"  bad dual min: {bad[:, 5].min():.3e}")
        print(f"  bad prim min: {bad[:, 4].min():.3e}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
