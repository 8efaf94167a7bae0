"""Dense golden gate for the BATCHED amortized solver route, ON TPU.

The single-scenario gates in GOLDEN_REPORT.json certify the per-solve
schedule; the round-5 production route (kkt_backend='amortized') is
batched-only and APPROXIMATE in its x-update preconditioner (carried
KKT inverse + truncated-Neumann correction for stale scenarios), so it
gets its own closed-loop force gate: a staggered-phase scenario batch
runs the EXACT bench solver schedule (compiled Pallas kernels on the
real chip, bench._tick_kwargs settings with capacities scaled to the
small batch so staleness ages match production), every tick's QP is
re-solved in float64 on the host (parallel worker pool), and the
per-scenario first-step force deviation is gated at 2 N.

Writes the result into GOLDEN_REPORT.json under "amortized_batched".

    python scripts/run_golden_amortized.py [--seconds 2.5] [--batch 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _solve_one(args):
    import numpy as np

    from a1_qp_mpc_controller_tpu.ops import qp_ref

    p, q, a, lb, ub, f_ours = args
    x64, _, _, _ = qp_ref.solve_qp_ref(p, q, a, lb, ub, eps=1e-9)
    f_ref = x64[:12].reshape(4, 3)
    return float(np.abs(f_ours - f_ref).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sample-every", type=int, default=1)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--rescue-capacity", type=int, default=0,
                    help="override the scaled rescue pool (0 = b//4)")
    ap.add_argument("--rescue-iters", type=int, default=0,
                    help="override the continuation/rescue budget")
    ap.add_argument("--backend", default="amortized",
                    help="bench _tick_kwargs backend (amortized | full "
                         "| gj ...) — non-amortized backends run the "
                         "same gate without a KktCarry, isolating the "
                         "amortization machinery from schedule/instance "
                         "effects")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from a1_qp_mpc_controller_tpu.config import load_profile
    from a1_qp_mpc_controller_tpu.parallel import batched
    from a1_qp_mpc_controller_tpu.runtime.golden import rebuild_mpc_qp
    from a1_qp_mpc_controller_tpu.sim import closed_loop as cl
    from a1_qp_mpc_controller_tpu.sim import plant as plant_mod
    from a1_qp_mpc_controller_tpu.types import JoyCmd
    import bench

    # bench.build() IS the shipped schedule (iters, solver mode, polish
    # cadence) — using it directly keeps this gate in lock-step with
    # what bench.py measures
    cfg, params, *_ = bench.build()
    b = args.batch
    amortized = args.backend == "amortized"
    kw = bench._tick_kwargs(args.backend)
    # scale the capacity knobs to the small batch, PRESERVING the
    # production staleness profile: capacity/batch = 192/1024 ~ 0.19
    # means ages cycle 0..~5; capacity=1 at batch 4-8 ages 0..(b-1),
    # i.e. as stale or STALER than production. Rescue capacity keeps
    # the production 1/8 ratio (min 2).
    kw.update(rescue_capacity=(args.rescue_capacity
                               or max(2, b // 4)),
              admm_block=min(kw["admm_block"], b),
              kkt_block=min(kw["kkt_block"], b))
    if amortized:
        kw.update(kkt_amortize_capacity=max(1, b // 8))
    if args.rescue_iters:
        kw.update(rescue_iters=args.rescue_iters)
    if kw.get("kkt_big_capacity"):
        kw.update(kkt_big_capacity=max(2, b // 4))
    print(f"devices: {jax.devices()}  batch={b}  kwargs={kw}", flush=True)

    pb, terr, carry = batched.make_flat_batch(
        cfg, jax.random.PRNGKey(7), b, params)
    # stagger gait phases so flips hit different ticks per scenario
    offs = jnp.linspace(0.0, 110.0, b)[:, None]
    carry = carry.replace(cs=carry.cs.replace(
        gait_counter=(carry.cs.gait_counter + offs) % 240.0))
    n_steps = int(args.seconds / cfg.control_dt)
    walk_after = int(1.0 / cfg.control_dt)
    joy = cl.joy_schedule(n_steps, walk_after=walk_after, velx=0.3)
    dt = jnp.float32(cfg.control_dt)
    kc = batched.make_kkt_carry(cfg, b)

    @jax.jit
    def tick(carry, kc, j):
        if amortized:
            cr, kc2, stats = batched.batched_closed_loop_step(
                cfg, pb, terr, carry, j, dt, kkt_carry=kc,
                return_stats=True, **kw)
            return cr, kc2, stats
        cr, stats = batched.batched_closed_loop_step(
            cfg, pb, terr, carry, j, dt, return_stats=True, **kw)
        return cr, kc, stats

    jobs = []
    meta = []   # (t, scen, since_flip, age, converged)
    pb_h = jax.device_get(pb)
    cpu0 = jax.devices("cpu")[0]
    prev_contacts = np.asarray(jax.device_get(carry.cs.contacts))
    since_flip = np.full(b, 10_000, np.int64)
    for t in range(n_steps):
        j = jtu.tree_map(lambda a: a[t], joy)
        carry, kc, stats = tick(carry, kc, j)
        cs_contacts = np.asarray(jax.device_get(carry.cs.contacts))
        flipped = (cs_contacts != prev_contacts).any(axis=1)
        since_flip = np.where(flipped, 0, since_flip + 1)
        prev_contacts = cs_contacts
        if t < walk_after or (t - walk_after) % args.sample_every:
            continue
        ages = np.asarray(jax.device_get(kc.age))
        conv = np.asarray(jax.device_get(stats["converged"]))
        cs_h = jax.device_get(carry.cs)
        for i in range(b):
            meta.append((t, i, int(since_flip[i]), int(ages[i]),
                         bool(conv[i])))
        for i in range(b):
            cs_i = jtu.tree_map(lambda a: a[i], cs_h)
            p_i = jtu.tree_map(lambda a: np.asarray(a)[i], pb_h)
            # rebuild on the HOST CPU backend: per-instance TPU
            # dispatches would pay ~28 ms tunnel RTT each
            with jax.default_device(cpu0):
                p_mat, q_vec, a_mat, lb, ub = jax.tree_util.tree_map(
                    np.asarray,
                    rebuild_mpc_qp(cfg, p_i,
                                   jtu.tree_map(jnp.asarray, cs_i),
                                   jnp.float32(cfg.control_dt)))
            f_ours = (np.asarray(cs_i.root_rot_mat)
                      @ np.asarray(cs_i.foot_forces_grf).T).T
            jobs.append((np.asarray(p_mat, np.float64),
                         np.asarray(q_vec, np.float64),
                         np.asarray(a_mat, np.float64),
                         np.asarray(lb, np.float64),
                         np.asarray(ub, np.float64), f_ours))
        if t % 200 == 0:
            print(f"collected t={t}/{n_steps}", flush=True)
    alive = float(jnp.mean((~jnp.isnan(
        carry.ps.root_pos[:, 2])).astype(jnp.float32)))
    print(f"rollout done: {len(jobs)} instances, alive={alive}",
          flush=True)

    with mp.Pool(args.workers) as pool:
        devs = np.array(pool.map(_solve_one, jobs, chunksize=8))

    meta = np.array(meta, dtype=np.int64)    # (N, 5)
    np.savez("/tmp/amortized_gate_detail.npz", meta=meta, devs=devs)
    bad = np.argsort(-devs)[:12]
    print("worst samples (dev, t, scen, since_flip, age, conv):")
    for k in bad:
        print(f"  {devs[k]:7.2f}  t={meta[k][0]:4d} scen={meta[k][1]} "
              f"since_flip={meta[k][2]:4d} age={meta[k][3]:2d} "
              f"conv={bool(meta[k][4])}")

    tol = 2.0
    rep = {
        "samples": int(len(devs)),
        "scenarios": b,
        "max_dev_N": float(devs.max()),
        "mean_dev_N": float(devs.mean()),
        "p95_dev_N": float(np.percentile(devs, 95)),
        "frac_within_tol": float((devs <= tol).mean()),
        "tol_N": tol,
        "alive_frac": alive,
        "config": (f"gazebo_mpc flat trot 0.3 m/s, BATCHED amortized "
                   f"route ON TPU (bench schedule, capacity scaled to "
                   f"batch {b}: ages 0..{b - 1} vs production 0..~5), "
                   f"{args.seconds} s, staggered phases, dense "
                   f"per-tick f64 sampling"),
    }
    print(json.dumps(rep, indent=2), flush=True)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GOLDEN_REPORT.json")
    try:
        with open(out_path) as f:
            report = json.load(f)
    except (OSError, ValueError):
        report = {}
    key = ("amortized_batched" if amortized
           else f"{args.backend}_batched_gate")
    report[key] = rep
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
