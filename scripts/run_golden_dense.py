"""Regenerate GOLDEN_REPORT.json with DENSE per-tick sampling.

Round-3 reports sampled every 40-50 ticks (72-98 samples per 10 s run),
which misses the post-flip transient window entirely — flip ticks are
exactly where fixed-budget solves are hardest. This runs the force-
trajectory gates at sample_every=1 (~3,600 samples per mode over the
10 s trot) for:

- adaptive mode (solver parity vs the reference's OSQP-to-tolerance),
- the SHIPPED fixed-budget config (25 iterations + 150-iteration
  rho-refactored flip+cooldown rescue — what bench.py measures),
- fixed 50 iterations (round-3 continuity point),
- the stand-QP path in both modes, plus the lock-step batched stand
  route (fixed 100 + gathered fixed-budget rho-refactored rescue).

    python scripts/run_golden_dense.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = [a.split("=", 1)[1] for a in sys.argv[1:]
            if a.startswith("--only=")]
    out_path = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GOLDEN_REPORT.json")

    from a1_qp_mpc_controller_tpu.runtime.golden import (
        run_gate, run_stand_batched_gate,
    )

    # --only=key,... : regenerate just those entries, keep the rest of
    # an existing report (partial refresh after a targeted change)
    report = {}
    if only:
        only = [s for k in only for s in k.split(",")]
        try:
            with open(out_path) as f:
                report = json.load(f)
        except (OSError, ValueError):
            pass

    def want(k):
        return not only or k in only

    def log(k, rep):
        print(f"{k}: {rep}", flush=True)
        report[k] = rep

    if want("adaptive"):
        rep = run_gate(seconds=10.0, sample_every=1, verbose=False,
                       mpc_iters=1000)
        rep["config"] = ("gazebo_mpc flat trot 0.3 m/s, adaptive solver "
                         "(max 1000 it; OSQP's default budget is 4000), "
                         "10 s, DENSE per-tick sampling")
        log("adaptive", rep)

    if want("fixed_25it_rescue"):
        rep = run_gate(seconds=10.0, sample_every=1, verbose=False,
                       solver_mode="fixed", mpc_iters=25,
                       rescue_iters=150,
                       cooldown_ticks=32, cooldown_stride=4,
                       cooldown_dense=12, drift_rescue_n=0.5,
                       ref_fidelity_baseline=True)
        rep["config"] = ("gazebo_mpc flat trot 0.3 m/s, SHIPPED bench "
                         "config: fixed 25 it + 150-it flip rescue over "
                         "the STRIDED 32-tick cooldown window (dense "
                         "12, then every 4th tick) + 0.5 N drift-"
                         "predictive trigger (round 5), 10 s, DENSE "
                         "per-tick sampling")
        log("fixed_25it_rescue", rep)

    if want("fixed_50it"):
        rep = run_gate(seconds=10.0, sample_every=1, verbose=False,
                       solver_mode="fixed", mpc_iters=50)
        rep["config"] = ("gazebo_mpc flat trot 0.3 m/s, fixed 50 it "
                         "(round-3 continuity), 10 s, DENSE per-tick "
                         "sampling")
        log("fixed_50it", rep)

    for mode in ("adaptive", "fixed"):
        if not want(f"stand_{mode}"):
            continue
        rep = run_gate(seconds=5.0, sample_every=1, verbose=False,
                       profile="gazebo_qp", solver_mode=mode,
                       mpc_iters=50)
        rep["config"] = (f"gazebo_qp stand-QP trot, {mode} mode, 5 s, "
                         "DENSE per-tick sampling")
        log(f"stand_{mode}", rep)

    if want("stand_lockstep_batched"):
        rep = run_stand_batched_gate(seconds=5.0, sample_every=1,
                                     batch=3)
        rep["config"] = ("gazebo_qp stand-QP trot, LOCK-STEP batched "
                         "route (fixed 100 it + gathered rho-refactored "
                         "rescue), 3 staggered scenarios, 5 s, DENSE "
                         "per-tick sampling")
        log("stand_lockstep_batched", rep)

    report["ground_truth"] = ("float64 ADMM (ops/qp_ref) solved to 1e-9 "
                              "residuals + KKT-verified")
    report["solver"] = ("swing-eliminated family + per-pattern Ruiz + "
                        "per-instance cost rescale (round 3); cold-"
                        "restart-on-flip stand warm start + flip "
                        "rescue passes (round 4)")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
