"""Golden-trajectory gate (short CI version of the BASELINE 10 s gate —
run the full one via `python -m a1_qp_mpc_controller_tpu.runtime.golden`)."""

from a1_qp_mpc_controller_tpu.runtime.golden import run_gate


def test_force_trajectory_matches_f64_reference_adaptive():
    """Adaptive (early-exit) solver mode: every in-loop solve tracks the
    f64 exact optimum to sub-Newton accuracy, including contact-flip
    ticks — the parity mode vs the reference's OSQP-to-tolerance solves."""
    rep = run_gate(seconds=2.0, sample_every=40, verbose=False)
    assert not rep["nan"]
    assert rep["samples"] >= 10
    # 1.5 N ceiling: the MPC cost is near-flat in internal-force
    # directions (r_weights ~1e-7 — a preserved reference quirk), so at
    # the f32 residual noise floor (|Ax| ~ 1e2 N x f32 eps ~ 1e-5) a
    # converged solve determines forces only to ~1.4 N there; the
    # reference's OSQP at its default eps 1e-3 leaves far more slack.
    assert rep["max_dev_N"] < 1.5
    assert rep["mean_dev_N"] < 0.3
    assert rep["frac_within_tol"] == 1.0


def test_force_trajectory_fixed_mode_steady_state():
    """Fixed lock-step mode (batched throughput path): solves track the
    f64 optimum through contact flips. The swing-variable elimination +
    per-pattern equilibration + per-instance cost scaling (round 3) cut
    the flip-tick transient from ~110 N to < 7 N at this budget, so the
    gate is tight: >= 95% of sampled solves within 2 N, p95 < 10 N."""
    rep = run_gate(seconds=2.0, sample_every=37, verbose=False,
                   solver_mode="fixed", mpc_iters=50)
    assert not rep["nan"]
    assert rep["frac_within_tol"] >= 0.95
    assert rep["p95_dev_N"] < 10.0
    assert rep["max_dev_N"] < 20.0


def test_force_trajectory_fixed_mode_on_slope():
    """The fixed lock-step solver tracks the f64 optimum on sloped
    terrain too (terrain adaptation active, pitched reference): the
    solver-parity story is not a flat-ground artifact."""
    from a1_qp_mpc_controller_tpu.sim import terrain as terrain_mod

    rep = run_gate(seconds=2.0, sample_every=41, verbose=False,
                   solver_mode="fixed", mpc_iters=50,
                   terrain=terrain_mod.Terrain.slope(0.15))
    assert not rep["nan"]
    assert rep["frac_within_tol"] >= 0.9
    assert rep["p95_dev_N"] < 10.0


def test_stand_qp_force_trajectory_both_modes():
    """The 12-var stand-QP path (the reference's headline 500 Hz balance
    controller) gets its own golden gate: both the adaptive mode and the
    batched fixed mode (warm-started adaptive-core solve) track the f64
    optimum through a gazebo_qp trot."""
    for mode in ("adaptive", "fixed"):
        rep = run_gate(seconds=1.5, sample_every=43, verbose=False,
                       profile="gazebo_qp", solver_mode=mode,
                       mpc_iters=50)
        assert not rep["nan"], mode
        assert rep["frac_within_tol"] == 1.0, (mode, rep)
        assert rep["max_dev_N"] < 1.5, (mode, rep)


def test_stand_qp_lockstep_batched_gate_dense():
    """The LOCK-STEP batched stand-QP route (fixed 100-iteration budget
    + gathered rho-refactored flip rescue, parallel.batched.
    batched_stand_control_tick) tracks the f64 optimum at EVERY tick of
    a closed-loop gazebo_qp trot with staggered gait phases — dense
    per-tick sampling, not the sparse windows that used to hide
    post-flip transients (round-4 finding: flip-tick warm starts
    satisfied the 1e-4 tolerance ~10 N off; cold-restart-on-flip +
    rescue fixed it)."""
    from a1_qp_mpc_controller_tpu.runtime.golden import (
        run_stand_batched_gate,
    )

    rep = run_stand_batched_gate(seconds=1.0, sample_every=2, batch=3)
    assert not rep["nan"]
    assert rep["samples"] >= 300
    assert rep["frac_within_tol"] == 1.0, rep
    assert rep["max_dev_N"] < 1.0, rep
