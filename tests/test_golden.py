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
    assert rep["max_dev_N"] < 1.0
    assert rep["mean_dev_N"] < 0.3
    assert rep["frac_within_tol"] == 1.0


def test_force_trajectory_fixed_mode_steady_state():
    """Fixed lock-step mode (batched throughput path): steady-phase solves
    match tightly; the 1-3 ticks right after a contact flip are allowed a
    transient (the dual warm start is invalidated by the changed equality
    rows and the fixed budget can't iterate to tolerance) — the closed loop
    is stable through them and recovers within ~20 ticks."""
    rep = run_gate(seconds=2.0, sample_every=37, verbose=False,
                   solver_mode="fixed", mpc_iters=50)
    assert not rep["nan"]
    # majority of sampled solves within tolerance; transients bounded
    assert rep["frac_within_tol"] >= 0.7
    assert rep["p95_dev_N"] < 120.0
