"""Golden-trajectory gate (short CI version of the BASELINE 10 s gate —
run the full one via `python -m a1_qp_mpc_controller_tpu.runtime.golden`)."""

from a1_qp_mpc_controller_tpu.runtime.golden import run_gate


def test_force_trajectory_matches_f64_reference():
    rep = run_gate(seconds=2.0, sample_every=40, verbose=False)
    assert not rep["nan"]
    assert rep["samples"] >= 10
    # f32 in-loop solves track the f64 exact optimum to sub-Newton level
    assert rep["max_dev_N"] < 1.0
    assert rep["mean_dev_N"] < 0.3
    assert rep["frac_within_tol"] == 1.0
