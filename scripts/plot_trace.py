"""Render a rollout trace (.npz from `sim --trace-out` /
telemetry.save_npz) into a diagnostic figure — the offline counterpart
of the reference's ~20 rviz debug topics (swing path markers, foot-pose
errors, estimated odometry, terrain angle; A1RobotControl.cpp:60-146).

    python -m a1_qp_mpc_controller_tpu sim --cpu --seconds 4 \
        --trace-out /tmp/trot.npz
    python scripts/plot_trace.py /tmp/trot.npz /tmp/trot.png
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: plot_trace.py TRACE.npz [OUT.png]")
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path + ".png"

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = np.load(path)
    t = np.arange(z["root_pos"].shape[0]) * 0.0025
    leg_names = ["FL", "FR", "RL", "RR"]

    fig, ax = plt.subplots(3, 2, figsize=(13, 10), sharex=True)

    a = ax[0, 0]
    a.plot(t, z["root_pos"][:, 2], label="true z")
    if "est_root_pos" in z:
        a.plot(t, z["est_root_pos"][:, 2], "--", label="EKF z")
    a.set_ylabel("body height [m]")
    a.legend(loc="best", fontsize=8)

    a = ax[0, 1]
    a.plot(t, z["root_pos"][:, 0], label="x")
    a.plot(t, z["root_pos"][:, 1], label="y")
    if "root_lin_vel" in z:
        a.plot(t, z["root_lin_vel"][:, 0], ":", label="vx")
    a.set_ylabel("position / velocity")
    a.legend(loc="best", fontsize=8)

    a = ax[1, 0]
    for i in range(4):
        a.plot(t, z["foot_forces_grf"][:, i, 2], label=leg_names[i],
               lw=0.8)
    a.set_ylabel("commanded Fz [N] (body)")
    a.legend(loc="best", fontsize=8, ncol=4)

    a = ax[1, 1]
    if "foot_force_sensor" in z:
        for i in range(4):
            a.plot(t, z["foot_force_sensor"][:, i], lw=0.8,
                   label=leg_names[i])
        a.set_ylabel("ground normal [N] (sensor)")
        a.legend(loc="best", fontsize=8, ncol=4)

    a = ax[2, 0]
    if "swing_err" in z:
        for i in range(4):
            sw = ~z["contacts"][:, i]
            e = np.where(sw, z["swing_err"][:, i], np.nan)
            a.plot(t, 100.0 * e, lw=0.8, label=leg_names[i])
        a.set_ylabel("swing tracking err [cm]")
        a.legend(loc="best", fontsize=8, ncol=4)
    a.set_xlabel("t [s]")

    a = ax[2, 1]
    c = z["contacts"].astype(float)
    for i in range(4):
        a.fill_between(t, i, i + 0.9 * c[:, i], step="pre", alpha=0.7)
    a.set_yticks([0.45, 1.45, 2.45, 3.45], leg_names)
    a.set_ylabel("contact")
    a.set_xlabel("t [s]")

    fig.suptitle(path)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
