"""Telemetry / observability.

The reference's observability bus is ~30 ROS topics + raw stdout
(SURVEY.md §5). Here telemetry is the rollout's :class:`Trace` pytree; this
module turns traces into summaries, JSONL streams, and npz archives, and
wraps the JAX profiler for device-level tracing.
"""

from __future__ import annotations

import contextlib
import json
from typing import IO, Iterator

import numpy as np
import jax


def summarize_trace(trace) -> dict:
    """Headline statistics of a closed-loop Trace (batched or not)."""
    rp = np.asarray(trace.root_pos)
    eu = np.asarray(trace.root_euler_est)
    f = np.asarray(trace.foot_forces_grf)
    return {
        "ticks": int(rp.shape[0]),
        "nan": bool(np.isnan(rp).any()),
        "final_pos": rp[-1].tolist(),
        "height_mean": float(rp[..., 2].mean()),
        "height_std": float(rp[..., 2].std()),
        "roll_max": float(np.abs(eu[..., 0]).max()),
        "pitch_max": float(np.abs(eu[..., 1]).max()),
        "fz_max": float(f[..., 2].max()),
        "fz_mean_total": float(f[..., 2].sum(-1).mean()),
        "speed_mean": float(np.asarray(
            trace.root_lin_vel)[..., 0].mean()),
    }


def write_jsonl(trace, fp: IO[str], every: int = 1) -> int:
    """Stream per-tick rows as JSON lines (the ROS-topic replacement)."""
    rp = np.asarray(trace.root_pos)
    eu = np.asarray(trace.root_euler_est)
    f = np.asarray(trace.foot_forces_grf)
    c = np.asarray(trace.contacts)
    n = 0
    for t in range(0, rp.shape[0], every):
        fp.write(json.dumps({
            "t": t,
            "pos": np.round(rp[t], 5).tolist(),
            "rpy": np.round(eu[t], 5).tolist(),
            "fz": np.round(f[t, :, 2], 2).tolist(),
            "contacts": c[t].astype(int).tolist(),
        }) + "\n")
        n += 1
    return n


def save_npz(trace, path: str) -> None:
    arrays = {k: np.asarray(v) for k, v in
              ((f.name, getattr(trace, f.name))
               for f in trace.__dataclass_fields__.values())}
    np.savez_compressed(path, **arrays)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """JAX profiler trace (view with TensorBoard / xprof) — the structured
    replacement for the reference's chrono-print spans
    (A1RobotControl.cpp:428-437)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
