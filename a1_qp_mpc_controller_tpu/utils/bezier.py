"""Degree-4 Bezier swing-foot trajectory (reference: BezierUtils,
utils/Utils.cpp:64-107).

Control-point layout per axis: {start, start, final, final, final}, with the
z-axis lifted at P1 by FOOT_SWING_CLEARANCE1 and at P2 by
FOOT_SWING_CLEARANCE2 + 0.5*sin(terrain_pitch) (Utils.cpp:87-94). Evaluated
in closed form — vectorizes over legs, axes, and scenario batch at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from a1_qp_mpc_controller_tpu.config import (
    FOOT_SWING_CLEARANCE1, FOOT_SWING_CLEARANCE2,
)

_BINOM = (1.0, 4.0, 6.0, 4.0, 1.0)


def bezier_curve(t: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a degree-4 Bernstein polynomial.

    t: (...,) in [0,1]; points: (..., 5) control points. Returns (...,).
    """
    t = t[..., None]
    i = jnp.arange(5, dtype=points.dtype)
    coeff = jnp.asarray(_BINOM, points.dtype)
    basis = coeff * (t ** i) * ((1.0 - t) ** (4.0 - i))
    return jnp.sum(basis * points, axis=-1)


def swing_foot_pos(t: jnp.ndarray, foot_pos_start: jnp.ndarray,
                   foot_pos_final: jnp.ndarray,
                   terrain_pitch_angle: jnp.ndarray = 0.0) -> jnp.ndarray:
    """Swing-foot position at phase ``t``.

    t: (...,) spline phase; foot_pos_start/final: (..., 3). Returns (..., 3).
    """
    s, f = foot_pos_start, foot_pos_final
    # (..., 3, 5) control points
    pts = jnp.stack([s, s, f, f, f], axis=-1)
    lift1 = jnp.zeros_like(s[..., 0])
    lift2 = jnp.zeros_like(s[..., 0])
    z1 = pts[..., 2, 1] + FOOT_SWING_CLEARANCE1 + lift1
    z2 = (pts[..., 2, 2] + FOOT_SWING_CLEARANCE2
          + 0.5 * jnp.sin(terrain_pitch_angle) + lift2)
    pts = pts.at[..., 2, 1].set(z1)
    pts = pts.at[..., 2, 2].set(z2)
    return bezier_curve(t[..., None], pts)
