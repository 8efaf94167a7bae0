"""Parametric terrain height field.

The reference closes its loop against Gazebo worlds (flat ground, slopes up
to 30 deg, the ``stairs_single`` 9 cm staircase — README.md:26-27,154). Here
terrain is one traced height function covering all three families, so
terrain parameters can be domain-randomized per scenario under ``vmap``:

    z(x, y) = tan(pitch) * clamp(x - slope_start, 0, slope_len)
            + step_height * floor(clamp(x - stairs_start, 0, ...) / step_len)

Flat ground is pitch = 0, step_height = 0.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Terrain(struct.PyTreeNode):
    pitch: jnp.ndarray         # () slope angle (rad), z rises along +x
    slope_start: jnp.ndarray   # () x where the slope begins
    slope_len: jnp.ndarray     # () slope run length along x
    step_height: jnp.ndarray   # () staircase riser (m)
    step_len: jnp.ndarray      # () staircase tread (m)
    stairs_start: jnp.ndarray  # () x where stairs begin
    n_steps: jnp.ndarray       # () number of risers

    @classmethod
    def flat(cls, dtype=jnp.float32) -> "Terrain":
        z = lambda v=0.0: jnp.asarray(v, dtype)
        return cls(pitch=z(), slope_start=z(), slope_len=z(),
                   step_height=z(), step_len=z(1.0), stairs_start=z(),
                   n_steps=z())

    @classmethod
    def slope(cls, pitch_rad: float, start: float = 0.5,
              length: float = 10.0, dtype=jnp.float32) -> "Terrain":
        return cls.flat(dtype).replace(
            pitch=jnp.asarray(pitch_rad, dtype),
            slope_start=jnp.asarray(start, dtype),
            slope_len=jnp.asarray(length, dtype))

    @classmethod
    def stairs(cls, step_height: float = 0.09, step_len: float = 0.25,
               start: float = 0.5, n_steps: float = 8.0,
               dtype=jnp.float32) -> "Terrain":
        return cls.flat(dtype).replace(
            step_height=jnp.asarray(step_height, dtype),
            step_len=jnp.asarray(step_len, dtype),
            stairs_start=jnp.asarray(start, dtype),
            n_steps=jnp.asarray(n_steps, dtype))


def height(t: Terrain, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Terrain height z(x, y); broadcasts over x/y."""
    run = jnp.clip(x - t.slope_start, 0.0, t.slope_len)
    z_slope = jnp.tan(t.pitch) * run
    tread = jnp.clip(jnp.floor(
        jnp.maximum(x - t.stairs_start, 0.0) / jnp.maximum(t.step_len, 1e-6)),
        0.0, t.n_steps)
    z_stairs = t.step_height * tread
    return z_slope + z_stairs + 0.0 * y
