"""Moving-window average filter as a fixed-size ring buffer pytree.

TPU-native re-design of the reference's deque-based ``MovingWindowFilter``
(utils/filter.hpp:14-63): the deque becomes a static-shape ring buffer living
in the ``lax.scan`` carry, and the Neumaier-compensated running sum is kept so
the numerics match the reference's O(1) update (important in float32, where a
naive running sum over 100-sample windows drifts).

A single :class:`WindowFilter` handles an arbitrary channel shape, so e.g. all
12 recent-contact channels (4 legs x xyz, window 60) update in one vector op.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class WindowFilter(struct.PyTreeNode):
    buf: jnp.ndarray    # (*channels, N) ring buffer
    idx: jnp.ndarray    # () int32 next write position
    count: jnp.ndarray  # () int32 number of valid samples (<= N)
    acc: jnp.ndarray    # (*channels,) Neumaier running sum
    corr: jnp.ndarray   # (*channels,) Neumaier correction term


def make_filter(channel_shape: Tuple[int, ...], window: int,
                dtype=jnp.float32) -> WindowFilter:
    return WindowFilter(
        buf=jnp.zeros(channel_shape + (window,), dtype),
        idx=jnp.int32(0),
        count=jnp.int32(0),
        acc=jnp.zeros(channel_shape, dtype),
        corr=jnp.zeros(channel_shape, dtype),
    )


def _neumaier_add(acc, corr, value):
    new_acc = acc + value
    # |acc| >= |value|: low-order digits of value are lost, else of acc
    corr = corr + jnp.where(
        jnp.abs(acc) >= jnp.abs(value),
        (acc - new_acc) + value,
        (value - new_acc) + acc,
    )
    return new_acc, corr


def filter_update(f: WindowFilter, x: jnp.ndarray
                  ) -> Tuple[WindowFilter, jnp.ndarray]:
    """Push one sample (shape = channel shape) and return (new filter, avg).

    Average is over min(count+1, N) samples, matching the reference's
    behavior while the deque is still filling (filter.hpp:40-62).
    """
    window = f.buf.shape[-1]
    x = jnp.asarray(x, f.buf.dtype)
    full = f.count >= window
    old = f.buf[..., f.idx]
    # subtract the evicted sample (zero contribution while not yet full)
    delta = x - jnp.where(full, old, jnp.zeros_like(old))
    acc, corr = _neumaier_add(f.acc, f.corr, delta)
    buf = f.buf.at[..., f.idx].set(x)
    idx = jnp.where(f.idx + 1 >= window, 0, f.idx + 1).astype(jnp.int32)
    count = jnp.minimum(f.count + 1, window).astype(jnp.int32)
    avg = (acc + corr) / count.astype(f.buf.dtype)
    return WindowFilter(buf=buf, idx=idx, count=count, acc=acc, corr=corr), avg


def filter_update_masked(f: WindowFilter, x: jnp.ndarray, push: jnp.ndarray
                         ) -> Tuple[WindowFilter, jnp.ndarray]:
    """Conditionally push: when ``push`` (scalar bool) is False, the filter
    state is unchanged and the current average is returned (matching the
    reference pattern of only calling CalculateAverage under a condition,
    e.g. recent-contact positions only while the foot touches ground —
    A1RobotControl.cpp:274-281)."""
    f2, avg2 = filter_update(f, x)
    f_out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(push, new, old), f2, f)
    cur_avg = (f.acc + f.corr) / jnp.maximum(f.count, 1).astype(f.buf.dtype)
    avg = jnp.where(push, avg2, cur_avg)
    return f_out, avg


# per-leg independent filters: every field carries a leading (legs,) axis
filter_update_per_leg = jax.vmap(filter_update_masked)


def make_filter_bank(n: int, channel_shape: Tuple[int, ...], window: int,
                     dtype=jnp.float32) -> WindowFilter:
    """n independent filters (leading batch axis on every field), for use
    with :func:`filter_update_per_leg`."""
    f = make_filter(channel_shape, window, dtype)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), f)
