"""Checkpoint / resume for controller + simulation state.

The reference has none (SURVEY.md §5: all state transient, "resume" =
re-run and let the lazy inits warm up). Here the whole loop state —
controller blackboard, solver/filter memory, EKF carry, plant state,
randomized params — is one pytree, so snapshotting is a flat npz write and
resume is exact (bitwise state restoration, batched or single-scenario).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def save(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (shapes/dtypes validated)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(jnp.shape(ref)):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != {jnp.shape(ref)}")
        out.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def roundtrip_equal(a: Any, b: Any) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(la, lb))
