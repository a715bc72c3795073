"""Exact checkpoint/restore of solver state.

The solver carry is a flat pytree of arrays (static shapes), so persistence
is a plain npz round-trip — no framework needed, and restore is bit-exact.
(The reference has no solver checkpointing; its experiments persist finished
results with Julia Serialization, /root/reference/experiments/experiment_common.jl:115-143.)
"""
from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

__all__ = ["save_carry", "load_carry"]


def save_carry(path: str, carry) -> None:
    leaves = jax.tree.leaves(carry)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    # atomic write: dump to a temp file in the same dir, then rename
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_carry(path: str, template):
    """Restore a carry saved by save_carry; `template` supplies the pytree
    structure (e.g. a freshly initialized carry for the same problem/config)."""
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as z:
        loaded = [z[f"leaf_{i}"] for i in range(len(leaves))]
    for i, (a, b) in enumerate(zip(loaded, leaves)):
        if a.shape != b.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != expected {b.shape} — "
                "checkpoint was written for a different problem size/config"
            )
    return jax.tree.unflatten(treedef, loaded)
