"""Solver-state checkpointing (save / resume).

The reference's checkpoint/resume story (SURVEY.md §5.4) is database
recycling (``populated_db``) plus JLD2 saves of benchmark partials. Here the
whole :class:`SolverState` is one pytree of arrays, so checkpointing is a
flat ``.npz`` save/load (orbax works equally well for users who want async
multi-host checkpointing — the state is a standard pytree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state) -> None:
    """Save any solver-state pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, template):
    """Load a pytree saved by :func:`save_state`; ``template`` supplies the
    structure (e.g. a freshly initialized state of the same solver)."""
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    leaves = [
        jnp.asarray(data[f"leaf_{i}"], t_leaves[i].dtype)
        for i in range(len(t_leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
