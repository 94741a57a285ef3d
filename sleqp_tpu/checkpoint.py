"""Checkpoint/resume of solver state.

The reference has no checkpointing (SURVEY.md §5.4: closest is
sleqp_solver_reset + warm LP bases).  Here the complete solver state is a
small fixed-shape pytree, so saving and resuming is exact: a resumed solve
continues bit-for-bit where it stopped — including trust radii, penalty,
LP warm-start basis, quasi-Newton memory, and step-rule history.

Uses orbax-checkpoint when available, with a numpy .npz fallback.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .problem_solver import SolverState


def save_state(state: SolverState, path: str) -> None:
    """Save a SolverState to ``path`` (directory for orbax, file for npz)."""
    try:
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(os.path.abspath(path), state, force=True)
        checkpointer.wait_until_finished()
        return
    except Exception:
        pass
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        *[np.asarray(leaf) for leaf in leaves],
    )


def load_state(template: SolverState, path: str) -> SolverState:
    """Load a SolverState; ``template`` supplies structure and dtypes."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            checkpointer = ocp.StandardCheckpointer()
            return checkpointer.restore(os.path.abspath(path), template)
    except Exception:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [
        jax.numpy.asarray(data[f"arr_{i}"], dtype=leaf.dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
