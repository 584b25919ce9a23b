"""Solver-state serialization helpers.

The whole solver state is one pytree (`LBFGSState` / `LBFGSBState`), so
checkpointing needs no framework: these helpers flatten to / restore from
a plain ``dict[str, np.ndarray]`` suitable for ``np.savez``, orbax, or any
blob store.  Restore is bit-exact (tests/test_solver_api.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def state_to_arrays(state) -> dict:
    """Flatten a solver state pytree into ``{leaf_path: np.ndarray}``."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_state(path: str, state) -> None:
    """``np.savez`` the state (path should end in .npz)."""
    np.savez(path, **state_to_arrays(state))


def load_state(path: str, like):
    """Restore a state saved by :func:`save_state`.

    ``like`` is a template state with the same structure (e.g. from
    ``solver.init`` on dummy data of the right shapes/dtypes).
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path_)
        arr = jnp.asarray(data[key], dtype=leaf.dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
