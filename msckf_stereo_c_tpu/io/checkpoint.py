"""State checkpointing: save/restore the full engine state.

The reference has no checkpoint/resume — a run always starts from scratch
and outputs are append-only text files (SURVEY.md §5).  Here every piece of
engine state (filter, tracker, pyramids, timing) is a pytree of arrays, so
checkpointing is generic: flatten with paths, store as npz, restore into
the same treedef.  Works for FilterState, VioState, batched multi-sequence
states, BA problems — anything the engine carries."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state: Any) -> None:
    """Serialize any pytree-of-arrays to an .npz file."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for kp, leaf in leaves:
        arrays[_path_str(kp)] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_state into ``template``'s structure
    (shapes/dtypes follow the template; a mismatch raises)."""
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for kp, leaf in leaves_t:
        key = _path_str(kp)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        if tuple(arr.shape) != tuple(jnp.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template {jnp.shape(leaf)}"
            )
        out.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), out
    )
