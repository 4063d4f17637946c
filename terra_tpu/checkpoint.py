"""Checkpoint / resume of progressive renders and optimization loops.

The reference has no checkpointing; its resume mechanism is the
accumulation plane itself (acc + samples per pixel, /root/reference/
include/Terra.h:183-186, Terra.c:569-572 — SURVEY.md §5). Here that state
(plus the RNG seed and the next sample index) is persisted so long
multi-host renders and inverse-rendering runs are restartable.

Uses .npz for render state (small, dependency-free) and orbax is available
for optimizer pytrees if needed by callers.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .film import Film

__all__ = ["save_render_state", "load_render_state", "save_pytree", "load_pytree"]


def save_render_state(path: str, film: Film, seed: int, meta: Optional[Dict[str, Any]] = None):
    """Persist (acc, samples, seed, meta). Atomic via temp rename."""
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp,
        acc=np.asarray(film.acc),
        samples=np.asarray(film.samples),
        seed=np.int64(seed),
        meta=json.dumps(meta or {}),
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_render_state(path: str) -> Tuple[Film, int, Dict[str, Any]]:
    with np.load(path, allow_pickle=False) as z:
        film = Film(acc=jnp.asarray(z["acc"]), samples=jnp.asarray(z["samples"]))
        seed = int(z["seed"])
        meta = json.loads(str(z["meta"]))
    return film, seed, meta


def save_pytree(path: str, tree):
    """Flat .npz dump of an arbitrary pytree of arrays (for scene params /
    optimizer state in inverse rendering)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp,
        treedef=str(treedef),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_pytree(path: str, like):
    """Restore a pytree saved by :func:`save_pytree` into the structure of
    ``like`` (leaf order must match)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path, allow_pickle=False) as z:
        new_leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
