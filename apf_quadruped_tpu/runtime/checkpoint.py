"""Checkpoint / resume for long multi-host sweeps (SURVEY.md §5.4).

The reference has no persistence (controller state is Gazebo's); for
pod-scale scenario sweeps we checkpoint the sweep cursor + per-scenario
loop states with orbax so a preempted job resumes mid-sweep.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, tree: Any) -> None:
    """Save a pytree (sweep state, loop states, RNG keys) to `path`."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, jax.tree.map(lambda x: x, tree), force=True)


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree; `like` (optional) provides structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if like is not None:
        return ckpt.restore(path, item=like)
    return ckpt.restore(path)


def exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
