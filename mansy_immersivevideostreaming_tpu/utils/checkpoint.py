"""Checkpoint save/restore (Orbax).

Replaces the reference's ``torch.save(state_dict)`` files
(reference ``run_models.py:61-67``, ``run_mansy.py:85-104``) with Orbax
pytree checkpoints; any pytree (params, optimizer state, train state tuples)
round-trips.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure (and shardings) of ``target``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=target)
    return restored
