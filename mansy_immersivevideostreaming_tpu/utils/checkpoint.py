"""Checkpoint save/restore (Orbax).

Replaces the reference's ``torch.save(state_dict)`` files
(reference ``run_models.py:61-67``, ``run_mansy.py:85-104``) with Orbax
pytree checkpoints; any pytree (params, optimizer state, train state tuples)
round-trips.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

# Sidecar written next to policy checkpoints recording the net/obs
# construction flags the params were trained under.  Orbax restores params
# into whatever module the CLI rebuilds — hyperparameters that add no
# params (av_logit_prior, the action-value obs wiring) restore silently
# into the WRONG function if the eval invocation forgets a flag (the v16
# eval ran a 3.0-prior policy at prior 0.0 and its grids collapsed).
NET_CONFIG_SUFFIX = ".netcfg.json"


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


def save_net_config(ckpt_path: str, cfg: dict) -> None:
    """Record the net-construction flags next to a policy checkpoint."""
    with open(os.path.abspath(ckpt_path) + NET_CONFIG_SUFFIX, "w") as f:
        json.dump(cfg, f, indent=1, sort_keys=True)


def load_net_config(ckpt_path: str) -> dict | None:
    """Read the sidecar written by ``save_net_config``, or None (older
    checkpoints, e.g. artifacts/round{2,3}, predate it)."""
    p = os.path.abspath(ckpt_path) + NET_CONFIG_SUFFIX
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
