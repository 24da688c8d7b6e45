"""Device-mesh utilities for SPMD data/env parallelism.

The reference has no distributed backend at all (SURVEY §2.8: parallelism is
``multiprocessing.Pool`` and tianshou ``SubprocVectorEnv``).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` + sharding annotations: batches (for
viewport-prediction training) and env lanes (for RL rollout) are sharded over
the ``data`` axis, parameters are replicated, and XLA inserts the psum
all-reduces over ICI during the backward pass — no hand-written comm layer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def data_parallel_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch / env-lane) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, tables)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place every leaf of ``batch`` with its leading axis sharded over the
    mesh.  Under ``jax.jit`` this makes the whole step SPMD: XLA partitions
    the compute and inserts collectives automatically."""
    sharding = data_parallel_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
