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
    return jax.tree_util.tree_map(lambda x: global_put(x, sharding), batch)


def global_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place host data onto a (possibly multi-process) sharding.

    Single-process this is ``jax.device_put``.  Multi-process, the sharding
    spans non-addressable devices, so the global array is assembled from
    per-shard callbacks — every process must hold the same full host array
    (true for replicated params/tables and for deterministic batch
    generation, which is how this framework stages data)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host / multi-slice initialization (SURVEY §2.8's DCN story).

    Thin wrapper over ``jax.distributed.initialize``: after this, every
    process sees the global device set, ``make_mesh`` builds a mesh spanning
    all hosts, and XLA routes collectives over ICI within a slice and
    DCN/Gloo across slices — the reference has no distributed backend to
    mirror (its parallelism is ``multiprocessing.Pool``), so this is the
    TPU-native replacement.  On TPU pods the arguments are auto-detected
    from the environment; on CPU/GPU pass them explicitly."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
