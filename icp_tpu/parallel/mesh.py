"""Device mesh helpers.

The reference is single-process/single-core (SURVEY.md §2); all distribution
in this framework is new design: a 1-D (or 2-D) jax.sharding.Mesh whose axes
carry the workload's natural parallel dimensions —

  * ``sweep``-style axes: rotation-search angles / RANSAC hypotheses
    (embarrassingly parallel, no cross-talk);
  * ``data``-style axes: pose-graph edges, occupancy rays, keyframes
    (partial sums combined with psum over ICI).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, x, axis: str = "d"):
    """Place array with its leading dim sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host bring-up: jax.distributed.initialize with env fallbacks.

    On a real pod slice each host calls this before building meshes; all
    shard_map programs in this package then run unchanged with their
    collectives riding ICI within the slice and DCN across hosts. On
    single-process rigs (this dev container) it is a no-op.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (standard jax.distributed variables are also honored by
    jax itself).
    """
    import os
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False          # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=(num_processes
                       or int(os.environ.get("JAX_NUM_PROCESSES", "1"))),
        process_id=(process_id
                    or int(os.environ.get("JAX_PROCESS_ID", "0"))),
    )
    return True
