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
