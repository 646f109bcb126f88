"""Sharded occupancy-grid updates: rays distributed over the mesh.

The reference traces rays sequentially in Python
(/root/reference/utilities/mapping.py:135-139). Device-parallel design:
shard the ray (hit-point) axis; each device runs the batched Bresenham
kernel for its shard, scatters into a local log-odds delta, and a psum
combines deltas before the clamped accumulate. Log-odds updates are
additive and order-independent, so ray sharding is exact.

(Grid-block sharding with halo exchange is the memory-scaling variant for
maps that exceed one chip's HBM; ray sharding covers the compute-scaling
case and is collective-light: one psum per scan batch.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icp_tpu.ops.raytrace import bresenham_cells


def raytrace_update_sharded(mesh: Mesh, log_odds, origin_cell, hit_cells,
                            valid, l_hit, l_miss, lo_min, lo_max,
                            *, max_steps: int, axis: str = "d"):
    """raytrace_update with the ray axis sharded over ``axis``.

    hit_cells/valid leading dim must divide by mesh size (pad with
    valid=False rays).
    """
    ny, nx = log_odds.shape

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(),
    )
    def _delta(lo, oc, hc, vm):
        d = jnp.zeros((ny, nx), lo.dtype)
        hx, hy = hc[:, 0], hc[:, 1]
        hit_in = vm & (hx >= 0) & (hx < nx) & (hy >= 0) & (hy < ny)
        hx_s = jnp.where(hit_in, hx, nx)
        d = d.at[hy, hx_s].add(jnp.where(hit_in, l_hit, 0.0), mode="drop")

        cells, active = bresenham_cells(oc, hc, vm, max_steps=max_steps)
        fx = cells[..., 0].reshape(-1)
        fy = cells[..., 1].reshape(-1)
        act = active.reshape(-1)
        in_b = act & (fx >= 0) & (fx < nx) & (fy >= 0) & (fy < ny)
        fx_s = jnp.where(in_b, fx, nx)
        d = d.at[fy, fx_s].add(jnp.where(in_b, l_miss, 0.0), mode="drop")
        return lax.psum(d, axis)

    delta = _delta(log_odds, origin_cell, hit_cells, valid)
    return jnp.clip(log_odds + delta, lo_min, lo_max)
