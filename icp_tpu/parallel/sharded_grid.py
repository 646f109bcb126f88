"""Sharded occupancy-grid updates: rays distributed over the mesh.

The reference traces rays sequentially in Python
(/root/reference/utilities/mapping.py:135-139). Device-parallel design:
shard the ray (hit-point) axis; each device runs the batched Bresenham
kernel for its shard, scatters into a local log-odds delta, and a psum
combines deltas before the clamped accumulate. Log-odds updates are
additive and order-independent, so ray sharding is exact.

Two exact variants:

* ``raytrace_update_sharded`` — RAY sharding (compute scaling): rays split
  over devices, each scatters into a replicated local delta, one psum.
* ``raytrace_update_block_sharded`` — GRID-BLOCK sharding (memory
  scaling, for maps beyond one chip's HBM): the (ny, nx) log-odds array
  lives row-block-sharded across the mesh and is NEVER replicated. Rays
  are replicated (a scan is tiny next to the map); every device runs the
  closed-form Bresenham for all rays but scatters only the cells that land
  in its own row block. Log-odds updates are additive and per-cell, so
  block-local scatter over a disjoint partition is exact with ZERO
  collectives — no halo exchange is needed because a Bresenham cell
  belongs to exactly one block (halos only matter for stencil reads,
  which mapping never does).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icp_tpu.ops.raytrace import (bresenham_cells, bresenham_cells_xy,
                                  dedup_scatter_add)


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


def block_sharding(mesh: Mesh, axis: str = "d"):
    """NamedSharding for a row-block-sharded (ny, nx) grid."""
    return jax.NamedSharding(mesh, P(axis, None))


def raytrace_update_block_sharded(mesh: Mesh, log_odds, origin_cell,
                                  hit_cells, valid, l_hit, l_miss,
                                  lo_min, lo_max, *, max_steps: int,
                                  axis: str = "d", ray_cells=None,
                                  ray_valid=None,
                                  free_unique_cap: int | None = None):
    """Occupancy update on a row-block-sharded grid (memory scaling).

    ``log_odds`` is (ny, nx) sharded ``P(axis, None)`` (ny divisible by the
    mesh size); it stays sharded in and out, so a map of size D x HBM fits
    a D-device mesh. Rays (``hit_cells``/``valid``) are replicated; each
    device traces all rays (closed-form Bresenham, cheap next to the map)
    and scatters only the cells inside its own row block. Exact vs the
    single-device ``ops.raytrace.raytrace_update`` full-grid path: the row
    blocks partition the grid, so every in-bounds cell is scattered by
    exactly one device and the clamp is elementwise.

    Reference semantics: OccupancyGrid2D.update_scan
    (/root/reference/utilities/mapping.py:103-141).

    ``ray_cells``/``ray_valid``: optionally trace free space from a
    SMALLER (statically sliced) ray set than the hit set — at 10^5 points
    per scan the free-space rays are hugely redundant against a coarse
    grid, and shrinking the array (not just masking it) shrinks the
    Bresenham planes and the scatter by the same factor.

    ``free_unique_cap``: static per-device capacity for the deduplicated
    free-cell scatter (ops.raytrace.dedup_scatter_add): a 10^5-pt scan's
    Bresenham set duplicates each free cell ~40x and the scatter costs
    ~10 ns/ELEMENT, so RLE-compacting first is worth most of the paint
    time. Sum-exact; overflow falls back in-graph to the full scatter.
    """
    ny, nx = log_odds.shape
    n_dev = mesh.shape[axis]
    assert ny % n_dev == 0, f"ny={ny} must divide mesh size {n_dev}"
    block_ny = ny // n_dev
    if ray_cells is None:
        # default: trace free space for every hit
        ray_cells, ray_valid = hit_cells, valid
    assert ray_valid is not None, "ray_cells requires ray_valid"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(), P()),
        out_specs=P(axis, None),
    )
    def _update(lo, oc, hc, vm, rc, rvm):
        # lo is this device's (block_ny, nx) row block
        r0 = lax.axis_index(axis) * block_ny

        hx, hy = hc[:, 0], hc[:, 1]
        ly = hy - r0
        hit_in = vm & (hx >= 0) & (hx < nx) & (ly >= 0) & (ly < block_ny)
        hx_s = jnp.where(hit_in, hx, nx)
        lo = lo.at[ly, hx_s].add(jnp.where(hit_in, l_hit, 0.0), mode="drop")

        cells, active = bresenham_cells(oc, rc, rvm, max_steps=max_steps)
        fx = cells[..., 0].reshape(-1)
        fy = cells[..., 1].reshape(-1) - r0
        act = active.reshape(-1)
        in_b = act & (fx >= 0) & (fx < nx) & (fy >= 0) & (fy < block_ny)
        n_flat = block_ny * nx
        key = jnp.where(in_b, fy * nx + fx, n_flat)
        lo = dedup_scatter_add(lo.reshape(-1), key, n_flat, l_miss,
                               free_unique_cap).reshape(block_ny, nx)
        return jnp.clip(lo, lo_min, lo_max)

    return _update(log_odds, origin_cell, hit_cells, valid, ray_cells,
                   ray_valid)


def raytrace_replay_block_sharded(mesh: Mesh, log_odds, origin_cells,
                                  hit_cells, valid, l_hit, l_miss,
                                  lo_min, lo_max, *, max_steps: int,
                                  axis: str = "d", ray_cells=None,
                                  ray_valid=None,
                                  free_unique_cap: int | None = None,
                                  hit_unique_cap: int | None = None):
    """A BATCH of scans painted into the row-block-sharded grid in ONE
    dispatch — the sharded analog of ``ops.raytrace.raytrace_update_
    batched`` used to REPLAY keyframes at corrected poses after bundle
    adjustment (the reference rebuilds its map from corrected poses at
    every accepted closure, /root/reference/slam.py:618-620 -> :271-277;
    a 50k-keyframe sharded map cannot afford one dispatch per keyframe).

    origin_cells: (B, 2) int32 per-scan sensor cells; hit_cells:
    (B, N, 2); valid: (B, N); ``ray_cells``/``ray_valid`` optionally
    trace free space from a strided subset (see the incremental updater).
    Log-odds updates are additive and the row blocks partition the grid,
    so batching scans is exact up to ONE clamp per batch instead of one
    per scan — the same documented deviation as raytrace_update_batched
    (only differs for cells that saturate a bound AND receive opposite-
    sign updates within one batch; the map never feeds registration).
    Deterministic given inputs, so mesh-size invariance holds exactly.

    ``free_unique_cap`` / ``hit_unique_cap``: per-device capacities for
    RLE-deduplicated scatters (ops.raytrace.dedup_scatter_add). A replay
    chunk's B consecutive keyframes overlap almost entirely, so the raw
    free-cell scatter costs ~10 ns x B·rays·max_steps per chunk — it was
    the round-5 50k replay wall (measured ~50 ms per 32-keyframe chunk,
    79 s for a full 50k repaint; the dedup turns that into three
    device-efficient sorts + a small scatter). Sum-exact per cell
    (count x value as ONE addend — f32 addend grouping differs from the
    raw path by ulps only); overflow falls back in-graph to the full
    scatter. None = raw scatter (previous behavior).
    """
    ny, nx = log_odds.shape
    n_dev = mesh.shape[axis]
    assert ny % n_dev == 0, f"ny={ny} must divide mesh size {n_dev}"
    block_ny = ny // n_dev
    if ray_cells is None:
        ray_cells, ray_valid = hit_cells, valid
    assert ray_valid is not None, "ray_cells requires ray_valid"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(), P()),
        out_specs=P(axis, None),
    )
    def _update(lo, oc, hc, vm, rc, rvm):
        r0 = lax.axis_index(axis) * block_ny
        n_flat = block_ny * nx

        hx = hc[..., 0].reshape(-1)
        ly = hc[..., 1].reshape(-1) - r0
        hit_in = (vm.reshape(-1) & (hx >= 0) & (hx < nx)
                  & (ly >= 0) & (ly < block_ny))
        if hit_unique_cap is not None:
            hkey = jnp.where(hit_in, ly * nx + hx, n_flat)
            lo = dedup_scatter_add(lo.reshape(-1), hkey, n_flat, l_hit,
                                   hit_unique_cap).reshape(block_ny, nx)
        else:
            hx_s = jnp.where(hit_in, hx, nx)
            lo = lo.at[ly, hx_s].add(jnp.where(hit_in, l_hit, 0.0),
                                     mode="drop")

        x, y, act = jax.vmap(
            lambda o, h, v: bresenham_cells_xy(o, h, v, max_steps=max_steps)
        )(oc, rc, rvm)
        fx = x.reshape(-1)
        fy = y.reshape(-1) - r0
        in_b = (act.reshape(-1) & (fx >= 0) & (fx < nx)
                & (fy >= 0) & (fy < block_ny))
        if free_unique_cap is not None:
            fkey = jnp.where(in_b, fy * nx + fx, n_flat)
            lo = dedup_scatter_add(lo.reshape(-1), fkey, n_flat, l_miss,
                                   free_unique_cap).reshape(block_ny, nx)
        else:
            fx_s = jnp.where(in_b, fx, nx)
            lo = lo.at[fy, fx_s].add(jnp.where(in_b, l_miss, 0.0),
                                     mode="drop")
        return jnp.clip(lo, lo_min, lo_max)

    return _update(log_odds, origin_cells, hit_cells, valid, ray_cells,
                   ray_valid)
