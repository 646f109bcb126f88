"""Grid-hash nearest-neighbor search — O(N * bucket) for large targets.

The brute-force kernels (icp_tpu.ops.nn) are ideal up to ~10^4 target
points; for the scaled regime (10^5+-point submaps / keyframe maps,
BASELINE.json config #5) this module buckets targets into a spatial hash
of cells sized to the correspondence radius and answers each query from
the 3x3 neighborhood — exact for any neighbor within ``cell_size`` (and
therefore exact for gated ICP whose max_corr_dist <= cell_size, reference
icp.py:183-189 discards farther pairs anyway).

Static shapes throughout: fixed bucket count and per-bucket capacity, with
overflow dropped (the returned ``overflow`` count lets callers assert
non-overflow, SURVEY.md §7 "choose capacities from data stats").
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.utils.masking import BIG

_P1 = 73856093     # classic spatial-hash primes (plain ints: no eager backend init)
_P2 = 19349663


class HashGrid(NamedTuple):
    table: jax.Array       # (n_buckets, cap) int32 indices into points (M = empty)
    points: jax.Array      # (M, 2)
    mask: jax.Array        # (M,)
    cell_size: jax.Array   # scalar
    overflow: jax.Array    # scalar int32 — points dropped due to bucket_cap


def _bucket_of(cx, cy, n_buckets: int):
    h = (cx * _P1) ^ (cy * _P2)
    return jnp.abs(h) % n_buckets


@partial(jax.jit, static_argnames=("n_buckets", "bucket_cap"))
def build_hash_grid(points, mask, cell_size, *, n_buckets: int = 4096,
                    bucket_cap: int = 32) -> HashGrid:
    """Bucket valid points into the spatial hash (one sort + one scatter)."""
    m = points.shape[0]
    cell = jnp.floor(points / cell_size).astype(jnp.int32)
    bucket = _bucket_of(cell[:, 0], cell[:, 1], n_buckets)
    bucket = jnp.where(mask, bucket, n_buckets)          # invalid last

    order = jnp.argsort(bucket)
    b_sorted = bucket[order]
    # rank within bucket: position since the last bucket change
    head = b_sorted != jnp.roll(b_sorted, 1)
    head = head.at[0].set(True)
    seg_start = jnp.where(head, jnp.arange(m), 0)
    seg_start = lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(m) - seg_start

    ok = (b_sorted < n_buckets) & (rank < bucket_cap)
    table = jnp.full((n_buckets, bucket_cap), m, jnp.int32)
    table = table.at[
        jnp.where(ok, b_sorted, n_buckets),
        jnp.where(ok, rank, 0),
    ].set(order.astype(jnp.int32), mode="drop")
    overflow = jnp.sum((b_sorted < n_buckets) & (rank >= bucket_cap))
    return HashGrid(table, points, mask, jnp.asarray(cell_size, jnp.float32),
                    overflow.astype(jnp.int32))


@jax.jit
def hash_nn_query(query, query_mask, grid: HashGrid):
    """Nearest target within ``cell_size`` of each query (exact in-radius).

    Returns (dists (N,), idx (N,)): Euclidean distance, or BIG when no
    valid target lies in the 3x3 cell neighborhood.
    """
    n_buckets, cap = grid.table.shape
    m = grid.points.shape[0]
    qc = jnp.floor(query / grid.cell_size).astype(jnp.int32)  # (N, 2)

    # stack candidates from the 3x3 neighborhood: (N, 9*cap)
    cand_list = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            b = _bucket_of(qc[:, 0] + dx, qc[:, 1] + dy, n_buckets)
            cand_list.append(grid.table[b])                   # (N, cap)
    cand = jnp.concatenate(cand_list, axis=1)                 # (N, 9cap)

    valid = cand < m
    safe = jnp.where(valid, cand, 0)
    # gather coordinates as separate x/y planes: a trailing dim of 2 would
    # be lane-padded to 128 by the TPU tiled layout (64x memory blowup at
    # 1e5-point scale)
    cx = grid.points[:, 0][safe]                              # (N, 9cap)
    cy = grid.points[:, 1][safe]
    cmask = valid & grid.mask[safe]
    ddx = query[:, 0:1] - cx
    ddy = query[:, 1:2] - cy
    d2 = jnp.where(cmask, ddx * ddx + ddy * ddy, BIG)
    j = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
    idx = jnp.take_along_axis(safe, j[:, None], 1)[:, 0]
    dist = jnp.where(best < BIG, jnp.sqrt(best), BIG)
    if query_mask is not None:
        dist = jnp.where(query_mask, dist, BIG)
    return dist, idx
