"""Dense cell-grid nearest-neighbor search for the 10^5+-point regime.

The NN search for the scaled axis (BASELINE.json config #5; reference
KDTree use at /root/reference/utilities/icp.py:173,179). An earlier
hash-table formulation cost O(N * 9 * bucket_cap) random-access *element*
gathers, which TPUs execute near-scalar (~40 s per 100k-point alignment
measured) — it was retired in favor of this module. This module is
built around three TPU facts:

1. element gathers are slow, but gathers of CONTIGUOUS ROWS vector-load;
2. argmin + take_along_axis is a hidden element gather — a min-reduce
   plus an iota==argmin one-hot contraction is pure VPU work;
3. padding dominates dense formulations — most grid cells are empty, so
   the compare runs over COMPACTED occupied query cells only.

Layout:

* targets are binned once into a padded (Cy+2, Cx+2, cap) grid of
  separate x/y/idx/mask planes (one multi-payload sort + one scatter);
* queries are compacted: occupied cells -> (qcells, qcap) planes plus
  each compact cell's (row, col) in the grid;
* each compact query cell row-gathers its 3x3 neighborhood (9 contiguous
  (cap,)-rows per plane) and compares densely: (qcells, qcap, cap) per
  shift, winner kept by min + one-hot, zero element gathers;
* results scatter back to input order by original query row.

Exactness contract: any neighbor within ``cell_size`` of a query is found
exactly; results farther than that are best-effort (callers gate at
max_corr_dist <= cell_size, reference icp.py:183-189). Queries beyond the
qcap / qcells capacities are dropped for the call (dist = BIG) and counted
in ``overflow`` (SURVEY.md §7: capacities from data stats, assert
non-overflow).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.utils.masking import BIG


class DenseGrid(NamedTuple):
    """Cell-binned target cloud, pre-padded with a one-cell invalid ring."""
    x: jax.Array          # (Cy+2, Cx+2, cap) f32
    y: jax.Array          # (Cy+2, Cx+2, cap) f32
    idx: jax.Array        # (Cy+2, Cx+2, cap) int32 original row (n = empty)
    mask: jax.Array       # (Cy+2, Cx+2, cap) bool
    origin: jax.Array     # (2,) world position of unpadded cell (0, 0) corner
    cell_size: jax.Array  # scalar f32
    overflow: jax.Array   # int32 — points dropped (capacity or out-of-extent)


class CompactQueries(NamedTuple):
    """Queries binned to occupied cells only (device-resident, updatable)."""
    x: jax.Array          # (qcells, qcap) f32 query coordinates
    y: jax.Array          # (qcells, qcap) f32
    idx: jax.Array        # (qcells, qcap) int32 original row (n = empty)
    mask: jax.Array       # (qcells, qcap) bool
    cell_yx: jax.Array    # (qcells, 2) int32 UNpadded grid cell of this row
    cell_mask: jax.Array  # (qcells,) bool — row holds an occupied cell
    overflow: jax.Array   # int32 — queries dropped by qcap/qcells capacity


class DenseNNResult(NamedTuple):
    dist: jax.Array   # (N,) Euclidean distance, BIG when none found
    idx: jax.Array    # (N,) int32 index into the target array
    nx: jax.Array     # (N,) nearest-point x (0 when none) — saves the
    ny: jax.Array     # (N,) nearest-point y    target[idx] gather at use site


def _rank_in_cell(cs, n):
    """Rank of each sorted element within its equal-key run, plus run head."""
    head = cs != jnp.roll(cs, 1)
    head = head.at[0].set(True)
    seg_start = jnp.where(head, jnp.arange(n), 0)
    seg_start = lax.associative_scan(jnp.maximum, seg_start)
    return jnp.arange(n) - seg_start, head


def grid_origin(points, mask, cell_size):
    """World position of cell (0,0): masked min minus one cell of margin."""
    big = jnp.float32(BIG)
    m = mask[:, None]
    mn = jnp.min(jnp.where(m, points, big), axis=0)
    return mn - cell_size


@partial(jax.jit, static_argnames=("grid_shape", "cap"))
def build_dense_grid(points, mask, cell_size, origin, *,
                     grid_shape: tuple[int, int], cap: int = 16) -> DenseGrid:
    """Bin target points into the padded dense grid (built once per ICP)."""
    Cy, Cx = grid_shape
    n = points.shape[0]
    cell_size = jnp.asarray(cell_size, jnp.float32)
    rel = (points - origin) / cell_size
    c = jnp.floor(rel).astype(jnp.int32)
    cx, cy = c[:, 0], c[:, 1]
    inb = mask & (cx >= 0) & (cx < Cx) & (cy >= 0) & (cy < Cy)
    n_cells = Cy * Cx
    cid = jnp.where(inb, cy * Cx + cx, n_cells)

    cs, sx, sy, sidx = lax.sort(
        (cid, points[:, 0], points[:, 1], jnp.arange(n, dtype=jnp.int32)),
        num_keys=1,
    )
    rank, _ = _rank_in_cell(cs, n)
    ok = (cs < n_cells) & (rank < cap)
    row = jnp.where(ok, cs, n_cells)           # out-of-bounds row -> dropped
    col = jnp.where(ok, rank, 0)

    px = jnp.zeros((n_cells, cap), jnp.float32).at[row, col].set(
        sx, mode="drop")
    py = jnp.zeros((n_cells, cap), jnp.float32).at[row, col].set(
        sy, mode="drop")
    pidx = jnp.full((n_cells, cap), n, jnp.int32).at[row, col].set(
        sidx, mode="drop")
    pm = jnp.zeros((n_cells, cap), bool).at[row, col].set(ok, mode="drop")
    dropped = (jnp.sum(mask) - jnp.sum(ok)).astype(jnp.int32)

    pad = ((1, 1), (1, 1), (0, 0))
    return DenseGrid(
        jnp.pad(px.reshape(Cy, Cx, cap), pad),
        jnp.pad(py.reshape(Cy, Cx, cap), pad),
        jnp.pad(pidx.reshape(Cy, Cx, cap), pad, constant_values=n),
        jnp.pad(pm.reshape(Cy, Cx, cap), pad),
        jnp.asarray(origin, jnp.float32), cell_size, dropped,
    )


@partial(jax.jit, static_argnames=("grid_shape", "qcells", "qcap"))
def bin_queries(query, query_mask, origin, cell_size, *,
                grid_shape: tuple[int, int], qcells: int,
                qcap: int) -> CompactQueries:
    """Compact queries into occupied cells (one sort + scatters).

    Query cells clip to the grid edge, so a query up to one cell outside
    the extent still sees the boundary cells (in-radius exactness holds).
    """
    Cy, Cx = grid_shape
    n = query.shape[0]
    rel = (query - origin) / cell_size
    c = jnp.floor(rel).astype(jnp.int32)
    cx = jnp.clip(c[:, 0], 0, Cx - 1)
    cy = jnp.clip(c[:, 1], 0, Cy - 1)
    n_cells = Cy * Cx
    cid = jnp.where(query_mask, cy * Cx + cx, n_cells)

    cs, sx, sy, sidx = lax.sort(
        (cid, query[:, 0], query[:, 1], jnp.arange(n, dtype=jnp.int32)),
        num_keys=1,
    )
    rank, head = _rank_in_cell(cs, n)
    valid = cs < n_cells
    crow = jnp.cumsum((head & valid).astype(jnp.int32)) - 1  # compact row id

    ok = valid & (rank < qcap) & (crow < qcells)
    row = jnp.where(ok, crow, qcells)          # -> dropped
    col = jnp.where(ok, rank, 0)
    qx = jnp.zeros((qcells, qcap), jnp.float32).at[row, col].set(
        sx, mode="drop")
    qy = jnp.zeros((qcells, qcap), jnp.float32).at[row, col].set(
        sy, mode="drop")
    qidx = jnp.full((qcells, qcap), n, jnp.int32).at[row, col].set(
        sidx, mode="drop")
    qm = jnp.zeros((qcells, qcap), bool).at[row, col].set(ok, mode="drop")

    hrow = jnp.where(head & valid & (crow < qcells), crow, qcells)
    cyx = jnp.stack([cs // Cx, cs % Cx], axis=1).astype(jnp.int32)
    cell_yx = jnp.zeros((qcells, 2), jnp.int32).at[hrow].set(
        cyx, mode="drop")
    cell_mask = jnp.zeros((qcells,), bool).at[hrow].set(True, mode="drop")
    overflow = (jnp.sum(query_mask) - jnp.sum(ok)).astype(jnp.int32)
    return CompactQueries(qx, qy, qidx, qm, cell_yx, cell_mask, overflow)


@jax.jit
def cell_normals(grid: DenseGrid):
    """Per-CELL unit surface normals from 3x3-neighborhood point moments.

    The binned-cloud analog of ``ops.eig2.estimate_normals`` for the
    10^5+-point regime (reference estimate_normals_2d,
    /root/reference/utilities/icp.py:51-76): instead of a kNN per point,
    every grid cell gets ONE normal from the covariance of all points in
    its 3x3 cell neighborhood (cell_size ~ 1.5x the correspondence gate,
    so the neighborhood is exactly the local surface patch a match can
    come from). No gathers: per-cell moments are masked reductions over
    the cap axis and the neighborhood aggregation is nine static slice
    adds with closed-form moment translation.

    f32 care: moments are accumulated in per-cell LOCAL coordinates
    (relative to each cell's corner, |x| <= 3 cells after aggregation) —
    world-coordinate second moments at 100 m extents would cancel
    catastrophically.

    Returns (nx, ny, valid) as flat (Cy*Cx,) planes over UNPADDED cells
    (row-major, matching ``CompactQueries.cell_yx`` flat indexing);
    valid = neighborhood has >= 3 points.
    """
    Cyp, Cxp, cap = grid.x.shape
    Cy, Cx = Cyp - 2, Cxp - 2
    cell = grid.cell_size
    # local coordinates relative to each padded cell's own corner
    col = lax.broadcasted_iota(jnp.int32, (Cyp, Cxp), 1).astype(jnp.float32)
    row = lax.broadcasted_iota(jnp.int32, (Cyp, Cxp), 0).astype(jnp.float32)
    corner_x = grid.origin[0] + (col - 1.0) * cell
    corner_y = grid.origin[1] + (row - 1.0) * cell
    m = grid.mask.astype(jnp.float32)
    xl = (grid.x - corner_x[:, :, None]) * m
    yl = (grid.y - corner_y[:, :, None]) * m
    n = jnp.sum(m, -1)                       # (Cyp, Cxp) per-cell moments
    s1x = jnp.sum(xl, -1)
    s1y = jnp.sum(yl, -1)
    sxx = jnp.sum(xl * xl, -1)
    sxy = jnp.sum(xl * yl, -1)
    syy = jnp.sum(yl * yl, -1)

    # 3x3 aggregation with moment translation: neighbor (dy, dx) local
    # coords differ from the center cell's by the static offset
    # ((dx-1) * cell, (dy-1) * cell)
    N = jnp.zeros((Cy, Cx), jnp.float32)
    X = jnp.zeros((Cy, Cx), jnp.float32)
    Y = jnp.zeros((Cy, Cx), jnp.float32)
    XX = jnp.zeros((Cy, Cx), jnp.float32)
    XY = jnp.zeros((Cy, Cx), jnp.float32)
    YY = jnp.zeros((Cy, Cx), jnp.float32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            ox = (dx - 1) * cell
            oy = (dy - 1) * cell
            nn = n[dy:dy + Cy, dx:dx + Cx]
            ax = s1x[dy:dy + Cy, dx:dx + Cx]
            ay = s1y[dy:dy + Cy, dx:dx + Cx]
            N = N + nn
            X = X + ax + nn * ox
            Y = Y + ay + nn * oy
            XX = XX + sxx[dy:dy + Cy, dx:dx + Cx] + 2.0 * ox * ax + nn * ox * ox
            XY = XY + (sxy[dy:dy + Cy, dx:dx + Cx] + ox * ay + oy * ax
                       + nn * ox * oy)
            YY = YY + syy[dy:dy + Cy, dx:dx + Cx] + 2.0 * oy * ay + nn * oy * oy

    nc = jnp.maximum(N, 1.0)
    mx = X / nc
    my = Y / nc
    a = XX / nc - mx * mx
    b = XY / nc - mx * my
    c = YY / nc - my * my
    from icp_tpu.ops.eig2 import eigh2x2
    _, _, v = eigh2x2(a, b, c)
    valid = (N >= 3.0).reshape(-1)
    return v[..., 0].reshape(-1), v[..., 1].reshape(-1), valid


@jax.jit
def compact_nn(cq: CompactQueries, grid: DenseGrid):
    """NN of each compacted query against its 3x3 cell neighborhood.

    Returns per-slot planes (qcells, qcap): d2, target idx, nearest x/y.
    Zero element gathers: neighborhoods are contiguous row gathers; the
    winner is selected with a min-reduce + iota one-hot contraction.
    """
    Cyp, Cxp, cap = grid.x.shape
    qcells, qcap = cq.x.shape
    tx_f = grid.x.reshape(-1, cap)
    ty_f = grid.y.reshape(-1, cap)
    ti_f = grid.idx.reshape(-1, cap)
    tm_f = grid.mask.reshape(-1, cap)

    # padded-plane flat row of the neighborhood's top-left cell
    base = cq.cell_yx[:, 0] * Cxp + cq.cell_yx[:, 1]     # (qcells,)
    qxb = cq.x[:, :, None]                               # (qcells, qcap, 1)
    qyb = cq.y[:, :, None]
    iota = jnp.arange(cap)

    best_d2 = jnp.full((qcells, qcap), BIG, jnp.float32)
    best_i = jnp.zeros((qcells, qcap), jnp.int32)
    best_x = jnp.zeros((qcells, qcap), jnp.float32)
    best_y = jnp.zeros((qcells, qcap), jnp.float32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            r = base + dy * Cxp + dx                     # (qcells,)
            tx = tx_f[r]                                 # row gather (qcells, cap)
            ty = ty_f[r]
            ti = ti_f[r]
            tm = tm_f[r]
            ddx = qxb - tx[:, None, :]
            ddy = qyb - ty[:, None, :]
            d2 = jnp.where(tm[:, None, :], ddx * ddx + ddy * ddy, BIG)
            dloc = jnp.min(d2, axis=-1)                  # (qcells, qcap)
            # first index attaining the min, as a one-hot — no gathers
            midx = jnp.min(jnp.where(d2 == dloc[..., None], iota, cap), -1)
            hot = (iota == midx[..., None]).astype(jnp.float32)
            fx = jnp.sum(tx[:, None, :] * hot, -1)
            fy = jnp.sum(ty[:, None, :] * hot, -1)
            fi = jnp.sum(ti[:, None, :].astype(jnp.float32) * hot,
                         -1).astype(jnp.int32)
            upd = dloc < best_d2
            best_d2 = jnp.where(upd, dloc, best_d2)
            best_i = jnp.where(upd, fi, best_i)
            best_x = jnp.where(upd, fx, best_x)
            best_y = jnp.where(upd, fy, best_y)
    return best_d2, best_i, best_x, best_y


@partial(jax.jit, static_argnames=("n",))
def scatter_results(cq: CompactQueries, best_d2, best_i, best_x, best_y,
                    *, n: int) -> DenseNNResult:
    """Return compact per-slot results to original query order."""
    found = cq.mask & (best_d2 < BIG)
    dflat = jnp.where(found, jnp.sqrt(best_d2), BIG).ravel()
    qi = cq.idx.ravel()                        # n for empty slots -> dropped
    out_d = jnp.full((n,), BIG, jnp.float32).at[qi].set(dflat, mode="drop")
    out_i = jnp.zeros((n,), jnp.int32).at[qi].set(best_i.ravel(),
                                                  mode="drop")
    out_x = jnp.zeros((n,), jnp.float32).at[qi].set(best_x.ravel(),
                                                    mode="drop")
    out_y = jnp.zeros((n,), jnp.float32).at[qi].set(best_y.ravel(),
                                                    mode="drop")
    return DenseNNResult(out_d, out_i, out_x, out_y)


@partial(jax.jit, static_argnames=("qcap", "qcells"))
def dense_nn_query(query, query_mask, grid: DenseGrid, *, qcap: int = 16,
                   qcells: int = 4096) -> DenseNNResult:
    """Nearest target within cell_size of each query. See module docstring."""
    Cyp, Cxp, _ = grid.x.shape
    cq = bin_queries(query, query_mask, grid.origin, grid.cell_size,
                     grid_shape=(Cyp - 2, Cxp - 2), qcells=qcells, qcap=qcap)
    best = compact_nn(cq, grid)
    return scatter_results(cq, *best, n=query.shape[0])
