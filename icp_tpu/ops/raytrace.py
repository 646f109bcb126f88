"""Batched Bresenham ray tracing + scatter-add occupancy update.

The reference traces each ray with a pure-Python Bresenham loop and updates
cells one at a time (/root/reference/utilities/mapping.py:68-89,135-139) —
O(N_rays * ray_length) interpreter steps per scan. The TPU-native version
runs the *same integer Bresenham recurrence* for all rays simultaneously:
a ``lax.scan`` over step index where each step advances every ray by one
cell on the VPU and emits (ix, iy, active). One scatter-add then applies
l_miss for every emitted free cell and l_hit for every valid endpoint.

Semantics parity with the reference:
  * cells are emitted *before* stepping, endpoint excluded (mapping.py:78-81);
  * per-cell bounds check -> ``mode="drop"`` scatter;
  * hit cells accumulate l_hit only when in bounds (mapping.py:124-129);
  * overlapping rays double-count l_miss exactly as the sequential loop does;
  * Bresenham visits max(|dx|, |dy|) cells, so ``max_steps`` >= the grid's
    Chebyshev diameter loses nothing; longer rays are truncated (documented
    deviation, pick max_steps generously).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("max_steps",))
def bresenham_cells_xy(origin_cell, end_cells, valid, *, max_steps: int):
    """Like ``bresenham_cells`` but returns (x (S, N), y (S, N), active)
    as separate planes — the layout-safe form for large batched callers
    (a stacked (..., 2) trailing dim lane-pads 2 -> 128 on TPU)."""
    x0 = origin_cell[0]
    y0 = origin_cell[1]
    x1 = end_cells[:, 0]
    y1 = end_cells[:, 1]

    dx = jnp.abs(x1 - x0)                                   # (N,)
    dy = jnp.abs(y1 - y0)
    sx = jnp.where(x0 < x1, 1, -1).astype(jnp.int32)
    sy = jnp.where(y0 < y1, 1, -1).astype(jnp.int32)
    M = jnp.maximum(dx, dy)
    m = jnp.minimum(dx, dy)

    s = lax.broadcasted_iota(jnp.int32, (max_steps, 1), 0)  # (S, 1)
    denom = jnp.maximum(2 * M, 1)[None, :]                  # (1, N)
    minor = jnp.maximum(
        0, (2 * s * m[None, :] + M[None, :] - 1) // denom
    )                                                       # (S, N)
    major = jnp.broadcast_to(s, minor.shape)
    x_major = dx >= dy
    x = x0 + sx[None, :] * jnp.where(x_major[None, :], major, minor)
    y = y0 + sy[None, :] * jnp.where(x_major[None, :], minor, major)
    active = valid[None, :] & (s < M[None, :])
    return x, y, active


@partial(jax.jit, static_argnames=("max_steps",))
def bresenham_cells(origin_cell, end_cells, valid, *, max_steps: int):
    """All free-space cells along Bresenham rays origin -> each endpoint.

    origin_cell: (2,) int32 (ix, iy); end_cells: (N, 2) int32; valid: (N,).
    Returns (cells (S, N, 2) int32, active (S, N) bool) — emitted
    (pre-endpoint) cells, exactly the reference's `_bresenham` list.

    Closed form, no sequential loop: the reference's integer Bresenham
    (diagonal-step variant, mapping.py:68-89) advances the major axis every
    iteration and the minor axis whenever 2*err crosses the threshold;
    solving the err recurrence gives, after s iterations,

        minor_steps(s) = max(0, (2*s*m + M - 1) // (2*M))

    with M = max(|dx|, |dy|), m = min(|dx|, |dy|). Verified exhaustively
    against the loop (tests/test_raytrace.py). This turns an O(max_steps)
    lax.scan of tiny VPU ops into one broadcasted (S, N) computation.
    """
    x, y, active = bresenham_cells_xy(origin_cell, end_cells, valid,
                                      max_steps=max_steps)
    return jnp.stack([x, y], axis=-1), active


def _scatter_free(n_flat, key, in_b, l_miss, dtype, free_cap):
    """Scatter l_miss at flat cell indices ``key`` (masked by ``in_b``).

    TPU scatter-add costs ~10 ns/element regardless of duplicates or
    sortedness (measured, tools/profile_scatter.py), while a full sort of
    the index list costs ~0.2 ms at 655k — so when a static capacity
    ``free_cap`` is given, sort the keys (sentinel n_flat goes last),
    slice the first free_cap, and scatter only those. Addends are all
    equal (l_miss), so any accumulation order inside this delta grid gives
    bit-identical sums; if the active count overflows the capacity, fall
    back to the exact full-size scatter via lax.cond (slower, never wrong).
    """
    sent = jnp.int32(n_flat)
    key = jnp.where(in_b, key, sent).astype(jnp.int32)
    zeros = jnp.zeros((n_flat,), dtype)

    def full(k):
        return zeros.at[k].add(jnp.where(k < sent, l_miss, 0.0), mode="drop")

    if free_cap is None or free_cap >= key.size:
        return full(key)

    def compact(k):
        sk = jax.lax.sort(k, is_stable=False)[:free_cap]
        return zeros.at[sk].add(jnp.where(sk < sent, l_miss, 0.0),
                                mode="drop")

    n_act = jnp.sum(in_b)
    return lax.cond(n_act <= free_cap, compact, full, key)


@partial(jax.jit, static_argnames=("max_steps", "free_cap"))
def raytrace_update(
    log_odds, origin_cell, hit_cells, valid,
    l_hit, l_miss, lo_min, lo_max,
    *, max_steps: int, free_cap: int | None = None,
):
    """One scan's occupancy update: l_hit at endpoints, l_miss along rays,
    then clamp. log_odds is (ny, nx); hit_cells (N, 2) as (ix, iy).

    Reference: OccupancyGrid2D.update_scan
    (/root/reference/utilities/mapping.py:103-141).

    When the grid is larger than the scan's reach, the free-cell scatter
    goes through a (2*max_steps)^2 LOCAL WINDOW around the origin instead
    of the whole grid: every emitted Bresenham cell is at step s < M <=
    max_steps, i.e. within Chebyshev radius max_steps of the origin, and
    the window start is clamped so the window lies fully inside the grid —
    so in-window membership == in-grid membership for every free cell and
    the result is bit-identical to the full-grid scatter. The small scatter
    operand keeps the accumulation local (HBM-scatter into a multi-MB grid
    is the single most expensive op of the fused SLAM step).
    """
    ny, nx = log_odds.shape

    hx, hy = hit_cells[:, 0], hit_cells[:, 1]
    hit_in = valid & (hx >= 0) & (hx < nx) & (hy >= 0) & (hy < ny)
    # mode="drop" skips out-of-bounds; masked rows are pushed out of bounds.
    hx_s = jnp.where(hit_in, hx, nx)
    log_odds = log_odds.at[hy, hx_s].add(
        jnp.where(hit_in, l_hit, 0.0), mode="drop"
    )

    cells, active = bresenham_cells(origin_cell, hit_cells, valid,
                                    max_steps=max_steps)
    fx = cells[..., 0].reshape(-1)
    fy = cells[..., 1].reshape(-1)
    act = active.reshape(-1)

    W = 2 * max_steps
    if W < min(nx, ny):
        # windowed scatter: window fully inside the grid, covering all
        # cells within Chebyshev radius max_steps of the origin
        wx = jnp.clip(origin_cell[0] - max_steps, 0, nx - W)
        wy = jnp.clip(origin_cell[1] - max_steps, 0, ny - W)
        lx = fx - wx
        ly = fy - wy
        in_b = act & (lx >= 0) & (lx < W) & (ly >= 0) & (ly < W)
        delta = _scatter_free(W * W, ly * W + lx, in_b, l_miss,
                              log_odds.dtype, free_cap).reshape(W, W)
        win = lax.dynamic_slice(log_odds, (wy, wx), (W, W)) + delta
        log_odds = lax.dynamic_update_slice(log_odds, win, (wy, wx))
    else:
        in_b = act & (fx >= 0) & (fx < nx) & (fy >= 0) & (fy < ny)
        if free_cap is None or free_cap >= fx.size:
            fx_s = jnp.where(in_b, fx, nx)
            log_odds = log_odds.at[fy, fx_s].add(
                jnp.where(in_b, l_miss, 0.0), mode="drop"
            )
        else:
            log_odds = log_odds + _scatter_free(
                ny * nx, fy * nx + fx, in_b, l_miss, log_odds.dtype,
                free_cap
            ).reshape(ny, nx)

    return jnp.clip(log_odds, lo_min, lo_max)


def dedup_scatter_add(flat, key, n_flat, value, unique_cap: int):
    """Scatter ``value`` at every entry of ``key`` (< n_flat; sentinel
    n_flat = masked) into the 1-D ``flat`` array — via sorted run-length
    encoding: each UNIQUE cell gets ONE scatter slot with count*value.

    Sum-exact (all addends equal), and worth ~an order of magnitude when
    duplication is high: TPU scatter-add costs ~10 ns per scattered
    element regardless of duplicates (tools/profile_scatter.py), while
    the sort runs vectorized — a Bresenham free-cell set at 10^5 points
    per scan duplicates each cell ~40x. Falls back in-graph to the exact
    full scatter when the unique count exceeds ``unique_cap`` (perf knob,
    never correctness). Same construction as raytrace_update_batched's
    compact path (see its docstring for why the two single-key sorts
    align by construction)."""
    n = key.size
    key = key.astype(jnp.int32)
    if unique_cap is None or unique_cap >= n:
        return flat.at[key].add(
            jnp.where(key < n_flat, value, 0.0), mode="drop")
    n_act = jnp.sum(key < n_flat)
    sk = lax.sort(key, is_stable=False)
    prev = jnp.concatenate([jnp.full((1,), -1, sk.dtype), sk[:-1]])
    newseg = (sk != prev) & (sk < n_flat)
    idx = jnp.arange(n, dtype=jnp.int32)
    n_seg = jnp.sum(newseg)

    bpos = jnp.where(newseg, idx, n).astype(jnp.int32)
    m = min(unique_cap + 1, n)
    pos = lax.sort(bpos, is_stable=False)[:m]
    if m < unique_cap + 1:
        pos = jnp.pad(pos, (0, unique_cap + 1 - m), constant_values=n)
    pos_c = jnp.minimum(pos, n_act)
    cnt = jnp.maximum(pos_c[1:] - pos_c[:-1], 0)
    k2 = jnp.where(newseg, sk, jnp.int32(n_flat))
    mu = min(unique_cap, n)
    uk = lax.sort(k2, is_stable=False)[:mu]
    if mu < unique_cap:
        uk = jnp.pad(uk, (0, unique_cap - mu), constant_values=n_flat)

    def compact(f):
        return f.at[uk].add(
            jnp.where(uk < n_flat, cnt.astype(f.dtype) * value, 0.0),
            mode="drop")

    def full(f):
        return f.at[key].add(jnp.where(key < n_flat, value, 0.0),
                             mode="drop")

    return lax.cond(n_seg > unique_cap, full, compact, flat)


@partial(jax.jit, static_argnames=("max_steps", "unique_cap", "scan_cap"))
def raytrace_update_batched(
    log_odds, origin_cells, hit_cells, valid,
    l_hit, l_miss, lo_min, lo_max,
    *, max_steps: int, unique_cap: int | None = None,
    scan_cap: int | None = None,
):
    """A whole BATCH of scans' occupancy updates in one pass.

    origin_cells: (B, 2) int32; hit_cells: (B, N, 2); valid: (B, N).

    Consecutive scans' free-space regions overlap almost entirely (the
    sensor moves a few cells per scan), so instead of B scatter passes of
    ~free_cap slots each (scatter-add costs ~10 ns/slot regardless of
    values — tools/profile_scatter.py), the batch's free cells are sorted
    once, run-length encoded, and each UNIQUE cell is scattered exactly
    once with value count*l_miss. Sum-equivalence is exact (all addends
    equal); the one semantic deviation vs per-scan updates is that the
    log-odds clamp applies once per batch instead of after every scan,
    which can only differ for cells that both saturate a bound AND receive
    opposite-sign updates within the same batch (hit+miss mid-batch) —
    measure-zero in practice and irrelevant to the trajectory (the map
    never feeds back into registration). Reference semantics:
    OccupancyGrid2D.update_scan (/root/reference/utilities/mapping.py:
    103-141) applied B times.

    Cost structure (profiled, BENCHMARKS.md): the emitted (B, S, N) cell
    grid is ~6x padding, and multi-operand sorts / scans over it dominate
    the whole SLAM step. So:

    * ``scan_cap``: each scan's cells are first compacted by a per-scan
      (B, S*N) sort sliced to scan_cap — the dedup then runs on
      B*scan_cap ~= 3x fewer elements. MEASURED NEGATIVE RESULT (round
      5): a gather-based alternative — Bresenham actives are a
      step-prefix of every ray, so per-ray counts + exclusive cumsum +
      batched searchsorted + take_along_axis can compact WITHOUT the
      sort — was implemented and benchmarked 12x SLOWER end-to-end
      (full pipeline 429 -> 42.9 scans/s; trace: the searchsorted
      binary-search body cost 28 ms/iteration x 10 and the element
      gathers 28 ms/batch, vs 0.56 ms/scan for ALL the sorts). XLA:TPU
      sorts are fast and scalar gathers are near-serial, so sort-based
      compaction IS the efficient formulation on this hardware; this
      sort is the measured floor, not a leftover;
    * run lengths come from POSITION DIFFERENCES of compacted segment
      starts, not from a (key, count) pair sort + reverse cummin: two
      single-key sorts (segment-start positions; unique keys) replace the
      3-operand sort and the cummin entirely. Because the dedup array is
      itself sorted, the r-th smallest start position belongs to the r-th
      smallest unique key, so the two sorted outputs align by construction.

    If any scan's active count overflows ``scan_cap``, or the unique-cell
    count overflows ``unique_cap``, a lax.cond falls back to the exact
    full scatter — perf knobs, never correctness.
    """
    ny, nx = log_odds.shape
    flat = log_odds.reshape(-1)
    n_flat = ny * nx

    # hits: small (B*N), scatter directly with duplicates
    hx = hit_cells[..., 0].reshape(-1)
    hy = hit_cells[..., 1].reshape(-1)
    hit_in = (valid.reshape(-1) & (hx >= 0) & (hx < nx)
              & (hy >= 0) & (hy < ny))
    hkey = jnp.where(hit_in, hy * nx + hx, n_flat).astype(jnp.int32)
    flat = flat.at[hkey].add(jnp.where(hit_in, l_hit, 0.0), mode="drop")

    # free cells: batched closed-form Bresenham (separate x/y planes —
    # a (B, S, N, 2) stack would lane-pad 2 -> 128)
    x, y, active = jax.vmap(
        lambda o, h, v: bresenham_cells_xy(o, h, v, max_steps=max_steps)
    )(origin_cells, hit_cells, valid)
    B, S, N = x.shape
    inb = (active & (x >= 0) & (x < nx) & (y >= 0) & (y < ny))  # (B, S, N)
    key_bsn = jnp.where(inb, y * nx + x, n_flat).astype(jnp.int32)
    key_flat = key_bsn.reshape(-1)

    if unique_cap is None or unique_cap >= key_flat.size:
        flat = flat.at[key_flat].add(
            jnp.where(key_flat < n_flat, l_miss, 0.0), mode="drop")
        return jnp.clip(flat.reshape(ny, nx), lo_min, lo_max)

    per_scan_act = jnp.sum(inb.reshape(B, -1), axis=1).astype(jnp.int32)
    n_act = jnp.sum(per_scan_act).astype(jnp.int32)
    if scan_cap is not None and scan_cap < S * N:
        # stage 1: per-scan compaction (sentinels sort last, slice them
        # off) — sort-based on purpose; see the docstring's measured
        # negative result for the gather-based alternative
        overflow1 = jnp.any(per_scan_act > scan_cap)
        key = lax.sort(key_bsn.reshape(B, S * N), dimension=1,
                       is_stable=False)[:, :scan_cap].reshape(-1)
    else:
        overflow1 = jnp.bool_(False)
        key = key_flat
    n = key.size

    sk = lax.sort(key, is_stable=False)
    prev = jnp.concatenate([jnp.full((1,), -1, sk.dtype), sk[:-1]])
    newseg = (sk != prev) & (sk < n_flat)
    idx = jnp.arange(n, dtype=jnp.int32)
    n_seg = jnp.sum(newseg)

    # segment-start positions, compacted by one single-key sort
    bpos = jnp.where(newseg, idx, n).astype(jnp.int32)
    m = min(unique_cap + 1, n)
    pos = lax.sort(bpos, is_stable=False)[:m]
    if m < unique_cap + 1:
        pos = jnp.pad(pos, (0, unique_cap + 1 - m), constant_values=n)
    # run length of segment r = pos[r+1] - pos[r], last segment ends at
    # n_act (every position >= n_act holds a sentinel key)
    pos_c = jnp.minimum(pos, n_act)
    cnt_u = jnp.maximum(pos_c[1:] - pos_c[:-1], 0)
    # unique keys, compacted by one single-key sort; aligned with pos
    # because sk is sorted (position order == key order)
    k2 = jnp.where(newseg, sk, jnp.int32(n_flat))
    mu = min(unique_cap, n)
    uk = lax.sort(k2, is_stable=False)[:mu]
    if mu < unique_cap:
        uk = jnp.pad(uk, (0, unique_cap - mu), constant_values=n_flat)

    def compact(f):
        return f.at[uk].add(
            jnp.where(uk < n_flat, cnt_u.astype(f.dtype) * l_miss, 0.0),
            mode="drop")

    def full(f):
        return f.at[key_flat].add(
            jnp.where(key_flat < n_flat, l_miss, 0.0), mode="drop")

    flat = lax.cond(overflow1 | (n_seg > unique_cap), full, compact, flat)
    return jnp.clip(flat.reshape(ny, nx), lo_min, lo_max)
