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
    cells = jnp.stack([x, y], axis=-1)                      # (S, N, 2)
    active = valid[None, :] & (s < M[None, :])
    return cells, active


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
