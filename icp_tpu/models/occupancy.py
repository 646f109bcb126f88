"""Log-odds occupancy grid, device-resident, batched ray updates.

Re-design of OccupancyGrid2D (/root/reference/utilities/mapping.py:13-187).
The grid lives in HBM as a jnp array; every scan update is one jitted call
(coordinate conversion + batched Bresenham + two scatter-adds + clamp) via
icp_tpu.ops.raytrace. Python Bresenham loops are gone.

Export formats (CSV / NPY probability grids) match the reference
(mapping.py:183-187) so downstream tooling is drop-in.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.ops.raytrace import raytrace_update


@partial(jax.jit, static_argnames=("max_steps", "free_cap"))
def _update(log_odds, origin_xy, hits, mask, min_x, min_y, inv_res,
            l_hit, l_miss, lo_min, lo_max, *, max_steps: int,
            free_cap: int | None = None):
    origin_cell = jnp.floor(
        (origin_xy - jnp.stack([min_x, min_y])) * inv_res
    ).astype(jnp.int32)
    hit_cells = jnp.floor(
        (hits - jnp.stack([min_x, min_y])[None, :]) * inv_res
    ).astype(jnp.int32)
    return raytrace_update(
        log_odds, origin_cell, hit_cells, mask,
        l_hit, l_miss, lo_min, lo_max, max_steps=max_steps,
        free_cap=free_cap,
    )


@partial(jax.jit, static_argnames=("max_steps", "free_cap"))
def _replay(log_odds, origins, hits, masks, min_x, min_y, inv_res,
            l_hit, l_miss, lo_min, lo_max, *, max_steps: int,
            free_cap: int | None = None):
    """Replay K scans over a zeroed grid in ONE compiled program: a
    lax.scan over scans, each applying the same update (so the per-scan
    clamp order of the reference's rebuild loop, slam.py:271-277 →
    mapping.py:103-141, is preserved exactly)."""
    def body(lo, per):
        o, h, m = per
        return _update(lo, o, h, m, min_x, min_y, inv_res,
                       l_hit, l_miss, lo_min, lo_max,
                       max_steps=max_steps, free_cap=free_cap), None
    lo, _ = jax.lax.scan(body, log_odds, (origins, hits, masks))
    return lo


class OccupancyGrid2D:
    """2D probabilistic occupancy grid with log-odds ray tracing.

    Constructor/parameter semantics match the reference
    (/root/reference/utilities/mapping.py:28-52): grid covers
    [min_x, max_x) x [min_y, max_y) at ``resolution`` metres/cell,
    log-odds increments derived from p_hit/p_miss, clamped to
    [log_odds_min, log_odds_max].
    """

    def __init__(
        self,
        min_x, max_x, min_y, max_y,
        resolution=0.1,
        p_hit=0.7,
        p_miss=0.4,
        log_odds_min=-5.0,
        log_odds_max=5.0,
        max_ray_cells: int = 2048,
        free_cells_cap: int | None = None,
    ):
        self.min_x = float(min_x)
        self.max_x = float(max_x)
        self.min_y = float(min_y)
        self.max_y = float(max_y)
        self.resolution = float(resolution)
        self.nx = int(np.ceil((self.max_x - self.min_x) / self.resolution))
        self.ny = int(np.ceil((self.max_y - self.min_y) / self.resolution))
        self.l_hit = float(np.log(p_hit / (1.0 - p_hit)))
        self.l_miss = float(np.log(p_miss / (1.0 - p_miss)))
        self.log_odds_min = float(log_odds_min)
        self.log_odds_max = float(log_odds_max)
        self.max_ray_cells = int(max_ray_cells)
        # static capacity for the sorted-compaction free-cell scatter
        # (ops/raytrace._scatter_free); None disables compaction
        self.free_cells_cap = (None if free_cells_cap is None
                               else int(free_cells_cap))
        self.log_odds = jnp.zeros((self.ny, self.nx), jnp.float32)

    def update_scan(self, origin_xy, hit_points, mask=None):
        """Trace rays from origin to each (valid) hit; update log-odds.

        origin_xy: (2,) world coords; hit_points: (N, 2) world coords;
        mask: (N,) bool (None = all valid).
        """
        hit_points = jnp.asarray(hit_points, jnp.float32)
        if mask is None:
            mask = jnp.ones(hit_points.shape[0], bool)
        self.log_odds = _update(
            self.log_odds,
            jnp.asarray(origin_xy, jnp.float32),
            hit_points,
            jnp.asarray(mask),
            jnp.float32(self.min_x), jnp.float32(self.min_y),
            jnp.float32(1.0 / self.resolution),
            jnp.float32(self.l_hit), jnp.float32(self.l_miss),
            jnp.float32(self.log_odds_min), jnp.float32(self.log_odds_max),
            max_steps=self.max_ray_cells, free_cap=self.free_cells_cap,
        )

    def replay(self, origins, hits, masks):
        """Reset + replay K scans in ONE device dispatch.

        origins: (K, 2) world coords; hits: (K, N, 2) world coords (fixed
        per-scan capacity N); masks: (K, N) bool — all-False rows are
        no-op padding scans, so callers can bucket K to bound recompiles.

        This is the map-rebuild path after a loop closure: the reference
        replays scan-by-scan from Python (slam.py:271-277); here the whole
        replay is one lax.scan on device.
        """
        self.log_odds = _replay(
            jnp.zeros((self.ny, self.nx), jnp.float32),
            jnp.asarray(origins, jnp.float32),
            jnp.asarray(hits, jnp.float32),
            jnp.asarray(masks),
            jnp.float32(self.min_x), jnp.float32(self.min_y),
            jnp.float32(1.0 / self.resolution),
            jnp.float32(self.l_hit), jnp.float32(self.l_miss),
            jnp.float32(self.log_odds_min), jnp.float32(self.log_odds_max),
            max_steps=self.max_ray_cells, free_cap=self.free_cells_cap,
        )

    def reset(self):
        """Back to unexplored (reference mapping.py:143-145)."""
        self.log_odds = jnp.zeros((self.ny, self.nx), jnp.float32)

    # ── probability / display (reference mapping.py:150-160) ─────────────
    def to_probability(self):
        return np.asarray(jax.nn.sigmoid(self.log_odds))

    def to_display(self):
        lo = np.asarray(self.log_odds)
        display = 1.0 - (1.0 / (1.0 + np.exp(-lo)))
        display[lo == 0.0] = 1.0
        display[lo < 0.0] = 0.85
        return display

    # ── export (reference mapping.py:183-187) ────────────────────────────
    def save_csv(self, file_path):
        np.savetxt(file_path, self.to_probability(), delimiter=",")

    def save_npy(self, file_path):
        np.save(file_path, self.to_probability())

    def save_png(self, file_path, trajectory=None):
        """Headless map render (new vs reference): grayscale PNG of the
        display map, optionally with the trajectory overlaid."""
        from icp_tpu.utils.raster import write_png, COLORS
        img8 = (self.to_display() * 255).astype(np.uint8)[::-1]  # y-up
        img = np.stack([img8] * 3, axis=-1)
        if trajectory is not None and len(trajectory):
            t = np.asarray(trajectory)
            ix = np.clip(((t[:, 0] - self.min_x) / self.resolution).astype(int),
                         0, self.nx - 1)
            iy = np.clip(((t[:, 1] - self.min_y) / self.resolution).astype(int),
                         0, self.ny - 1)
            img[(self.ny - 1) - iy, ix] = COLORS["red"]
        write_png(file_path, img)
        return True
