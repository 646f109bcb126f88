import numpy as np
import jax.numpy as jnp

from icp_tpu.ops.raytrace import bresenham_cells, raytrace_update
from icp_tpu.models.occupancy import OccupancyGrid2D


def np_bresenham(x0, y0, x1, y1):
    """Clean-room oracle of reference _bresenham (utilities/mapping.py:68-89)."""
    cells = []
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    x, y = x0, y0
    while True:
        if x == x1 and y == y1:
            break
        cells.append((x, y))
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x += sx
        if e2 < dx:
            err += dx
            y += sy
    return cells


def test_bresenham_matches_oracle():
    rng = np.random.default_rng(0)
    origin = np.array([7, 9], dtype=np.int32)
    ends = rng.integers(-20, 40, size=(50, 2)).astype(np.int32)
    valid = np.ones(50, bool)
    cells, active = bresenham_cells(
        jnp.asarray(origin), jnp.asarray(ends), jnp.asarray(valid), max_steps=128
    )
    cells, active = np.asarray(cells), np.asarray(active)
    for i in range(50):
        want = np_bresenham(origin[0], origin[1], ends[i, 0], ends[i, 1])
        got = [tuple(cells[s, i]) for s in range(128) if active[s, i]]
        assert got == want, f"ray {i}: {got[:5]} vs {want[:5]}"


def np_update_scan(log_odds, origin_cell, hit_cells, nx, ny, l_hit, l_miss,
                   lo_min, lo_max):
    """Clean-room oracle of update_scan (utilities/mapping.py:103-141)."""
    lo = log_odds.copy()
    ox, oy = origin_cell
    for hx, hy in hit_cells:
        if 0 <= hx < nx and 0 <= hy < ny:
            lo[hy, hx] += l_hit
    for hx, hy in hit_cells:
        for fx, fy in np_bresenham(ox, oy, hx, hy):
            if 0 <= fx < nx and 0 <= fy < ny:
                lo[fy, fx] += l_miss
    return np.clip(lo, lo_min, lo_max)


def test_raytrace_update_matches_oracle():
    rng = np.random.default_rng(1)
    ny, nx = 40, 50
    log_odds = np.zeros((ny, nx), np.float32)
    origin = np.array([25, 20], dtype=np.int32)
    hits = rng.integers(-5, 55, size=(30, 2)).astype(np.int32)
    want = np_update_scan(log_odds, origin, hits, nx, ny, 0.85, -0.4, -5.0, 5.0)
    got = np.asarray(
        raytrace_update(
            jnp.asarray(log_odds), jnp.asarray(origin), jnp.asarray(hits),
            jnp.ones(30, bool),
            jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-5.0), jnp.float32(5.0),
            max_steps=128,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_raytrace_update_windowed_matches_oracle():
    """Grid much larger than 2*max_steps triggers the windowed scatter;
    result must stay bit-identical to the full-grid path / oracle,
    including rays that leave the grid and an origin near the edge."""
    rng = np.random.default_rng(7)
    ny, nx = 300, 280
    log_odds = rng.uniform(-1, 1, (ny, nx)).astype(np.float32)
    for origin in ([140, 150], [2, 3], [275, 295], [-10, 120]):
        origin = np.asarray(origin, np.int32)
        hits = (origin + rng.integers(-90, 90, size=(40, 2))).astype(np.int32)
        valid = rng.random(40) < 0.9
        want = np_update_scan(log_odds, origin, hits[valid], nx, ny,
                              0.85, -0.4, -5.0, 5.0)
        got = np.asarray(
            raytrace_update(
                jnp.asarray(log_odds), jnp.asarray(origin), jnp.asarray(hits),
                jnp.asarray(valid),
                jnp.float32(0.85), jnp.float32(-0.4),
                jnp.float32(-5.0), jnp.float32(5.0),
                max_steps=96,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_occupancy_grid_end_to_end():
    g = OccupancyGrid2D(-5, 5, -5, 5, resolution=0.5, max_ray_cells=64)
    origin = np.zeros(2, np.float32)
    angles = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    hits = np.stack([3.0 * np.cos(angles), 3.0 * np.sin(angles)], axis=1)
    g.update_scan(origin, hits)
    p = g.to_probability()
    # center cell should be free (rays pass through), hit ring occupied
    ci = int((0 - g.min_x) / g.resolution)
    cj = int((0 - g.min_y) / g.resolution)
    assert p[cj, ci] < 0.5
    hi = int((3.0 - g.min_x) / g.resolution)
    assert p[cj, hi] > 0.5
    # reset returns to unexplored
    g.reset()
    assert np.all(np.asarray(g.log_odds) == 0)


def test_replay_matches_sequential_updates():
    """One-dispatch replay == scan-by-scan update_scan (incl. padding
    scans as no-ops and per-scan clamp ordering)."""
    rng = np.random.default_rng(3)
    K, N = 5, 40
    origins = rng.uniform(-3, 3, (K, 2)).astype(np.float32)
    hits = rng.uniform(-6, 6, (K, N, 2)).astype(np.float32)
    masks = rng.random((K, N)) < 0.8

    seq = OccupancyGrid2D(-5, 5, -5, 5, resolution=0.25, max_ray_cells=64)
    for k in range(K):
        seq.update_scan(origins[k], hits[k], masks[k])

    rep = OccupancyGrid2D(-5, 5, -5, 5, resolution=0.25, max_ray_cells=64)
    rep.update_scan(origins[0], hits[0])           # stale state: replay resets
    Kb = 8                                         # bucketed with no-op pads
    o = np.zeros((Kb, 2), np.float32)
    h = np.zeros((Kb, N, 2), np.float32)
    m = np.zeros((Kb, N), bool)
    o[:K], h[:K], m[:K] = origins, hits, masks
    rep.replay(o, h, m)

    np.testing.assert_allclose(
        np.asarray(rep.log_odds), np.asarray(seq.log_odds), atol=1e-5
    )


def test_free_cap_compaction_exact():
    """Compacted scatter (free_cap) is bit-identical to the full scatter,
    in both the windowed and the full-grid branches, and the lax.cond
    overflow fallback keeps it exact when active cells exceed free_cap."""
    rng = np.random.default_rng(7)
    for nx, ny, max_steps in ((400, 380, 64), (90, 80, 64)):
        log_odds = rng.normal(size=(ny, nx)).astype(np.float32)
        origin = np.array([nx // 2, ny // 2], np.int32)
        hits = (origin + rng.integers(-60, 60, size=(64, 2))).astype(np.int32)
        valid = rng.random(64) < 0.9
        args = (jnp.asarray(log_odds), jnp.asarray(origin),
                jnp.asarray(hits), jnp.asarray(valid),
                jnp.float32(0.85), jnp.float32(-0.4),
                jnp.float32(-5.0), jnp.float32(5.0))
        windowed = 2 * max_steps < min(nx, ny)
        want = np.asarray(raytrace_update(*args, max_steps=max_steps))
        for cap in (8192, 16, 64 * max_steps + 5):  # plenty / overflow / >=E
            got = np.asarray(
                raytrace_update(*args, max_steps=max_steps, free_cap=cap)
            )
            if windowed:
                # same delta-grid accumulation structure -> bit-identical
                np.testing.assert_array_equal(got, want)
            else:
                # full-grid branch: delta-grid vs direct in-place scatter
                # differ only by float addition order
                np.testing.assert_allclose(got, want, atol=1e-5)


def test_occupancy_grid_free_cap():
    ga = OccupancyGrid2D(-5, 5, -5, 5, resolution=0.1, max_ray_cells=64)
    gb = OccupancyGrid2D(-5, 5, -5, 5, resolution=0.1, max_ray_cells=64,
                         free_cells_cap=4096)
    rng = np.random.default_rng(11)
    for _ in range(3):
        origin = rng.uniform(-2, 2, 2).astype(np.float32)
        hits = rng.uniform(-5, 5, (50, 2)).astype(np.float32)
        ga.update_scan(origin, hits)
        gb.update_scan(origin, hits)
    np.testing.assert_array_equal(np.asarray(ga.log_odds),
                                  np.asarray(gb.log_odds))


def test_raytrace_batched_matches_sequential():
    """Batch dedup update == B sequential per-scan updates when no cell
    saturates mid-batch (wide clamp bounds)."""
    from icp_tpu.ops.raytrace import raytrace_update, raytrace_update_batched
    rng = np.random.default_rng(11)
    ny, nx = 96, 80
    B, N = 5, 64
    grid0 = jnp.asarray(rng.normal(0, 0.2, (ny, nx)), jnp.float32)
    origins = jnp.asarray(rng.integers(20, 60, (B, 2)), jnp.int32)
    hits = jnp.asarray(rng.integers(-10, 100, (B, N, 2)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N)) > 0.15)
    args = (jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-1e6), jnp.float32(1e6))

    seq = grid0
    for b in range(B):
        seq = raytrace_update(seq, origins[b], hits[b], valid[b], *args,
                              max_steps=128)
    for cap in (4096, 50):        # ample and overflowing (fallback path)
        got = raytrace_update_batched(grid0, origins, hits, valid, *args,
                                      max_steps=128, unique_cap=cap)
        np.testing.assert_allclose(np.asarray(got), np.asarray(seq),
                                   rtol=1e-5, atol=1e-5)
    # stage-1 per-scan compaction: ample, overflowing (exact fallback),
    # and no-op (scan_cap >= S*N) — all must equal the sequential result
    for scap in (4096, 40, 128 * N):
        got = raytrace_update_batched(grid0, origins, hits, valid, *args,
                                      max_steps=128, unique_cap=4096,
                                      scan_cap=scap)
        np.testing.assert_allclose(np.asarray(got), np.asarray(seq),
                                   rtol=1e-5, atol=1e-5)
    # unique_cap + 1 > B*scan_cap but < B*S*N: exercises the pad-after-
    # slice path inside the compacted dedup
    got = raytrace_update_batched(grid0, origins, hits, valid, *args,
                                  max_steps=128, unique_cap=30000,
                                  scan_cap=4096)
    np.testing.assert_allclose(np.asarray(got), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)
    got_none = raytrace_update_batched(grid0, origins, hits, valid, *args,
                                       max_steps=128, unique_cap=None)
    np.testing.assert_allclose(np.asarray(got_none), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_raytrace_batched_out_of_grid_origin():
    """An out-of-grid origin breaks the step-prefix property the stage-1
    gather compaction relies on (the ray starts outside, enters, exits) —
    the in-graph prefix assert must route that batch to the exact full
    scatter, still matching the sequential result."""
    from icp_tpu.ops.raytrace import raytrace_update, raytrace_update_batched
    rng = np.random.default_rng(7)
    ny, nx = 64, 64
    B, N = 3, 32
    grid0 = jnp.asarray(rng.normal(0, 0.2, (ny, nx)), jnp.float32)
    origins = jnp.asarray([[-20, 30], [30, 30], [90, -5]], jnp.int32)
    hits = jnp.asarray(rng.integers(-20, 90, (B, N, 2)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N)) > 0.1)
    args = (jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-1e6), jnp.float32(1e6))
    seq = grid0
    for b in range(B):
        seq = raytrace_update(seq, origins[b], hits[b], valid[b], *args,
                              max_steps=192)
    got = raytrace_update_batched(grid0, origins, hits, valid, *args,
                                  max_steps=192, unique_cap=2048,
                                  scan_cap=1024)
    np.testing.assert_allclose(np.asarray(got), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_raytrace_batched_clamps():
    from icp_tpu.ops.raytrace import raytrace_update_batched
    ny, nx = 32, 32
    grid0 = jnp.zeros((ny, nx), jnp.float32)
    B = 30                        # enough rays over one line to saturate
    origins = jnp.tile(jnp.asarray([[2, 16]], jnp.int32), (B, 1))
    hits = jnp.tile(jnp.asarray([[[30, 16]]], jnp.int32), (B, 1, 1))
    valid = jnp.ones((B, 1), bool)
    got = raytrace_update_batched(
        grid0, origins, hits, valid,
        jnp.float32(0.85), jnp.float32(-0.4),
        jnp.float32(-8.0), jnp.float32(8.0), max_steps=64, unique_cap=512)
    g = np.asarray(got)
    assert g.min() >= -8.0 - 1e-6 and g.max() <= 8.0 + 1e-6
    assert g[16, 30] == 8.0       # saturated hit cell
    assert g[16, 10] == -8.0      # saturated free cell
