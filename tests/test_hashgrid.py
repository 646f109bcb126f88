import numpy as np
import jax.numpy as jnp
from scipy.spatial import KDTree

from icp_tpu.ops.hashgrid import build_hash_grid, hash_nn_query
from icp_tpu.utils.masking import BIG, pad_points


def test_hash_nn_exact_within_radius():
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-20, 20, (5000, 2)).astype(np.float32)
    src = (tgt[rng.integers(0, 5000, 800)]
           + rng.normal(scale=0.1, size=(800, 2)).astype(np.float32))
    tp, tm = pad_points(tgt, 8192)
    sp, sm = pad_points(src, 1024)
    cell = 1.0
    grid = build_hash_grid(jnp.asarray(tp), jnp.asarray(tm), cell,
                           n_buckets=8192, bucket_cap=32)
    assert int(grid.overflow) == 0
    d, i = hash_nn_query(jnp.asarray(sp), jnp.asarray(sm), grid)
    d = np.asarray(d)[:800]
    d_ref, _ = KDTree(tgt).query(src)
    # every true NN here is << cell, so the hash answer must be exact
    assert (d_ref < cell).all()
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-4)


def test_hash_nn_out_of_radius_reports_big():
    tgt = np.array([[0.0, 0.0]], np.float32)
    src = np.array([[10.0, 10.0]], np.float32)
    tp, tm = pad_points(tgt, 64)
    sp, sm = pad_points(src, 64)
    grid = build_hash_grid(jnp.asarray(tp), jnp.asarray(tm), 1.0,
                           n_buckets=256, bucket_cap=8)
    d, _ = hash_nn_query(jnp.asarray(sp), jnp.asarray(sm), grid)
    assert float(d[0]) >= BIG / 2


def test_hash_grid_overflow_reported():
    # 100 identical points in one cell with bucket_cap 8 -> overflow
    pts = np.zeros((100, 2), np.float32)
    pp, pm = pad_points(pts, 128)
    grid = build_hash_grid(jnp.asarray(pp), jnp.asarray(pm), 1.0,
                           n_buckets=64, bucket_cap=8)
    assert int(grid.overflow) == 100 - 8


def test_icp_large_recovers_transform():
    """Gated dense-grid ICP on a 20k-point cloud recovers a small transform."""
    import jax.numpy as jnp
    from icp_tpu.models.icp import icp_large

    rng = np.random.default_rng(1)
    # structured cloud: several wall segments at 10k points (point count
    # sized so per-cell occupancy stays under the grid capacity)
    n = 10000
    t = rng.uniform(0, 1, n)
    seg = rng.integers(0, 4, n)
    base = np.stack([
        np.where(seg == 0, t * 30 - 15, np.where(seg == 1, t * 30 - 15,
                 np.where(seg == 2, -15.0, 15.0))),
        np.where(seg == 0, -10.0, np.where(seg == 1, 10.0,
                 np.where(seg == 2, t * 20 - 10, t * 20 - 10))),
    ], axis=1).astype(np.float32)
    base += rng.normal(scale=0.02, size=base.shape).astype(np.float32)

    th = 0.03
    c, s = np.cos(th), np.sin(th)
    R_true = np.array([[c, -s], [s, c]], np.float32)
    t_true = np.array([0.15, -0.1], np.float32)
    src = (base - t_true) @ R_true

    tp, tm = pad_points(base, 16384)
    sp, sm = pad_points(src, 16384)
    res = icp_large(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.eye(2, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
        max_corr_dist=1.0, max_iterations=40, error_threshold=1e-9,
        grid_shape=(26, 36), cap=160, qcap=160, qcells=256, cell_size=1.25,
    )
    got_th = float(np.arctan2(np.asarray(res.R)[1, 0], np.asarray(res.R)[0, 0]))
    assert abs(got_th - th) < 5e-3
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=0.03)
    assert float(res.error) < 1e-2


def test_dense_nn_exact_within_radius():
    from icp_tpu.ops.densegrid import (
        build_dense_grid, dense_nn_query, grid_origin)

    rng = np.random.default_rng(3)
    tgt = rng.uniform(-20, 20, (5000, 2)).astype(np.float32)
    src = (tgt[rng.integers(0, 5000, 800)]
           + rng.normal(scale=0.1, size=(800, 2)).astype(np.float32))
    tp, tm = pad_points(tgt, 8192)
    sp, sm = pad_points(src, 1024)
    cell = 1.0
    origin = grid_origin(jnp.asarray(tp), jnp.asarray(tm), cell)
    grid = build_dense_grid(jnp.asarray(tp), jnp.asarray(tm), cell, origin,
                            grid_shape=(44, 44), cap=32)
    assert int(grid.overflow) == 0
    res = dense_nn_query(jnp.asarray(sp), jnp.asarray(sm), grid, qcap=32)
    d = np.asarray(res.dist)[:800]
    d_ref, i_ref = KDTree(tgt).query(src)
    assert (d_ref < cell).all()
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-4)
    # returned nearest coordinates match the indexed target points
    nx = np.asarray(res.nx)[:800]
    ny = np.asarray(res.ny)[:800]
    np.testing.assert_allclose(np.stack([nx, ny], 1), tgt[i_ref], atol=1e-5)


def test_dense_nn_query_outside_grid_and_masking():
    from icp_tpu.ops.densegrid import (
        build_dense_grid, dense_nn_query, grid_origin)

    tgt = np.array([[0.0, 0.0], [5.0, 5.0]], np.float32)
    # query 1: just outside the grid but within a cell of a boundary target
    # (clamped binning must still find it); query 2: far away -> BIG
    src = np.array([[-0.9, 0.0], [50.0, 50.0]], np.float32)
    tp, tm = pad_points(tgt, 64)
    sp, sm = pad_points(src, 64)
    cell = 1.0
    origin = grid_origin(jnp.asarray(tp), jnp.asarray(tm), cell)
    grid = build_dense_grid(jnp.asarray(tp), jnp.asarray(tm), cell, origin,
                            grid_shape=(8, 8), cap=8)
    res = dense_nn_query(jnp.asarray(sp), jnp.asarray(sm), grid, qcap=8)
    assert abs(float(res.dist[0]) - 0.9) < 1e-5
    # far query: anything returned must be beyond the exactness radius
    # (clamped binning may surface a best-effort boundary candidate)
    assert float(res.dist[1]) > cell
    # masked-off query slots report BIG
    assert (np.asarray(res.dist)[2:] >= BIG / 2).all()


def test_dense_grid_overflow_reported():
    from icp_tpu.ops.densegrid import build_dense_grid

    pts = np.zeros((100, 2), np.float32)
    pts[:4] = [[100.0, 100.0]] * 4          # out of extent -> dropped too
    pp, pm = pad_points(pts, 128)
    grid = build_dense_grid(jnp.asarray(pp), jnp.asarray(pm), 1.0,
                            jnp.asarray([-1.0, -1.0]), grid_shape=(8, 8),
                            cap=8)
    assert int(grid.overflow) == (96 - 8) + 4
