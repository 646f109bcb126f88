import numpy as np
import jax.numpy as jnp

from icp_tpu.models.icp import icp, icp_core, identity_init
from icp_tpu.utils.masking import pad_points


def _rot2(th):
    return np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                    dtype=np.float32)


def _room_scan(rng, n=400, noise=0.005):
    """Synthetic 2D scan: rectangular room walls + a corner feature."""
    per = n // 4
    t = np.linspace(0, 1, per)
    walls = [
        np.stack([t * 8 - 4, np.full(per, -3.0)], 1),
        np.stack([t * 8 - 4, np.full(per, 3.0)], 1),
        np.stack([np.full(per, -4.0), t * 6 - 3], 1),
        np.stack([np.full(per, 2.0), t * 4 - 3], 1),
    ]
    pts = np.concatenate(walls).astype(np.float32)
    return pts + rng.normal(scale=noise, size=pts.shape).astype(np.float32)


def test_icp_p2p_2d_recovers_small_transform():
    rng = np.random.default_rng(0)
    target = _room_scan(rng)
    th = 0.06
    R_true, t_true = _rot2(th), np.array([0.12, -0.08], np.float32)
    # ICP maps source -> target: target = source @ R.T + t => source = (target - t) @ R
    source = (target - t_true) @ R_true
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    Ri, ti = identity_init(2)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        Ri, ti, voxel_size=0.02, method="point_to_point",
        max_iterations=100, error_threshold=1e-10,
    )
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=5e-2)
    assert float(res.error) < 1e-3


def test_icp_p2l_2d_recovers_small_transform():
    rng = np.random.default_rng(1)
    target = _room_scan(rng, noise=0.002)
    th = 0.05
    R_true, t_true = _rot2(th), np.array([0.1, 0.05], np.float32)
    source = (target - t_true) @ R_true
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    Ri, ti = identity_init(2)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        Ri, ti, voxel_size=0.05, method="point_to_line",
        max_iterations=100, normal_k=10, error_threshold=1e-10,
    )
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=2e-2)


def test_icp_with_init_handles_large_rotation():
    rng = np.random.default_rng(2)
    target = _room_scan(rng)
    th = 0.8  # 46 deg — vanilla ICP would fall into a local minimum
    R_true, t_true = _rot2(th), np.array([0.5, -0.4], np.float32)
    source = (target - t_true) @ R_true
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    # init close to truth (as rotation search / IMU would provide)
    R0 = _rot2(0.75)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.asarray(R0), jnp.zeros(2, jnp.float32),
        voxel_size=0.05, method="point_to_point",
        max_iterations=150, error_threshold=1e-10,
    )
    got_th = float(np.arctan2(np.asarray(res.R)[1, 0], np.asarray(res.R)[0, 0]))
    assert abs(got_th - th) < 0.02
    assert float(res.error) < 5e-3


def test_icp_gate_aborts_on_disjoint_clouds():
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (100, 2)).astype(np.float32)
    b = a + 100.0  # far away: all correspondences beyond max_corr_dist
    ap, am = pad_points(a, 128)
    bp, bm = pad_points(b, 128)
    Ri, ti = identity_init(2)
    res = icp(
        jnp.asarray(ap), jnp.asarray(am), jnp.asarray(bp), jnp.asarray(bm),
        Ri, ti, voxel_size=0.1, method="point_to_point",
        max_iterations=50, error_threshold=1e-10,
        max_corr_dist=0.5, use_gate=True,
    )
    # gate must abort on iteration 1 leaving identity
    np.testing.assert_allclose(np.asarray(res.R), np.eye(2), atol=1e-6)
    assert int(res.iters) == 1


def test_icp_3d_teapot_style():
    # mirrors the reference correctness demo (demos/teapot_icp_demo.py:38-72):
    # known 25 deg rotation about Y + translation, p2p ICP must undo it
    rng = np.random.default_rng(4)
    n = 418
    target = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    target[:, 2] *= 0.5
    th = np.deg2rad(25.0)
    R_true = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        dtype=np.float32,
    )
    t_true = np.array([0.3, -0.2, 0.25], np.float32)
    source = (target - t_true) @ R_true
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        voxel_size=0.005, method="point_to_point",
        max_iterations=300, error_threshold=1e-12,
    )
    # residual after alignment should be tiny (exact correspondences exist)
    assert float(res.error) < 1e-4
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=2e-2)


def test_icp_core_converges_and_reports_iters():
    rng = np.random.default_rng(5)
    pts = _room_scan(rng)
    pp, pm = pad_points(pts, 512)
    Ri, ti = identity_init(2)
    res = icp_core(
        jnp.asarray(pp), jnp.asarray(pm), jnp.asarray(pp), jnp.asarray(pm),
        Ri, ti, method="point_to_point", max_iterations=50,
        error_threshold=1e-9,
    )
    assert int(res.iters) <= 3  # identical clouds converge immediately
    assert float(res.error) < 1e-6


def _wall_world(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        np.stack([np.linspace(-8, 8, n // 2), np.full(n // 2, -5.0)], 1),
        np.stack([np.full(n // 2, 8.0), np.linspace(-5, 5, n // 2)], 1),
    ]).astype(np.float32)
    return pts + rng.normal(scale=0.02, size=pts.shape).astype(np.float32)


def test_icp_large_p2l_beats_p2p_on_walls():
    """icp_large point_to_line (per-cell normals from the binned grid)
    must recover a known transform tighter and in fewer iterations than
    p2p on a wall world — the sliding-along-walls regime p2l exists for
    (reference method default, /root/reference/utilities/icp.py:192-195,
    config.yaml icp.method)."""
    from icp_tpu.models.icp import icp_large

    t_pts = _wall_world()
    th = 0.06
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    src = (t_pts @ R.T + [0.3, -0.2]).astype(np.float32)
    sp, sm = pad_points(src, 4096)
    tp, tm = pad_points(t_pts, 4096)

    out = {}
    for method in ("point_to_point", "point_to_line"):
        res = icp_large(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp),
                        jnp.asarray(tm), jnp.eye(2, dtype=jnp.float32),
                        jnp.zeros(2, jnp.float32), max_corr_dist=1.0,
                        max_iterations=40, grid_shape=(32, 32), cap=256,
                        qcap=256, qcells=256, method=method)
        Rr = np.asarray(res.R)
        tf = src @ Rr.T + np.asarray(res.t)
        out[method] = (float(np.mean(np.linalg.norm(tf - t_pts, axis=1))),
                       int(res.iters))
    resid_p2p, it_p2p = out["point_to_point"]
    resid_p2l, it_p2l = out["point_to_line"]
    assert resid_p2l < 0.005, f"p2l residual {resid_p2l}"
    assert resid_p2l < resid_p2p / 3, (resid_p2l, resid_p2p)
    assert it_p2l < it_p2p, (it_p2l, it_p2p)


def test_cell_normals_match_wall_geometry():
    """Per-cell normals from binned-grid neighborhood moments must be
    perpendicular to the walls (the closed-form analog of per-point kNN
    PCA, reference utilities/icp.py:51-76)."""
    from icp_tpu.ops.densegrid import (build_dense_grid, cell_normals,
                                       grid_origin)

    pts = _wall_world(seed=3)
    p, m = pad_points(pts, 4096)
    p, m = jnp.asarray(p), jnp.asarray(m)
    cell = jnp.float32(1.5)
    org = grid_origin(p, m, cell)
    grid = build_dense_grid(p, m, cell, org, grid_shape=(32, 32), cap=256)
    nx, ny, ok = (np.asarray(a) for a in cell_normals(grid))
    Cy = Cx = 32
    # horizontal wall y=-5: cells along it must have |normal_y| ~ 1
    o = np.asarray(org)
    row = int(np.floor((-5.0 - o[1]) / 1.5))
    checked = 0
    for col in range(2, Cx - 2):
        cx_center = o[0] + (col + 0.5) * 1.5
        # stay clear of the corner at x=8: the 3x3 neighborhood spans
        # +-2.25 m and would legitimately mix both walls there
        if not (-6.0 < cx_center < 4.5):
            continue
        i = row * Cx + col
        if not ok[i]:
            continue
        assert abs(ny[i]) > 0.99, (col, nx[i], ny[i])
        checked += 1
    assert checked >= 5
    # vertical wall x=8: |normal_x| ~ 1
    col = int(np.floor((8.0 - o[0]) / 1.5))
    checked = 0
    for r in range(2, Cy - 2):
        cy_center = o[1] + (r + 0.5) * 1.5
        # clear of the corner at y=-5 (neighborhood radius 2.25 m)
        if not (-1.5 < cy_center < 4.0):
            continue
        i = r * Cx + col
        if not ok[i]:
            continue
        assert abs(nx[i]) > 0.99, (r, nx[i], ny[i])
        checked += 1
    assert checked >= 3
