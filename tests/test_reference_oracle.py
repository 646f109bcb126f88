"""Parity oracles against the ACTUAL reference implementation.

These tests import `/root/reference/utilities/{icp,features,pose_graph,
mapping}.py` directly (NumPy/SciPy only at runtime; PyVista is stubbed
because mapping.py imports it at module scope without using it in the code
paths exercised here) and assert that the TPU implementations agree with
the real reference code — closing the shared-misreading hole that a
clean-room NumPy re-implementation (benchmarks/baseline_np.py) leaves open.

Covered:
  - ICP (p2p 3D teapot, p2p/p2l 2D scans) vs utilities/icp.py:132-223
  - rotation_search winner angle vs utilities/features.py:165-242
  - PoseGraph2D.optimize on a fixed noisy loop vs utilities/pose_graph.py:83-134
  - OccupancyGrid2D.update_scan log-odds grid vs utilities/mapping.py:103-141
"""
import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's utilities package with a PyVista stub."""
    if "pyvista" not in sys.modules:
        stub = types.ModuleType("pyvista")
        stub.ImageData = object  # touched only in viz methods we never call
        sys.modules["pyvista"] = stub
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utilities import icp as ref_icp
    from utilities import features as ref_features
    from utilities import mapping as ref_mapping
    from utilities import pose_graph as ref_pg
    return types.SimpleNamespace(
        icp=ref_icp, features=ref_features, mapping=ref_mapping, pg=ref_pg
    )


def _rot2(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s], [s, c]])


def _room_scan(rng, n=400, noise=0.003):
    per = n // 4
    t = np.linspace(0, 1, per)
    walls = [
        np.stack([t * 8 - 4, np.full(per, -3.0)], 1),
        np.stack([t * 8 - 4, np.full(per, 3.0)], 1),
        np.stack([np.full(per, -4.0), t * 6 - 3], 1),
        np.stack([np.full(per, 2.0), t * 4 - 3], 1),
    ]
    pts = np.concatenate(walls)
    return pts + rng.normal(scale=noise, size=pts.shape)


# ── ICP ──────────────────────────────────────────────────────────────────


def test_icp_p2p_teapot_matches_reference(ref):
    """The reference's own correctness demo (demos/teapot_icp_demo.py:38-72),
    run through BOTH implementations on the bundled teapot.csv."""
    from icp_tpu.models.icp import icp
    from icp_tpu.utils.masking import pad_points

    original = np.loadtxt(os.path.join(REF, "teapot.csv"), delimiter=",")
    th = np.radians(25.0)
    Ry = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    t_true = np.array([0.25, 0.05, 0.0])
    transformed = original @ Ry.T + t_true

    R_ref, t_ref, err_ref = ref.icp.ICP(
        transformed, original, error_threshold=1e-12, max_iterations=300,
        voxel_size=0.005,
    )

    sp, sm = pad_points(transformed.astype(np.float32), 512)
    tp, tm = pad_points(original.astype(np.float32), 512)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        voxel_size=0.005, method="point_to_point",
        max_iterations=300, error_threshold=1e-12,
    )
    np.testing.assert_allclose(np.asarray(res.R), R_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_ref, atol=2e-3)
    # both must undo the known transform
    np.testing.assert_allclose(np.asarray(res.R), Ry.T, atol=5e-3)
    assert float(res.error) < max(10 * err_ref, 1e-6)


@pytest.mark.parametrize("method", ["point_to_point", "point_to_line"])
def test_icp_2d_matches_reference(ref, method):
    from icp_tpu.models.icp import icp
    from icp_tpu.utils.masking import pad_points

    rng = np.random.default_rng(7)
    target = _room_scan(rng)
    th = 0.07
    R_true, t_true = _rot2(th), np.array([0.15, -0.1])
    source = (target - t_true) @ R_true

    R_ref, t_ref, _ = ref.icp.ICP(
        source, target, error_threshold=1e-11, max_iterations=120,
        voxel_size=0.01, method=method, normal_k=10,
    )

    sp, sm = pad_points(source.astype(np.float32), 512)
    tp, tm = pad_points(target.astype(np.float32), 512)
    res = icp(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.eye(2, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
        voxel_size=0.01, method=method, max_iterations=120,
        normal_k=10, error_threshold=1e-11,
    )
    # same solution as the real reference code (f32 vs f64, different NN
    # tie-breaks: tolerances are loose-ish but far below algorithmic error)
    np.testing.assert_allclose(np.asarray(res.R), R_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_ref, atol=2e-2)
    # and both undo the ground-truth transform
    # sanity: both land near the ground truth (p2p on noisy walls converges
    # a little short of it — identically in both implementations, which is
    # what the allclose asserts above already proved)
    got_th = np.arctan2(np.asarray(res.R)[1, 0], np.asarray(res.R)[0, 0])
    ref_th = np.arctan2(R_ref[1, 0], R_ref[0, 0])
    assert abs(got_th - th) < 2e-2 and abs(ref_th - th) < 2e-2


def test_icp_gate_abort_matches_reference(ref):
    """Disjoint clouds: the inlier gate must abort leaving the init pose
    (reference icp.py:183-189)."""
    from icp_tpu.models.icp import icp
    from icp_tpu.utils.masking import pad_points

    rng = np.random.default_rng(8)
    a = rng.uniform(-1, 1, (100, 2))
    b = a + 100.0
    R_ref, t_ref, _ = ref.icp.ICP(
        a, b, error_threshold=1e-10, max_iterations=50, voxel_size=0.05,
        max_corr_dist=0.5,
    )
    np.testing.assert_allclose(R_ref, np.eye(2), atol=1e-9)

    ap, am = pad_points(a.astype(np.float32), 128)
    bp, bm = pad_points(b.astype(np.float32), 128)
    res = icp(
        jnp.asarray(ap), jnp.asarray(am), jnp.asarray(bp), jnp.asarray(bm),
        jnp.eye(2, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
        voxel_size=0.05, method="point_to_point", max_iterations=50,
        error_threshold=1e-10, max_corr_dist=0.5, use_gate=True,
    )
    np.testing.assert_allclose(np.asarray(res.R), R_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.t), t_ref, atol=1e-6)


# ── rotation search ──────────────────────────────────────────────────────


def test_rotation_search_matches_reference(ref):
    from icp_tpu.models.prealign import rotation_search
    from icp_tpu.utils.masking import pad_points

    rng = np.random.default_rng(9)
    target = _room_scan(rng, noise=0.002)
    th = np.deg2rad(57.0)
    source = target @ _rot2(th)  # rotate by -57 deg: search must find +57

    R_ref, t_ref, _ = ref.features.rotation_search(
        source, target, voxel_size=0.3,
        angle_step_coarse=2.0, angle_step_fine=0.2,
    )
    ref_th = np.arctan2(R_ref[1, 0], R_ref[0, 0])

    sp, sm = pad_points(source.astype(np.float32), 512)
    tp, tm = pad_points(target.astype(np.float32), 512)
    R, t, _ = rotation_search(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        voxel_size=0.3, angle_step_coarse=2.0, angle_step_fine=0.2,
    )
    got_th = np.arctan2(np.asarray(R)[1, 0], np.asarray(R)[0, 0])
    # winner angle must match the reference's within one fine step (the
    # voxel means differ slightly → scores can tie-break one bin apart)
    assert abs(got_th - ref_th) <= np.deg2rad(0.2) + 1e-6, (
        f"ours {np.degrees(got_th):.2f} deg vs ref {np.degrees(ref_th):.2f}")
    assert abs(got_th - th) <= np.deg2rad(0.5)
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=0.05)


# ── pose graph ───────────────────────────────────────────────────────────


def _noisy_loop_graph(rng, n=14):
    """Ground-truth circular trajectory + noisy odometry + one loop edge."""
    radius, step_th = 2.0, 2 * np.pi / n
    gt = []
    for k in range(n):
        ang = k * step_th
        gt.append([radius * np.cos(ang), radius * np.sin(ang),
                   ang + np.pi / 2])
    gt = np.array(gt)
    edges = []
    for k in range(n - 1):
        Ti = np.array([[np.cos(gt[k, 2]), -np.sin(gt[k, 2]), gt[k, 0]],
                       [np.sin(gt[k, 2]), np.cos(gt[k, 2]), gt[k, 1]],
                       [0, 0, 1]])
        Tj = np.array([[np.cos(gt[k + 1, 2]), -np.sin(gt[k + 1, 2]), gt[k + 1, 0]],
                       [np.sin(gt[k + 1, 2]), np.cos(gt[k + 1, 2]), gt[k + 1, 1]],
                       [0, 0, 1]])
        z = np.linalg.inv(Ti) @ Tj
        zv = np.array([z[0, 2], z[1, 2], np.arctan2(z[1, 0], z[0, 0])])
        zv += rng.normal(scale=[0.02, 0.02, 0.01])
        edges.append((k, k + 1, zv, np.eye(3) * 10.0))
    # exact loop-closure edge last→first
    Tn = np.array([[np.cos(gt[-1, 2]), -np.sin(gt[-1, 2]), gt[-1, 0]],
                   [np.sin(gt[-1, 2]), np.cos(gt[-1, 2]), gt[-1, 1]],
                   [0, 0, 1]])
    T0 = np.array([[np.cos(gt[0, 2]), -np.sin(gt[0, 2]), gt[0, 0]],
                   [np.sin(gt[0, 2]), np.cos(gt[0, 2]), gt[0, 1]],
                   [0, 0, 1]])
    z = np.linalg.inv(Tn) @ T0
    zv = np.array([z[0, 2], z[1, 2], np.arctan2(z[1, 0], z[0, 0])])
    edges.append((n - 1, 0, zv, np.eye(3) * 100.0))

    # initial guesses: integrate the noisy odometry
    init = [gt[0].copy()]
    for (_, _, zv, _) in edges[:-1]:
        x, y, t0 = init[-1]
        c, s = np.cos(t0), np.sin(t0)
        init.append(np.array([x + c * zv[0] - s * zv[1],
                              y + s * zv[0] + c * zv[1],
                              t0 + zv[2]]))
    return np.array(init), edges


def test_pose_graph_optimize_matches_reference(ref):
    from icp_tpu.models.pose_graph import PoseGraph2D

    rng = np.random.default_rng(10)
    init, edges = _noisy_loop_graph(rng)

    rpg = ref.pg.PoseGraph2D()
    ours = PoseGraph2D()
    for v in init:
        rpg.add_node(v)
        ours.add_node(v)
    for (i, j, z, om) in edges:
        rpg.add_edge(i, j, z, om)
        ours.add_edge(i, j, z, om)

    rpg.optimize(n_iterations=30, fix_node=0, convergence_eps=1e-9)
    ours.optimize(n_iterations=30, fix_node=0, convergence_eps=1e-9)

    ref_nodes = np.stack(rpg.nodes)
    got_nodes = np.stack(ours.nodes)
    # same GN fixed point (f32 vs f64 solve → loose-ish atol)
    np.testing.assert_allclose(got_nodes[:, :2], ref_nodes[:, :2], atol=2e-3)
    dth = (got_nodes[:, 2] - ref_nodes[:, 2] + np.pi) % (2 * np.pi) - np.pi
    assert np.max(np.abs(dth)) < 2e-3


def test_pose_graph_total_error_matches_reference(ref):
    from icp_tpu.models.pose_graph import PoseGraph2D

    rng = np.random.default_rng(11)
    init, edges = _noisy_loop_graph(rng)
    rpg = ref.pg.PoseGraph2D()
    ours = PoseGraph2D()
    for v in init:
        rpg.add_node(v)
        ours.add_node(v)
    for (i, j, z, om) in edges:
        rpg.add_edge(i, j, z, om)
        ours.add_edge(i, j, z, om)
    assert abs(rpg.total_error() - ours.total_error()) < 1e-2 * max(
        rpg.total_error(), 1.0)


# ── services (IMU yaw lookup, lidar parse) ───────────────────────────────


def test_imu_service_matches_reference(ref, tmp_path):
    """Same CSV through both IMU services: identical yaw picks for a grid
    of query times (incl. between-sample ties resolved the same way,
    services/imu_service.py:51-65)."""
    sys.path.insert(0, REF)
    from services.imu_service import IMUService as RefIMU
    from icp_tpu.services.imu import IMUService

    rng = np.random.default_rng(13)
    t0 = 1_000_000_000
    ts = t0 + np.sort(rng.choice(10_000_000, 200, replace=False))
    yaws = rng.uniform(-np.pi, np.pi, 200)
    f = tmp_path / "imu.csv"
    with open(f, "w") as fh:
        for t, y in zip(ts, yaws):
            fh.write(f"{t};0.0;0.0;{np.sin(y / 2):.9f};{np.cos(y / 2):.9f}\n")

    a = RefIMU(str(f))
    b = IMUService(str(f))
    queries = np.concatenate([
        ts - t0,                                       # exact samples
        rng.integers(0, 10_000_000, 300),              # arbitrary
        (ts[:-1] + ts[1:]) // 2 - t0,                  # midpoints (ties)
    ])
    got = b.yaws_at(queries)
    want = np.array([a.yaw_at(int(q)) for q in queries])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_lidar_parse_matches_reference(ref, tmp_path):
    sys.path.insert(0, REF)
    from services.lidar_service import parse_line_lidar_data
    from icp_tpu.services.lidar import parse_lidar_line

    rng = np.random.default_rng(14)
    pts = rng.uniform(-5, 5, (40, 3))
    pts[7] = 0.0                 # all-zero padding triple must be dropped
    pts[21] = 0.0
    line = "123456789;" + ";".join(
        f"{v:.4f}" for row in pts for v in row)
    ts_ref, pts_ref = parse_line_lidar_data(line)
    ts_ours, pts_ours = parse_lidar_line(line)
    assert int(ts_ref) == ts_ours
    np.testing.assert_allclose(pts_ours, pts_ref, atol=1e-6)


# ── occupancy grid ───────────────────────────────────────────────────────


def test_occupancy_update_matches_reference(ref):
    from icp_tpu.models.occupancy import OccupancyGrid2D

    rng = np.random.default_rng(12)
    kw = dict(resolution=0.1, p_hit=0.7, p_miss=0.4,
              log_odds_min=-5.0, log_odds_max=5.0)
    rg = ref.mapping.OccupancyGrid2D(-6, 6, -6, 6, **kw)
    og = OccupancyGrid2D(-6, 6, -6, 6, max_ray_cells=256, **kw)

    for k in range(5):
        origin = rng.uniform(-1, 1, 2)
        ang = rng.uniform(0, 2 * np.pi, 180)
        rad = rng.uniform(1.0, 5.0, 180)
        hits = origin + np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1)
        rg.update_scan(origin, hits)
        og.update_scan(origin.astype(np.float32), hits.astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(og.log_odds), rg.log_odds, atol=1e-3,
    )


# ── feature pipeline stages (utilities/features.py:35-106) ──────────────


def test_curvature_matches_reference(ref):
    rng = np.random.default_rng(3)
    pts = _room_scan(rng, n=200, noise=0.01)
    want = ref.features.compute_curvature(pts, k=10)
    from icp_tpu.ops.eig2 import compute_curvature
    got = np.asarray(compute_curvature(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool), k=10))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_keypoint_nms_matches_reference(ref):
    """Same curvature values into both NMS implementations -> identical
    keypoint index sequences (greedy order preserved)."""
    rng = np.random.default_rng(4)
    pts = _room_scan(rng, n=220, noise=0.01)
    curv = ref.features.compute_curvature(pts, k=10)
    # noise-symmetric points tie in curvature at f32 precision and the two
    # sorts order ties differently; break ties identically for both so the
    # test pins the NMS semantics, not argsort tie order
    curv = curv + np.arange(len(curv)) * 1e-6
    want = ref.features.extract_keypoints(pts, curv, top_n=40, min_dist=0.3)
    from icp_tpu.models.features import extract_keypoints
    ki, km = extract_keypoints(
        jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool),
        jnp.asarray(curv, jnp.float32), top_n=40, min_dist=0.3)
    got = np.asarray(ki)[np.asarray(km)]
    np.testing.assert_array_equal(got, want)


def test_descriptors_match_reference(ref):
    rng = np.random.default_rng(5)
    pts = _room_scan(rng, n=200, noise=0.01)
    kp = np.arange(0, 200, 10)
    want = ref.features.compute_descriptors(pts, kp, k=16)
    from icp_tpu.models.features import compute_descriptors
    n = len(pts)
    kp_idx = np.zeros(len(kp), np.int32)
    kp_idx[:] = kp
    got = np.asarray(compute_descriptors(
        jnp.asarray(pts, jnp.float32), jnp.ones(n, bool),
        jnp.asarray(kp_idx), jnp.ones(len(kp), bool), k=16))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_descriptor_matching_matches_reference(ref):
    """Same descriptors into both ratio-test matchers -> same pairs."""
    rng = np.random.default_rng(6)
    da = rng.normal(size=(30, 16))
    db = np.concatenate([da[:20] + rng.normal(scale=0.01, size=(20, 16)),
                         rng.normal(size=(25, 16)) * 3])
    want = set(ref.features.match_descriptors(da, db, ratio=0.8))
    from icp_tpu.models.features import match_descriptors
    mj, mm = match_descriptors(
        jnp.asarray(da, jnp.float32), jnp.ones(30, bool),
        jnp.asarray(db, jnp.float32), jnp.ones(45, bool), 0.8)
    got = {(i, int(j)) for i, (j, ok) in
           enumerate(zip(np.asarray(mj), np.asarray(mm))) if ok}
    assert got == want
