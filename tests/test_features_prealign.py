import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.models.features import (
    extract_keypoints, match_descriptors, feature_based_alignment,
)
from icp_tpu.models.prealign import rotation_search, submap_rotation_search, _masked_percentile
from icp_tpu.ops.eig2 import compute_curvature
from icp_tpu.ops.ransac import ransac_align
from icp_tpu.utils.masking import pad_points


def _rot2(th):
    return np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                    dtype=np.float32)


def _scene(rng, n_corner=8, pts_per=40, noise=0.01):
    """2D scene with distinct corners (keypoint-friendly)."""
    pts = []
    centers = rng.uniform(-6, 6, size=(n_corner, 2))
    for c in centers:
        t = np.linspace(0, 1.2, pts_per // 2)
        a1 = rng.uniform(0, 2 * np.pi)
        a2 = a1 + rng.uniform(1.2, 2.0)
        leg1 = c + np.stack([np.cos(a1) * t, np.sin(a1) * t], 1)
        leg2 = c + np.stack([np.cos(a2) * t, np.sin(a2) * t], 1)
        pts.extend([leg1, leg2])
    out = np.concatenate(pts).astype(np.float32)
    return out + rng.normal(scale=noise, size=out.shape).astype(np.float32)


def test_extract_keypoints_greedy_nms_matches_oracle():
    rng = np.random.default_rng(0)
    pts = _scene(rng).astype(np.float64)
    pp, pm = pad_points(pts, 512)
    curv = np.asarray(compute_curvature(jnp.asarray(pp), jnp.asarray(pm), k=10))

    # clean-room oracle of reference extract_keypoints (features.py:57-71)
    n = pts.shape[0]
    order = np.argsort(-curv[:n], kind="stable")  # jnp.argsort is stable
    kp = []
    for idx in order:
        if len(kp) >= 50:
            break
        p = pts[idx]
        if kp and np.min(np.linalg.norm(pts[kp] - p, axis=1)) < 0.3:
            continue
        kp.append(idx)

    kpi, kpm = extract_keypoints(jnp.asarray(pp), jnp.asarray(pm),
                                 jnp.asarray(curv.astype(np.float32)),
                                 top_n=50, min_dist=0.3)
    got = list(np.asarray(kpi)[np.asarray(kpm)])
    assert got == kp


def test_match_descriptors_ratio_test():
    da = np.array([[0.0, 1.0], [5.0, 5.0]], np.float32)
    db = np.array([[0.0, 1.01], [4.0, 4.0], [9.0, 9.0]], np.float32)
    ma = np.ones(2, bool)
    mb = np.ones(3, bool)
    j, ok = match_descriptors(jnp.asarray(da), jnp.asarray(ma),
                              jnp.asarray(db), jnp.asarray(mb), 0.8)
    ok = np.asarray(ok)
    j = np.asarray(j)
    assert ok[0] and j[0] == 0       # clear best match
    # row1 squared dists: [(5-4)^2*2=2, (5-9)^2*2=32]; 2 < 0.64*32 -> passes
    assert ok[1] and j[1] == 1
    # ambiguous case: two nearly-equal candidates must fail the ratio test
    db2 = np.array([[4.9, 4.9], [5.1, 5.1], [0.0, 1.0]], np.float32)
    j2, ok2 = match_descriptors(jnp.asarray(da), jnp.asarray(ma),
                                jnp.asarray(db2), jnp.asarray(mb), 0.8)
    assert not np.asarray(ok2)[1]


def test_ransac_recovers_transform_with_outliers():
    rng = np.random.default_rng(1)
    n = 40
    src = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    R = _rot2(0.7)
    t = np.array([1.0, -2.0], np.float32)
    dst = src @ R.T + t
    dst[30:] += rng.uniform(3, 6, (10, 2)).astype(np.float32)  # 25% outliers
    mask = np.ones(n, bool)
    Rg, tg, n_in = ransac_align(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        jax.random.PRNGKey(0), n_iter=256, inlier_thresh=0.2,
    )
    assert int(n_in) >= 28
    np.testing.assert_allclose(np.asarray(Rg), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tg), t, atol=1e-2)


def test_ransac_degenerate_returns_identity():
    src = np.zeros((8, 2), np.float32)
    dst = np.zeros((8, 2), np.float32)
    mask = np.zeros(8, bool)   # no valid pairs
    Rg, tg, n_in = ransac_align(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        jax.random.PRNGKey(0), n_iter=64,
    )
    assert int(n_in) == 0
    np.testing.assert_allclose(np.asarray(Rg), np.eye(2), atol=1e-6)


def test_rotation_search_finds_large_rotation():
    rng = np.random.default_rng(2)
    target = _scene(rng)
    th = np.deg2rad(117.0)
    R = _rot2(th)
    source = target @ R            # R^T applied -> recover +117 deg
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    Rg, tg, score = rotation_search(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        voxel_size=0.2, angle_step_coarse=2.0, angle_step_fine=0.2,
    )
    got = np.arctan2(np.asarray(Rg)[1, 0], np.asarray(Rg)[0, 0])
    assert abs((got - th + np.pi) % (2 * np.pi) - np.pi) < np.deg2rad(1.0)
    assert float(score) < 0.05


def test_feature_alignment_recovers_transform():
    rng = np.random.default_rng(3)
    target = _scene(rng, noise=0.005)
    th = np.deg2rad(40.0)
    R = _rot2(th)
    t = np.array([0.8, -0.5], np.float32)
    source = (target - t) @ R
    sp, sm = pad_points(source, 512)
    tp, tm = pad_points(target, 512)
    Rg, tg, n_in = feature_based_alignment(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jax.random.PRNGKey(1),
        voxel_size=0.1, top_n=64, ransac_iterations=512,
        inlier_threshold=0.4, ratio_threshold=0.85,
    )
    assert int(n_in) >= 3
    got = np.arctan2(np.asarray(Rg)[1, 0], np.asarray(Rg)[0, 0])
    assert abs(got - th) < 0.1


def test_masked_percentile_matches_numpy():
    rng = np.random.default_rng(4)
    v = rng.uniform(0, 10, 64).astype(np.float32)
    mask = rng.uniform(size=64) < 0.7
    want = np.percentile(v[mask], 80)
    got = float(_masked_percentile(jnp.asarray(v), jnp.asarray(mask), 80.0))
    assert abs(got - want) < 1e-3


def test_submap_rotation_search_corrects_yaw():
    rng = np.random.default_rng(5)
    submap = _scene(rng)
    # local scan = submap rotated into a sensor frame at predicted pose with
    # a 5-degree yaw error
    true_yaw = 0.4
    pred_yaw = true_yaw - np.deg2rad(5.0)
    R_true = _rot2(true_yaw)
    t_true = np.array([0.5, 0.5], np.float32)
    local = (submap - t_true) @ R_true
    pred = np.eye(3, dtype=np.float32)
    pred[:2, :2] = _rot2(pred_yaw)
    pred[:2, 2] = t_true
    sp, sm = pad_points(local, 512)
    tp, tm = pad_points(submap, 512)
    Rg, tg = submap_rotation_search(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(tp), jnp.asarray(tm),
        jnp.asarray(pred), angle_range=10.0, angle_step=1.0, fine_step=0.2,
        voxel_size=0.15,
    )
    got = np.arctan2(np.asarray(Rg)[1, 0], np.asarray(Rg)[0, 0])
    assert abs(got - true_yaw) < np.deg2rad(0.7)
    np.testing.assert_allclose(np.asarray(tg), t_true, atol=0.1)


def test_blocked_nms_equals_sequential():
    """The block-unrolled greedy NMS (extract_keypoints block=B) must equal
    the per-point recurrence (block=1) exactly — order, indices, mask —
    including non-multiple-of-block sizes (padding path)."""
    from icp_tpu.models.features import extract_keypoints
    rng = np.random.default_rng(1)
    for n, block in [(100, 32), (768, 32), (130, 7), (33, 32)]:
        pts = jnp.asarray(rng.normal(0, 2, (n, 2)).astype(np.float32))
        mask = jnp.asarray(rng.random(n) > 0.2)
        curv = jnp.asarray(rng.random(n).astype(np.float32))
        k1, m1 = extract_keypoints(pts, mask, curv, top_n=20,
                                   min_dist=0.4, block=1)
        kb, mb = extract_keypoints(pts, mask, curv, top_n=20,
                                   min_dist=0.4, block=block)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(kb))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(mb))
