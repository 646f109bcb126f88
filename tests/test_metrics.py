"""Trajectory metric tests (icp_tpu/utils/metrics.py): ATE/RPE semantics.

The reference has no accuracy evaluation at all (it prints per-scan ICP
error, /root/reference/slam.py:644-647); these metrics back every bench
row, so their conventions (first-pose anchoring, gt_offset, truncation)
are pinned here.
"""
import numpy as np
import pytest

from icp_tpu.utils.metrics import ate, gt_relative, poses_to_xyt, rpe


def _mat(x, y, th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, x], [s, c, y], [0, 0, 1.0]])


def _random_traj(n, seed=0, step=0.3):
    rng = np.random.default_rng(seed)
    th = np.cumsum(rng.uniform(-0.2, 0.2, n))
    xy = np.cumsum(
        step * np.stack([np.cos(th), np.sin(th)], axis=1), axis=0)
    return np.concatenate([xy, th[:, None]], axis=1)


def test_poses_to_xyt_roundtrip():
    traj = _random_traj(50, seed=3)
    mats = np.stack([_mat(*p) for p in traj])
    back = poses_to_xyt(mats)
    np.testing.assert_allclose(back[:, :2], traj[:, :2], atol=1e-12)
    np.testing.assert_allclose(
        np.angle(np.exp(1j * (back[:, 2] - traj[:, 2]))), 0, atol=1e-12)


def test_gt_relative_anchors_first_pose():
    traj = _random_traj(20, seed=1)
    rel = gt_relative(traj)
    np.testing.assert_allclose(rel[0], 0, atol=1e-12)
    # pairwise distances are preserved (rigid change of frame)
    d0 = np.linalg.norm(np.diff(traj[:, :2], axis=0), axis=1)
    d1 = np.linalg.norm(np.diff(rel[:, :2], axis=0), axis=1)
    np.testing.assert_allclose(d0, d1, atol=1e-12)


def test_ate_zero_for_exact_estimate():
    gt = _random_traj(30, seed=2)
    est = gt_relative(gt)[1:, :2]          # engine frame, offset 1
    assert ate(est, gt) < 1e-12


def test_ate_equals_constant_offset():
    gt = _random_traj(30, seed=4)
    est = gt_relative(gt)[1:, :2] + [0.3, -0.4]
    assert abs(ate(est, gt) - 0.5) < 1e-9


def test_ate_truncates_to_common_length():
    gt = _random_traj(30, seed=5)
    full = gt_relative(gt)[1:, :2]
    assert ate(full[:10], gt) < 1e-12      # engine stopped early
    gt_short = gt[:11]                     # gt shorter than the estimate
    assert ate(full, gt_short) < 1e-12


def test_rpe_separates_drift_from_local_error():
    gt = _random_traj(200, seed=6)
    rel = gt_relative(gt)[1:]
    # slow global drift: +1 mm/step in x, perfect local increments except
    # for the rotation the drift itself induces (negligible here)
    drift = rel.copy()
    drift[:, 0] += 0.001 * np.arange(len(rel))
    t_ate = ate(drift[:, :2], gt)
    t_rpe, r_rpe = rpe(drift, gt)
    assert t_ate > 0.05                    # ATE sees the accumulated drift
    assert t_rpe < 0.0015                  # RPE sees only the 1 mm/step
    assert r_rpe < 1e-9
    # conversely: zero-mean local noise moves RPE but barely moves ATE
    rng = np.random.default_rng(7)
    noisy = rel.copy()
    noisy[:, :2] += rng.normal(0, 0.01, (len(rel), 2))
    t_rpe_n, _ = rpe(noisy, gt)
    assert t_rpe_n > 0.005


def test_indexed_alignment_survives_rejections():
    """A rejected scan appends no pose; positional alignment then pairs
    every later estimate with the wrong ground-truth row. With explicit
    indices the metric stays exact."""
    gt = _random_traj(60, seed=9)
    rel = gt_relative(gt)
    kept = np.array([k for k in range(1, 60) if k not in (10, 11, 37)])
    est = rel[kept]
    # positional mapping is now wrong past the first gap ...
    assert ate(est[:, :2], gt) > 0.01
    # ... indexed mapping is exact, for ATE and RPE alike
    assert ate(est[:, :2], gt, indices=kept) < 1e-12
    t, r = rpe(est, gt, indices=kept)
    assert t < 1e-12 and r < 1e-12
    # out-of-range indices are dropped, not an error
    assert ate(est[:, :2], gt[:40], indices=kept) < 1e-12


def test_engine_pose_scan_indices_contract(tmp_path):
    """SlamEngine records the input-stream index of every accepted pose,
    monotone and gap-marking, and it round-trips through checkpoints."""
    import jax
    from icp_tpu.engine import SlamEngine, filter_and_flatten
    from icp_tpu.services.lidar import LidarService
    from icp_tpu.utils.config import SlamConfig
    from icp_tpu.utils.synth import generate_sequence

    lidar_f = str(tmp_path / "l.csv")
    imu_f = str(tmp_path / "i.csv")
    generate_sequence(lidar_f, imu_f, n_scans=14, n_beams=180,
                      noise=0.005, trajectory="straight", seed=11)
    cfg = SlamConfig.from_dict({
        "icp": {"voxel_size": 0.08, "max_iterations": 10,
                "error_reject_threshold": 0.5},
        "features": {"method": "rotation_search",
                     "rotation_voxel_size": 0.3,
                     "angle_step_coarse": 12.0, "angle_step_fine": 4.0},
        "submap": {"enabled": False}, "loop_closure": {"enabled": False},
        "filter": {"z_min": 0.0, "z_max": 3.0},
    })
    eng = SlamEngine(cfg, verbose=False)
    scans = [filter_and_flatten(pts, 0.0, 3.0)
             for _, _, pts in LidarService(lidar_f).scans()]
    # a 10 cm blob can't register against a room-sized scan: forces a
    # rejection (and so a gap in the index stream) at position 5; a
    # <10-point scan at position 8 must consume a stream slot the same
    # way (degenerate gate, reference slam.py:384-385)
    rng = np.random.default_rng(0)
    scans[5] = rng.uniform(-0.05, 0.05, (64, 2)).astype(np.float32)
    scans[8] = scans[8][:6]
    scans[13] = rng.uniform(-0.05, 0.05, (64, 2)).astype(np.float32)
    for k, pts in enumerate(scans):
        eng.process_scan(pts, float(k * 1e5))
    eng.finish()
    assert eng.stats.rejected >= 3
    idx = eng.pose_scan_indices
    assert len(idx) == len(eng.pose_trajectory)
    assert len(idx) > 0 and np.all(np.diff(idx) >= 1)
    assert 5 not in idx
    assert 8 not in idx
    assert 13 not in idx
    assert idx[-1] == len(scans) - 2       # no cumulative index shift
    assert eng.scan_history[0].scan_idx == 0
    # accepted+rejected covers every non-first scan exactly once
    assert eng.stats.rejected + len(idx) == eng.stats.scans

    ck = str(tmp_path / "ck.npz")
    eng.save_checkpoint(ck)
    eng2 = SlamEngine(cfg, verbose=False)
    eng2.load_checkpoint(ck)
    np.testing.assert_array_equal(eng2.pose_scan_indices, idx)
    # counters persist EXPLICITLY: the run ended on a rejection, so the
    # legacy last-accepted-index inference (idx[-1]) would under-count and
    # a resumed run would re-issue already-consumed scan_idx values
    assert eng2.stats.scans == eng.stats.scans == len(scans) - 1
    assert eng2.stats.rejected == eng.stats.rejected

    # the modular path (tpu.fused: false) must assign identical indices
    cfg_mod = SlamConfig.from_dict({
        "icp": {"voxel_size": 0.08, "max_iterations": 10,
                "error_reject_threshold": 0.5},
        "features": {"method": "rotation_search",
                     "rotation_voxel_size": 0.3,
                     "angle_step_coarse": 12.0, "angle_step_fine": 4.0},
        "submap": {"enabled": False}, "loop_closure": {"enabled": False},
        "filter": {"z_min": 0.0, "z_max": 3.0},
        "tpu": {"fused": False},
    })
    eng3 = SlamEngine(cfg_mod, verbose=False)
    assert not eng3._fused_eligible
    for k, pts in enumerate(scans):
        eng3.process_scan(pts, float(k * 1e5))
    eng3.finish()
    np.testing.assert_array_equal(eng3.pose_scan_indices, idx)


def test_indexed_coverage_guard():
    """indices= filtering must not silently score a fraction of the
    trajectory: all-out-of-range raises (was: NaN), majority-dropped
    warns with the dropped count."""
    import warnings

    gt = _random_traj(60, seed=9)
    rel = gt_relative(gt)
    kept = np.arange(1, 60)
    est = rel[kept]
    with pytest.raises(ValueError, match="all .* map outside"):
        ate(est[:, :2], gt[:1], indices=kept)
    with pytest.raises(ValueError, match="all .* map outside"):
        rpe(est, gt[:1], indices=kept)
    with pytest.warns(RuntimeWarning, match="dropped"):
        ate(est[:, :2], gt[:20], indices=kept)
    # full coverage stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert ate(est[:, :2], gt, indices=kept) < 1e-12


def test_rpe_zero_for_exact_estimate_and_accepts_matrices():
    gt = _random_traj(40, seed=8)
    rel = gt_relative(gt)[1:]
    mats = np.stack([_mat(*p) for p in rel])
    t, r = rpe(mats, gt)
    assert t < 1e-12 and r < 1e-12
    with pytest.raises(ValueError):
        rpe(rel[:2], gt, delta=5)
