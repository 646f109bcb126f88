"""Hierarchical coarse initialization for huge pose graphs (round 4).

Block-Jacobi PCG alone propagates corrections only ~cg_iters nodes per
GN step, so on a long drifted odometry chain a terminal loop closure
leaves the far side untouched (the measured 50k-keyframe failure:
ate_stream == ate_final == 1.29 m). The coarse-solve + interpolate
initialization must distribute the correction globally."""
import numpy as np
import pytest

from icp_tpu.models.pose_graph import PoseGraph2D

pytestmark = pytest.mark.slow


def _drifted_loop(n=8000, yaw_bias=None):
    """True trajectory: circle of n steps. Estimates integrate odometry
    with a constant yaw bias -> smoothly drifting chain. Returns
    (pg, true_xy, est_before): graph with odometry edges from the BIASED
    measurements and one strong, TRUE loop closure last->first."""
    if yaw_bias is None:
        yaw_bias = 0.3 / n          # ~0.3 rad total over the loop
    R = 50.0
    dth_true = 2 * np.pi / n
    step_len = 2 * R * np.sin(dth_true / 2)
    true_xy = np.stack([
        R * np.cos(np.arange(n) * dth_true),
        R * np.sin(np.arange(n) * dth_true)], 1)

    pg = PoseGraph2D()
    # integrate biased odometry for the initial estimates
    x, y, th = true_xy[0, 0], true_xy[0, 1], np.pi / 2 + dth_true / 2
    est = np.zeros((n, 3), np.float32)
    z_od = np.array([step_len, 0.0, dth_true + yaw_bias], np.float32)
    for k in range(n):
        est[k] = (x, y, th)
        x += step_len * np.cos(th)
        y += step_len * np.sin(th)
        th += dth_true + yaw_bias
    for k in range(n):
        pg.add_node(est[k])
    info = np.eye(3, dtype=np.float32) * 10.0
    for k in range(1, n):
        pg.add_edge(k - 1, k, z_od, info)
    # true closure: relative pose between last and first TRUE poses
    pg.add_edge(n - 1, 0, _rel_true(true_xy, dth_true, n),
                np.eye(3, dtype=np.float32) * 1e3)
    return pg, true_xy, est


def _rel_true(true_xy, dth_true, n):
    """vec(T_{n-1}^-1 T_0) for the true circle."""
    tha = np.pi / 2 + dth_true / 2 + (n - 1) * dth_true
    thb = np.pi / 2 + dth_true / 2
    ca, sa = np.cos(tha), np.sin(tha)
    d = true_xy[0] - true_xy[n - 1]
    return np.array([ca * d[0] + sa * d[1],
                     -sa * d[0] + ca * d[1],
                     ((thb - tha + np.pi) % (2 * np.pi)) - np.pi],
                    np.float32)


def test_coarse_init_converges_long_chain():
    n = 8000
    pg, true_xy, est = _drifted_loop(n)
    assert n >= pg._coarse_threshold
    err_before = np.linalg.norm(est[:, :2] - true_xy, axis=1)
    pg.optimize(n_iterations=10)           # routes through CG + coarse init
    assert pg.last_strategy == "cg"
    out = np.stack(pg.nodes)
    err_after = np.linalg.norm(out[:, :2] - true_xy, axis=1)
    # the drifted chain's worst error is meters; the coarse-initialized
    # solve must distribute the closure correction across the WHOLE loop
    assert err_before.max() > 5.0, err_before.max()
    assert err_after.max() < 0.25 * err_before.max(), (
        err_before.max(), err_after.max())
    assert err_after.mean() < 0.15 * err_before.mean(), (
        err_before.mean(), err_after.mean())


def test_coarse_correct_endpoints_exact():
    """The interpolation must land every supernode exactly on its
    coarse-solved pose (endpoint-exact blending)."""
    n = 6000
    pg, true_xy, est = _drifted_loop(n)
    stride = max(2, n // 1000)
    pg._coarse_correct(0, stride)
    out = np.stack(pg.nodes)
    # anchored node pinned
    np.testing.assert_allclose(out[0], est[0], atol=1e-5)
    # correction monotone-ish and finite everywhere
    assert np.isfinite(out).all()
    # the closure endpoint moved toward the start (drift was meters)
    d_before = np.linalg.norm(est[-1, :2] - true_xy[-1])
    d_after = np.linalg.norm(out[-1, :2] - true_xy[-1])
    assert d_after < 0.5 * d_before, (d_before, d_after)


def test_coarse_init_with_robust_closure():
    """A TRUE closure flagged robust (DCS) must still close the loop:
    the coarse level applies it un-robustified (before the first global
    correction its residual is the full drift, which DCS would suppress),
    the fine polish then sees small residuals. Regression for the 50k
    run stuck at ATE 0.82 m."""
    n = 8000
    pg, true_xy, est = _drifted_loop(n)
    # re-flag the closure edge (last added) as robust
    pg._edges_rb[-1] = True
    err_before = np.linalg.norm(est[:, :2] - true_xy, axis=1)
    pg.optimize(n_iterations=10)
    out = np.stack(pg.nodes)
    err_after = np.linalg.norm(out[:, :2] - true_xy, axis=1)
    assert err_after.max() < 0.25 * err_before.max(), (
        err_before.max(), err_after.max())
