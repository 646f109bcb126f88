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
