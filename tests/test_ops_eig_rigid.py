import numpy as np
import jax.numpy as jnp
from scipy.spatial import KDTree

from icp_tpu.ops.eig2 import eigh2x2, estimate_normals, compute_curvature
from icp_tpu.ops.rigid import p2p_solve_2d, p2p_solve_3d, p2l_solve_2d, solve3x3
from icp_tpu.utils.masking import pad_points


def _rot2(th):
    return np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])


def test_eigh2x2_matches_lapack():
    rng = np.random.default_rng(0)
    for _ in range(50):
        M = rng.normal(size=(2, 2))
        cov = M @ M.T
        lmin, lmax, v = eigh2x2(
            jnp.float32(cov[0, 0]), jnp.float32(cov[0, 1]), jnp.float32(cov[1, 1])
        )
        w_ref, v_ref = np.linalg.eigh(cov)
        assert abs(float(lmin) - w_ref[0]) < 1e-4 * max(1, abs(w_ref[0]))
        assert abs(float(lmax) - w_ref[1]) < 1e-4 * max(1, abs(w_ref[1]))
        # eigenvector up to sign
        dot = abs(float(jnp.dot(v, jnp.asarray(v_ref[:, 0], dtype=jnp.float32))))
        assert dot > 1 - 1e-3


def _np_normals(points, k):
    # clean-room oracle of reference estimate_normals_2d (utilities/icp.py:51-76)
    n = len(points)
    k = min(k, n - 1)
    tree = KDTree(points)
    _, nn_all = tree.query(points, k=k + 1)
    normals = np.zeros_like(points)
    for i in range(n):
        nbrs = points[nn_all[i]]
        cov = np.cov(nbrs.T)
        _, vecs = np.linalg.eigh(cov)
        normals[i] = vecs[:, 0]
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-10)
    return normals


def test_estimate_normals_matches_oracle():
    rng = np.random.default_rng(1)
    # points on a noisy line: normals should be near-perpendicular to the line
    t = np.linspace(0, 10, 80)
    pts = np.stack([t, 0.5 * t], axis=1) + rng.normal(scale=0.01, size=(80, 2))
    pts = pts.astype(np.float32)
    pp, pm = pad_points(pts, 128)
    got = np.asarray(estimate_normals(jnp.asarray(pp), jnp.asarray(pm), k=10))[:80]
    want = _np_normals(pts.astype(np.float64), 10)
    # compare up to sign
    agree = np.abs(np.sum(got * want, axis=1))
    assert (agree > 0.99).mean() > 0.95


def test_curvature_corner_vs_edge():
    # straight-edge points have low curvature, corner points higher
    e = np.stack([np.linspace(0, 5, 60), np.zeros(60)], axis=1)
    corner = np.concatenate(
        [e, np.stack([np.zeros(60), np.linspace(0.1, 5, 60)], axis=1)]
    ).astype(np.float32)
    pp, pm = pad_points(corner, 128)
    curv = np.asarray(compute_curvature(jnp.asarray(pp), jnp.asarray(pm), k=10))
    # the point at the corner (index 0 region) should beat mid-edge points
    assert curv[0] > curv[30] * 2


def test_p2p_solve_2d_recovers_transform():
    rng = np.random.default_rng(2)
    src = rng.uniform(-5, 5, size=(100, 2)).astype(np.float32)
    R = _rot2(0.8).astype(np.float32)
    t = np.array([1.5, -0.3], dtype=np.float32)
    dst = src @ R.T + t
    w = np.ones(100, dtype=np.float32)
    Rg, tg = p2p_solve_2d(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(Rg), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tg), t, atol=1e-3)


def test_p2p_solve_2d_weighted_ignores_outliers():
    rng = np.random.default_rng(3)
    src = rng.uniform(-5, 5, size=(100, 2)).astype(np.float32)
    R = _rot2(-0.4).astype(np.float32)
    t = np.array([0.2, 0.9], dtype=np.float32)
    dst = src @ R.T + t
    dst[90:] += 100.0  # gross outliers
    w = np.ones(100, dtype=np.float32)
    w[90:] = 0.0
    Rg, tg = p2p_solve_2d(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(Rg), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tg), t, atol=1e-3)


def test_p2p_solve_3d_recovers_transform():
    rng = np.random.default_rng(4)
    src = rng.uniform(-2, 2, size=(200, 3)).astype(np.float32)
    th = 25 * np.pi / 180
    R = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        dtype=np.float32,
    )
    t = np.array([0.5, 0.5, -0.2], dtype=np.float32)
    dst = src @ R.T + t
    w = np.ones(200, dtype=np.float32)
    Rg, tg = p2p_solve_3d(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(Rg), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tg), t, atol=1e-3)


def test_solve3x3():
    rng = np.random.default_rng(5)
    M = rng.normal(size=(3, 3)).astype(np.float32)
    v = rng.normal(size=(3,)).astype(np.float32)
    x, ok = solve3x3(jnp.asarray(M), jnp.asarray(v))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(M, v), rtol=1e-3, atol=1e-4)
    # singular case
    Ms = np.zeros((3, 3), dtype=np.float32)
    _, ok2 = solve3x3(jnp.asarray(Ms), jnp.asarray(v))
    assert not bool(ok2)


def test_p2l_solve_matches_oracle():
    # clean-room oracle of _point_to_line_solve_2d (utilities/icp.py:79-115)
    rng = np.random.default_rng(6)
    n = 120
    src = rng.uniform(-4, 4, size=(n, 2))
    q = src + rng.normal(scale=0.1, size=(n, 2))
    nrm = rng.normal(size=(n, 2))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    nx, ny = nrm[:, 0], nrm[:, 1]
    px, py = src[:, 0], src[:, 1]
    dx, dy = px - q[:, 0], py - q[:, 1]
    c = ny * px - nx * py
    A = np.column_stack([c, nx, ny])
    b = -(nx * dx + ny * dy)
    x = np.linalg.solve(A.T @ A, A.T @ b)
    th, tx, ty = x
    R_ref = _rot2(th)

    Rg, tg = p2l_solve_2d(
        jnp.asarray(src, dtype=jnp.float32),
        jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(nrm, dtype=jnp.float32),
        jnp.ones(n, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(Rg), R_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tg), [tx, ty], atol=1e-3)
