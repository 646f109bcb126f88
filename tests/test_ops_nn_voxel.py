import numpy as np
import jax.numpy as jnp
from scipy.spatial import KDTree

from icp_tpu.ops.nn import nn_query, knn_query, nn_query_chunked
from icp_tpu.ops.voxel import voxel_downsample
from icp_tpu.utils.masking import pad_points


def _random_cloud(rng, n, d=2, scale=10.0, offset=0.0):
    return (rng.uniform(-scale, scale, size=(n, d)) + offset).astype(np.float32)


def test_nn_query_matches_kdtree():
    rng = np.random.default_rng(0)
    src = _random_cloud(rng, 137)
    tgt = _random_cloud(rng, 211)
    sp, sm = pad_points(src, 256)
    tp, tm = pad_points(tgt, 256)
    dists, idx = nn_query(jnp.asarray(sp), jnp.asarray(tp), jnp.asarray(tm),
                          jnp.asarray(sm))
    d_ref, i_ref = KDTree(tgt).query(src)
    np.testing.assert_allclose(np.asarray(dists)[:137], d_ref, rtol=1e-4, atol=1e-4)
    # indices can differ on exact ties; distances must agree
    got_pts = tgt[np.asarray(idx)[:137]]
    ref_pts = tgt[i_ref]
    np.testing.assert_allclose(
        np.linalg.norm(got_pts - src, axis=1),
        np.linalg.norm(ref_pts - src, axis=1),
        rtol=1e-4, atol=1e-4,
    )


def test_nn_query_far_from_origin():
    # f32 cancellation guard: clouds centered at (1000, -2000)
    rng = np.random.default_rng(1)
    src = _random_cloud(rng, 100, offset=np.array([1000.0, -2000.0]))
    tgt = _random_cloud(rng, 150, offset=np.array([1000.0, -2000.0]))
    sp, sm = pad_points(src, 128)
    tp, tm = pad_points(tgt, 256)
    dists, _ = nn_query(jnp.asarray(sp), jnp.asarray(tp), jnp.asarray(tm),
                        jnp.asarray(sm))
    d_ref, _ = KDTree(tgt).query(src)
    np.testing.assert_allclose(np.asarray(dists)[:100], d_ref, rtol=1e-3, atol=2e-3)


def test_nn_query_chunked_matches():
    rng = np.random.default_rng(5)
    src = _random_cloud(rng, 300)
    tgt = _random_cloud(rng, 100)
    sp, sm = pad_points(src, 512)
    tp, tm = pad_points(tgt, 128)
    d1, _ = nn_query(jnp.asarray(sp), jnp.asarray(tp), jnp.asarray(tm), jnp.asarray(sm))
    d2, _ = nn_query_chunked(jnp.asarray(sp), jnp.asarray(tp), jnp.asarray(tm),
                             jnp.asarray(sm), chunk=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-4)


def test_knn_matches_kdtree():
    rng = np.random.default_rng(2)
    pts = _random_cloud(rng, 97)
    pp, pm = pad_points(pts, 128)
    k = 11
    dists, idx = knn_query(jnp.asarray(pp), jnp.asarray(pm), jnp.asarray(pp),
                           jnp.asarray(pm), k)
    d_ref, i_ref = KDTree(pts).query(pts, k=k)
    np.testing.assert_allclose(np.asarray(dists)[:97], d_ref, rtol=1e-3, atol=1e-3)


def test_voxel_downsample_matches_numpy():
    # reference: utilities/icp.py:117-129
    rng = np.random.default_rng(3)
    for d in (2, 3):
        pts = _random_cloud(rng, 500, d=d, scale=5.0)
        voxel = 0.7

        min_bound = pts.min(axis=0)
        vi = np.floor((pts - min_bound) / voxel).astype(int)
        uniq, inv = np.unique(vi, axis=0, return_inverse=True)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
        want = np.zeros((len(uniq), d))
        for j in range(d):
            want[:, j] = np.bincount(inv, weights=pts[:, j], minlength=len(uniq))
        want /= counts[:, None]

        pp, pm = pad_points(pts, 512)
        out, om = voxel_downsample(jnp.asarray(pp), jnp.asarray(pm), voxel)
        out, om = np.asarray(out), np.asarray(om)
        assert om.sum() == len(uniq)
        np.testing.assert_allclose(out[: len(uniq)], want, rtol=1e-4, atol=1e-4)


def test_voxel_downsample_with_padding_mask():
    rng = np.random.default_rng(4)
    pts = _random_cloud(rng, 50, scale=2.0)
    pp, pm = pad_points(pts, 128)
    out, om = voxel_downsample(jnp.asarray(pp), jnp.asarray(pm), 0.5)
    out, om = np.asarray(out), np.asarray(om)
    n = om.sum()
    assert 0 < n <= 50
    # all valid outputs lie within the bounding box of the inputs
    assert (out[:n] >= pts.min(0) - 0.5).all() and (out[:n] <= pts.max(0) + 0.5).all()


def test_voxel_downsample_fixed_matches_full():
    """The gather-based truncating path (capacity < N) must agree with the
    scatter-based full path, both when every voxel fits and when voxels
    are dropped (exact lexicographic truncation)."""
    from icp_tpu.ops.voxel import voxel_downsample_fixed

    rng = np.random.default_rng(9)
    for d in (2, 3):
        pts = _random_cloud(rng, 400, d=d, scale=5.0)
        pp, pm = pad_points(pts, 512)
        voxel = 0.6
        full, fm = voxel_downsample(jnp.asarray(pp), jnp.asarray(pm), voxel)
        full, fm = np.asarray(full), np.asarray(fm)
        n_uniq = int(fm.sum())

        for cap in (n_uniq + 37, n_uniq, max(4, n_uniq // 2)):
            out, om = voxel_downsample_fixed(
                jnp.asarray(pp), jnp.asarray(pm), voxel, cap)
            out, om = np.asarray(out), np.asarray(om)
            assert out.shape == (cap, d) and om.shape == (cap,)
            k = min(cap, n_uniq)
            assert om[:k].all() and not om[k:].any()
            np.testing.assert_allclose(out[:k], full[:k],
                                       rtol=1e-5, atol=1e-5)

    # all-masked input: no valid voxels, nothing asserted but shapes/mask
    pp, pm = pad_points(_random_cloud(rng, 10), 64)
    out, om = voxel_downsample_fixed(
        jnp.asarray(pp), jnp.zeros(64, bool), 0.5, 16)
    assert not np.asarray(om).any()
