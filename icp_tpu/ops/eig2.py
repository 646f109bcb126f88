"""Batched closed-form 2x2 symmetric eigensolve, normals, and curvature.

The reference loops over every point calling ``np.cov`` + ``np.linalg.eigh``
(/root/reference/utilities/icp.py:51-76 for normals,
/root/reference/utilities/features.py:35-54 for curvature) — an O(N)
Python/LAPACK round-trip per point. A 2x2 symmetric eigenproblem has a closed
form, so on TPU the whole cloud is solved at once on the VPU: one kNN gather,
one batched covariance, a handful of elementwise ops.

Covariance uses ddof=1 (matching ``np.cov`` defaults) over the k+1 neighbors
(self included, because the reference queries k+1 on the same cloud).
"""
from __future__ import annotations

import jax.numpy as jnp

from icp_tpu.ops.nn import pairwise_sqdist
from icp_tpu.utils.masking import masked_centroid


def eigh2x2(a, b, c):
    """Eigen-decomposition of batched symmetric [[a, b], [b, c]].

    Returns (lmin, lmax, vmin) where vmin (..., 2) is the unit eigenvector of
    the smallest eigenvalue (sign arbitrary, as with LAPACK).
    """
    half_tr = 0.5 * (a + c)
    half_diff = 0.5 * (a - c)
    rad = jnp.sqrt(half_diff * half_diff + b * b)
    lmin = half_tr - rad
    lmax = half_tr + rad
    # Two candidate null-vectors of (cov - lmin I); pick the better conditioned.
    v1 = jnp.stack([b, lmin - a], axis=-1)
    v2 = jnp.stack([lmin - c, b], axis=-1)
    n1 = jnp.sum(v1 * v1, axis=-1)
    n2 = jnp.sum(v2 * v2, axis=-1)
    v = jnp.where((n1 >= n2)[..., None], v1, v2)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 0.0))
    # Isotropic neighborhoods (rad ~ 0): any direction is an eigenvector.
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0], v.dtype), v.shape)
    v = jnp.where(norm > 1e-20, v / jnp.maximum(norm, 1e-20), fallback)
    return lmin, lmax, v


def _neighbor_cov(points, mask, k: int):
    """Batched ddof=1 covariance over each point's k+1 nearest neighbors.

    Returns (a, b, c, cnt): covariance entries per point and the number of
    valid neighbors used.

    TPU shape: a k-NN sort of the (N, N) distance matrix plus an
    (N, k+1, 2) gather is the slow way to get neighbor SUMS — ``top_k``
    lowers to a full row sort and element gathers run near-scalar
    (BENCHMARKS.md). Instead: extract the exact (k+1)-th smallest distance
    per row with k+1 cheap min+mask passes (no sort, no gathers), then
    accumulate the neighbor moments with masked row reductions where
    weight = (d <= threshold). Exactly the k+1 nearest per row except
    under exact distance TIES at the threshold (then all tied points are
    included) — measure-zero for f32 point clouds.
    """
    center = masked_centroid(points, mask)
    p = points - center                     # translation-invariant cov
    d0 = pairwise_sqdist(p, p, mask)        # (N, N); masked cols BIG
    d = d0
    thresh = None
    for _ in range(k + 1):
        thresh = jnp.min(d, axis=-1)
        d = jnp.where(d <= thresh[:, None], jnp.inf, d)
    w = ((d0 <= thresh[:, None]) & mask[None, :]).astype(points.dtype)

    cnt = jnp.sum(w, axis=-1)                               # (N,)
    cntc = jnp.maximum(cnt, 1.0)
    mx = (w @ p[:, 0]) / cntc
    my = (w @ p[:, 1]) / cntc
    # second moments about each row's own neighborhood mean (precise in
    # f32; expanding sum(x^2) - n*mean^2 would cancel catastrophically)
    dx = p[None, :, 0] - mx[:, None]
    dy = p[None, :, 1] - my[:, None]
    denom = jnp.maximum(cnt - 1.0, 1.0)
    a = jnp.sum(w * dx * dx, axis=-1) / denom
    b = jnp.sum(w * dx * dy, axis=-1) / denom
    c = jnp.sum(w * dy * dy, axis=-1) / denom
    return a, b, c, cnt


def estimate_normals(points, mask, k: int = 10):
    """Unit 2D normals via PCA of k nearest neighbors (batched).

    Reference: estimate_normals_2d (/root/reference/utilities/icp.py:51-76).
    Returns (N, 2) unit normals (sign arbitrary; the point-to-line solve is
    sign-invariant).
    """
    a, b, c, _ = _neighbor_cov(points, mask, k)
    _, _, v = eigh2x2(a, b, c)
    return v


def compute_curvature(points, mask, k: int = 10):
    """PCA curvature lmin / (lmax + 1e-10) in [0, 1] per point (batched).

    Reference: compute_curvature (/root/reference/utilities/features.py:35-54).
    Points with fewer than 3 valid neighbors get curvature 0, matching the
    reference's ``len(nbrs) < 3: continue``.
    """
    a, b, c, cnt = _neighbor_cov(points, mask, k)
    lmin, lmax, _ = eigh2x2(a, b, c)
    curv = jnp.maximum(lmin, 0.0) / (lmax + 1e-10)
    return jnp.where((cnt >= 3) & mask, curv, 0.0)
