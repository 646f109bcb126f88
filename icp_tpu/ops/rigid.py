"""Closed-form rigid-alignment solvers (batched, masked).

Replaces the reference's LAPACK calls with TPU-friendly closed forms:

* point-to-point 2D: the reference runs a 2x2 SVD with a reflection fix
  (/root/reference/utilities/icp.py:196-207, utilities/features.py:111-122).
  In 2D the optimal proper rotation has the closed form
  theta = atan2(W01 - W10, W00 + W11) for the cross-covariance
  W = sum_i w_i s_i d_i^T — identical to the det-fixed SVD result, no
  factorization needed. Weighted + masked so correspondence gating is a
  multiply, not a gather.

* point-to-point 3D: 3x3 cross-covariance + jnp.linalg.svd (tiny, once per
  ICP iteration; kept for the reference's 3D demo path,
  /root/reference/utilities/icp.py:162 "falls back to point-to-point for 3-D").

* point-to-line 2D: the reference solves 3x3 normal equations with
  np.linalg.solve (/root/reference/utilities/icp.py:79-115). Here the 3x3
  system is solved by Cramer's rule on the VPU, with the reference's
  singular -> identity fallback expressed as a select.
"""
from __future__ import annotations

import jax.numpy as jnp

from icp_tpu.utils.se2 import rotmat


def _weighted_centroids(src, dst, w):
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    return mu_s, mu_d


def p2p_solve_2d(src, dst, w):
    """Weighted 2D Procrustes: R, t minimizing sum w_i ||R s_i + t - d_i||^2.

    src, dst: (N, 2); w: (N,) nonnegative weights (0 = masked out).
    Matches the SVD+det-fix solution of the reference
    (/root/reference/utilities/icp.py:196-207).
    """
    mu_s, mu_d = _weighted_centroids(src, dst, w)
    s = (src - mu_s) * w[:, None]
    d = dst - mu_d
    # W[i, j] = sum_n w_n s_i d_j
    W = jnp.einsum("ni,nj->ij", s, d)
    theta = jnp.arctan2(W[0, 1] - W[1, 0], W[0, 0] + W[1, 1])
    R = rotmat(theta)
    t = mu_d - R @ mu_s
    return R, t


def p2p_solve_3d(src, dst, w):
    """Weighted 3D Kabsch via 3x3 SVD with reflection fix.

    Reference: /root/reference/utilities/icp.py:196-207 (the same math the
    3D teapot demo exercises).
    """
    mu_s, mu_d = _weighted_centroids(src, dst, w)
    s = (src - mu_s) * w[:, None]
    d = dst - mu_d
    W = jnp.einsum("ni,nj->ij", s, d)                      # (3, 3)
    U, _, Vt = jnp.linalg.svd(W)
    V = Vt.T
    det = jnp.linalg.det(V @ U.T)
    V = V * jnp.array([1.0, 1.0, 1.0])[None, :].astype(W.dtype)
    V = V.at[:, -1].multiply(jnp.sign(det))
    R = V @ U.T
    t = mu_d - R @ mu_s
    return R, t


def solve3x3(M, v, eps=1e-12):
    """Cramer's-rule solve of M x = v for 3x3 M.

    Returns (x, ok) where ok is False when M is (near-)singular — the
    reference treats that as LinAlgError -> identity transform
    (/root/reference/utilities/icp.py:105-108).
    """
    c0 = jnp.cross(M[:, 1], M[:, 2])
    det = jnp.dot(M[:, 0], c0)
    scale = jnp.max(jnp.abs(M)) ** 3 + eps
    ok = jnp.abs(det) > 1e-9 * scale
    safe_det = jnp.where(ok, det, 1.0)
    x0 = jnp.dot(v, c0) / safe_det
    x1 = jnp.dot(M[:, 0], jnp.cross(v, M[:, 2])) / safe_det
    x2 = jnp.dot(M[:, 0], jnp.cross(M[:, 1], v)) / safe_det
    return jnp.stack([x0, x1, x2]), ok


def p2l_solve_2d(src, q, nrm, w):
    """One linearized point-to-line step.

    Minimizes sum w_i (n_i . (R(theta) p_i + t - q_i))^2 under the
    small-angle approximation, then returns the exact R(theta), t.
    Reference: _point_to_line_solve_2d (/root/reference/utilities/icp.py:79-115).

    src: (N, 2) source points; q: (N, 2) matched target points;
    nrm: (N, 2) unit normals at the matches; w: (N,) weights.
    """
    nx, ny = nrm[:, 0], nrm[:, 1]
    px, py = src[:, 0], src[:, 1]
    dx, dy = px - q[:, 0], py - q[:, 1]
    c = ny * px - nx * py
    A = jnp.stack([c, nx, ny], axis=1)                     # (N, 3)
    b = -(nx * dx + ny * dy)                               # (N,)
    Aw = A * w[:, None]
    ATA = A.T @ Aw
    ATb = Aw.T @ b
    x, ok = solve3x3(ATA, ATb)
    theta, t = x[0], x[1:]
    R = rotmat(jnp.where(ok, theta, 0.0))
    t = jnp.where(ok, t, jnp.zeros_like(t))
    return R, t
