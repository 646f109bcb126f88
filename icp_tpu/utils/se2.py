"""SE(2) rigid-transform primitives (batched, jit-friendly).

TPU-native re-design of the reference's scattered pose helpers:
  * /root/reference/utilities/pose_graph.py:15-37  (normalize_angle,
    pose_matrix_to_vec, pose_vec_to_matrix, relative_transform_vec)
  * /root/reference/slam.py:38-50                  (apply_incremental_pose_2d,
    transform_points_2d)
  * /root/reference/services/imu_service.py:14-18  (_quat_to_yaw)

Everything here is pure jax.numpy, works on arbitrary leading batch
dimensions, and is safe to call inside jit / shard_map.
"""
from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(a):
    """Wrap angle(s) to (-pi, pi].

    Same semantics as reference ``normalize_angle``
    (/root/reference/utilities/pose_graph.py:15-17).
    """
    return (a + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def rotmat(theta):
    """2x2 rotation matrix/matrices for angle(s) ``theta``.

    ``theta`` may have any shape; output has shape ``theta.shape + (2, 2)``.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def pose_to_vec(T):
    """3x3 homogeneous matrix -> [x, y, theta].

    Reference: pose_matrix_to_vec (/root/reference/utilities/pose_graph.py:20-22).
    Batched: T (..., 3, 3) -> (..., 3).
    """
    return jnp.stack(
        [T[..., 0, 2], T[..., 1, 2], jnp.arctan2(T[..., 1, 0], T[..., 0, 0])],
        axis=-1,
    )


def vec_to_pose(v):
    """[x, y, theta] -> 3x3 homogeneous matrix.

    Reference: pose_vec_to_matrix (/root/reference/utilities/pose_graph.py:25-31).
    Batched: v (..., 3) -> (..., 3, 3).
    """
    x, y, theta = v[..., 0], v[..., 1], v[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row0 = jnp.stack([c, -s, x], axis=-1)
    row1 = jnp.stack([s, c, y], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def pose_inverse(T):
    """Inverse of SE(2) homogeneous matrix, closed form (no linalg.inv).

    (..., 3, 3) -> (..., 3, 3).
    """
    R = T[..., :2, :2]
    t = T[..., :2, 2]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_compose(Ta, Tb):
    """Ta @ Tb for (..., 3, 3) homogeneous SE(2) matrices."""
    return jnp.einsum("...ij,...jk->...ik", Ta, Tb)


def relative_pose_vec(Ti, Tj):
    """z_ij = vec(Ti^-1 @ Tj).

    Reference: relative_transform_vec
    (/root/reference/utilities/pose_graph.py:34-37).
    """
    return pose_to_vec(pose_compose(pose_inverse(Ti), Tj))


def make_pose(R, t):
    """Assemble 3x3 homogeneous matrix from R (..., 2, 2) and t (..., 2)."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(points, pose):
    """Apply 3x3 homogeneous pose to (..., N, 2) points.

    Reference: transform_points_2d (/root/reference/slam.py:46-50).
    """
    R = pose[..., :2, :2]
    t = pose[..., :2, 2]
    return jnp.einsum("...nd,...ed->...ne", points, R) + t[..., None, :]


def apply_rt(points, R, t):
    """points @ R.T + t for (..., N, D) points — the reference's ubiquitous
    forward-transform convention (/root/reference/utilities/icp.py:154,212)."""
    return jnp.einsum("...nd,...ed->...ne", points, R) + t[..., None, :]


def apply_incremental_pose(global_pose, r, t):
    """Accumulate the inverse of ICP's forward transform into the global pose.

    Reference: apply_incremental_pose_2d (/root/reference/slam.py:38-43):
        T_inv = [[r.T, -r.T @ t], [0, 1]];  return global_pose @ T_inv
    """
    rT = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rT, t)
    T_inv = make_pose(rT, ti)
    return pose_compose(global_pose, T_inv)


def quat_to_yaw(qx, qy, qz, qw):
    """Yaw (rotation about z) from quaternion (x, y, z, w).

    Reference: _quat_to_yaw (/root/reference/services/imu_service.py:14-18).
    """
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = 1.0 - 2.0 * (qy * qy + qz * qz)
    return jnp.arctan2(siny_cosp, cosy_cosp)


def yaw_of_pose(T):
    """Extract yaw from a (..., 3, 3) pose matrix."""
    return jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
