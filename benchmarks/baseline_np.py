"""NumPy/SciPy mini-reference of the SLAM pipeline (clean-room).

Serves two purposes (SURVEY.md §4, §6):
  * the measured CPU baseline for bench.py speedup numbers — equivalent
    algorithms to the reference (KDTree correspondence search, per-point
    eigh normals, sequential angle sweeps, dense pose-graph GN);
  * the parity oracle for trajectory A/B tests on identical inputs.

Written from the documented semantics of /root/reference (file:line cites
inline); not a copy — structure and vectorization differ, behavior matches.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import KDTree


def voxel_downsample(points, voxel_size):
    """Mean per voxel (reference utilities/icp.py:117-129)."""
    mn = points.min(axis=0)
    idx = np.floor((points - mn) / voxel_size).astype(np.int64)
    uniq, inv = np.unique(idx, axis=0, return_inverse=True)
    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    out = np.stack([
        np.bincount(inv, weights=points[:, d], minlength=len(uniq))
        for d in range(points.shape[1])
    ], axis=1)
    return out / cnt[:, None]


def estimate_normals(points, k=10):
    """PCA normals, per-point eigh loop (reference utilities/icp.py:51-76)."""
    n = len(points)
    k = min(k, n - 1)
    tree = KDTree(points)
    _, nn = tree.query(points, k=k + 1)
    normals = np.zeros_like(points)
    for i in range(n):
        cov = np.cov(points[nn[i]].T)
        _, vecs = np.linalg.eigh(cov)
        normals[i] = vecs[:, 0]
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True),
                          1e-10)
    return normals


def p2l_step(src, tgt, normals, nn_idx):
    """Linearized point-to-line solve (reference utilities/icp.py:79-115)."""
    q = tgt[nn_idx]
    nm = normals[nn_idx]
    nx, ny = nm[:, 0], nm[:, 1]
    px, py = src[:, 0], src[:, 1]
    c = ny * px - nx * py
    A = np.column_stack([c, nx, ny])
    b = -(nx * (px - q[:, 0]) + ny * (py - q[:, 1]))
    try:
        x = np.linalg.solve(A.T @ A, A.T @ b)
    except np.linalg.LinAlgError:
        return np.eye(2), np.zeros(2)
    th, tx, ty = x
    c_, s_ = np.cos(th), np.sin(th)
    return np.array([[c_, -s_], [s_, c_]]), np.array([tx, ty])


def p2p_step(src, dst):
    """SVD Procrustes with reflection fix (reference utilities/icp.py:196-207)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    W = (src - mu_s).T @ (dst - mu_d)
    U, _, Vt = np.linalg.svd(W)
    R = (U @ Vt).T
    if np.linalg.det(R) < 0:
        Vt[-1] *= -1
        R = (U @ Vt).T
    return R, mu_d - R @ mu_s


def icp(source, target, error_threshold, max_iterations, voxel_size,
        R_init=None, t_init=None, method="point_to_point", normal_k=10,
        max_corr_dist=None):
    """ICP driver matching reference semantics (utilities/icp.py:132-223)."""
    src = voxel_downsample(source, voxel_size)
    tgt = voxel_downsample(target, voxel_size)
    if R_init is not None:
        cur = src @ R_init.T + t_init
        R_tot, t_tot = R_init.copy(), t_init.copy()
    else:
        cur = src.copy()
        R_tot = np.eye(src.shape[1])
        t_tot = np.zeros(src.shape[1])

    use_p2l = method == "point_to_line" and src.shape[1] == 2
    normals = estimate_normals(tgt, normal_k) if use_p2l else None
    tree = KDTree(tgt)
    max_sq = max_corr_dist ** 2 if max_corr_dist is not None else None

    prev_err = np.inf
    err = np.inf
    for _ in range(max_iterations):
        d, idx = tree.query(cur)
        near = tgt[idx]
        if max_sq is not None:
            inl = d ** 2 < max_sq
            if inl.sum() < max(3, len(cur) // 10):
                break
        else:
            inl = np.ones(len(cur), bool)
        if use_p2l:
            r, t = p2l_step(cur[inl], tgt, normals, idx[inl])
        else:
            r, t = p2p_step(cur[inl], near[inl])
        R_tot = r @ R_tot
        t_tot = t_tot @ r.T + t
        cur = cur @ r.T + t
        err = np.mean(np.sum((near - cur) ** 2, axis=1))
        if abs(prev_err - err) < error_threshold:
            break
        prev_err = err
    return R_tot, t_tot, err


def rotation_sweep(src, tgt, pred_t, angles, tree=None):
    """Score = mean squared NN distance at each angle (reference
    utilities/features.py:213-224, slam.py:138-151)."""
    if tree is None:
        tree = KDTree(tgt)
    scores = np.empty(len(angles))
    for i, a in enumerate(angles):
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, -s], [s, c]])
        placed = src @ R.T + pred_t
        d, _ = tree.query(placed)
        scores[i] = np.mean(d ** 2)
    return scores


def submap_rotation_search(src_local, submap, predicted, angle_range,
                           angle_step, fine_step, voxel_size):
    """Reference _submap_rotation_search (slam.py:111-183)."""
    src = voxel_downsample(src_local, voxel_size)
    tgt = voxel_downsample(submap, voxel_size)
    if len(src) < 5 or len(tgt) < 5:
        return predicted[:2, :2], predicted[:2, 2]
    pred_t = predicted[:2, 2]
    pred_th = np.arctan2(predicted[1, 0], predicted[0, 0])
    tree = KDTree(tgt)
    offs = np.deg2rad(np.arange(-angle_range, angle_range + angle_step,
                                angle_step))
    angles = pred_th + offs
    sc = rotation_sweep(src, tgt, pred_t, angles, tree)
    best = angles[int(np.argmin(sc))]
    fine = np.arange(best - np.deg2rad(angle_step),
                     best + np.deg2rad(angle_step), np.deg2rad(fine_step))
    if len(fine):
        sc_f = rotation_sweep(src, tgt, pred_t, fine, tree)
        best = fine[int(np.argmin(sc_f))]
    c, s = np.cos(best), np.sin(best)
    Rb = np.array([[c, -s], [s, c]])
    rot_src = src @ Rb.T
    d, idx = tree.query(rot_src + pred_t)
    dsq = d ** 2
    thr = np.percentile(dsq, 80)
    inl = dsq <= thr
    if inl.sum() >= 5:
        t_ref = np.mean(tgt[idx][inl] - rot_src[inl], axis=0)
    else:
        t_ref = pred_t
    return Rb, t_ref


def global_rotation_search(source, target, voxel_size, step_coarse, step_fine):
    """Reference rotation_search (utilities/features.py:165-242)."""
    src = voxel_downsample(source, voxel_size)
    tgt = voxel_downsample(target, voxel_size)
    if len(src) < 5 or len(tgt) < 5:
        return np.eye(2), np.zeros(2), np.inf
    mu_s, mu_t = src.mean(0), tgt.mean(0)
    src_c = src - mu_s
    tree = KDTree(tgt)
    coarse = np.deg2rad(np.arange(-180, 180, step_coarse))
    sc = rotation_sweep(src_c, tgt, mu_t, coarse, tree)
    best = coarse[int(np.argmin(sc))]
    fine = np.arange(best - np.deg2rad(step_coarse),
                     best + np.deg2rad(step_coarse), np.deg2rad(step_fine))
    sc_f = rotation_sweep(src_c, tgt, mu_t, fine, tree)
    i = int(np.argmin(sc_f))
    best = fine[i]
    c, s = np.cos(best), np.sin(best)
    R = np.array([[c, -s], [s, c]])
    return R, mu_t - R @ mu_s, sc_f[i]


class BaselineSlam:
    """Per-scan pipeline: IMU-initialized s2s ICP + submap correction
    (reference slam.py:455-562, loop closure omitted for the bench)."""

    def __init__(self, cfg, imu_yaws=None):
        self.cfg = cfg
        self.imu_yaws = imu_yaws        # optional precomputed per-scan yaw
        self.global_pose = np.eye(3)
        self.prev = None
        self.k = 0
        self.submap = []
        self.trajectory = []
        self.traj_indices = []      # input-stream index per trajectory pose

    def step(self, points):
        cfg = self.cfg
        if self.prev is None:
            self.prev = points
            g = points @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
            self.submap.append(g)
            self.k += 1
            return
        if self.imu_yaws is not None:
            d = self.imu_yaws[self.k] - self.imu_yaws[self.k - 1]
            c, s = np.cos(d), np.sin(d)
            R0, t0 = np.array([[c, -s], [s, c]]), np.zeros(2)
        else:
            R0, t0, _ = global_rotation_search(
                self.prev, points, cfg["rotation_voxel_size"],
                cfg["angle_step_coarse"], cfg["angle_step_fine"])
        r, t, err = icp(
            self.prev, points, cfg["error_threshold"], cfg["max_iterations"],
            cfg["voxel_size"], R0, t0, method=cfg["method"],
            normal_k=cfg["normal_k"])
        # scan rejection gate (reference slam.py:485-490)
        if err > cfg.get("error_reject_threshold", 0.5):
            self.prev = points
            self.k += 1
            return
        T_inv = np.eye(3)
        T_inv[:2, :2] = r.T
        T_inv[:2, 2] = -r.T @ t
        self.global_pose = self.global_pose @ T_inv

        if self.submap and cfg.get("submap_enabled", True):
            comb = voxel_downsample(np.concatenate(self.submap),
                                    cfg["submap_voxel"])
            imu_yaw = (self.imu_yaws[self.k] - self.imu_yaws[0]
                       if self.imu_yaws is not None else None)
            pred = self.global_pose.copy()
            if imu_yaw is not None:
                c, s = np.cos(imu_yaw), np.sin(imu_yaw)
                pred[:2, :2] = [[c, -s], [s, c]]
                rng_, st_ = cfg["imu_narrow"], 0.5
            else:
                rng_, st_ = cfg["sub_rot_range"], cfg["sub_rot_step"]
            Rs, ts = submap_rotation_search(
                points, comb, pred, rng_, st_, cfg["sub_rot_fine"],
                cfg["sub_rot_voxel"])
            r2, t2, err2 = icp(
                points, comb, cfg["error_threshold"], cfg["max_iterations"],
                cfg["voxel_size"], Rs, ts, method="point_to_point",
                max_corr_dist=cfg["sub_corr_dist"])
            if err2 <= cfg["error_reject_threshold"]:
                pos_diff = np.linalg.norm(t2 - self.global_pose[:2, 2])
                if pos_diff < cfg["sub_corr_dist"]:
                    P = np.eye(3)
                    P[:2, :2] = r2
                    P[:2, 2] = t2
                    self.global_pose = P

        g = points @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
        self.submap.append(g)
        if len(self.submap) > cfg.get("submap_size", 30):
            self.submap.pop(0)
        self.trajectory.append(self.global_pose.copy())
        self.traj_indices.append(self.k)
        self.prev = points
        self.k += 1
