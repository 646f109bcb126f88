"""SLAM orchestrator — the TPU-native equivalent of the reference's
run_slam (/root/reference/slam.py:282-657).

Host Python owns only I/O, ring buffers, and accept/reject branching on
scalar results; every per-scan computation (pre-alignment sweep, ICP,
submap matching, occupancy update, pose-graph optimization) is a jitted
device program over fixed-capacity masked tensors. Capacities are constant
across a run so each program compiles once.

Flow per scan (mirrors reference slam.py:377-649):
  1. z-filter -> 2D points, skip degenerate scans (<10 points)
  2. IMU absolute + delta yaw (calibrated at the first scan)
  3. scan-to-scan odometry: IMU-initialized ICP, or pre-alignment
     (rotation_search | features | both | none) + ICP
  4. rejection gate on ICP error
  5. rolling-submap correction with agreement gate
  6. pose-graph node + odometry edge; occupancy update; submap push
  7. loop closure: candidate gates -> verification ICP -> GN optimize ->
     history/submap/map rebuild
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.models.icp import icp
from icp_tpu.models.prealign import rotation_search, submap_rotation_search
from icp_tpu.models.features import feature_based_alignment
from icp_tpu.models.occupancy import OccupancyGrid2D
from icp_tpu.models.pose_graph import PoseGraph2D
from icp_tpu.ops.voxel import voxel_downsample_fixed
from icp_tpu.services.lidar import LidarService
from icp_tpu.services.imu import IMUService
from icp_tpu.utils.config import SlamConfig
from icp_tpu.utils.masking import next_pow2
from icp_tpu.utils import se2


def filter_and_flatten(points, z_min=0.2, z_max=2.0):
    """Keep z in [z_min, z_max], return x,y (reference slam.py:24-27)."""
    mask = (points[:, 2] >= z_min) & (points[:, 2] <= z_max)
    return np.ascontiguousarray(points[mask, :2], dtype=np.float32)


def compute_bounds_from_scan(points_2d, margin=50.0):
    """Grid bounds = first-scan bbox + margin (reference slam.py:30-35)."""
    return (
        float(points_2d[:, 0].min() - margin),
        float(points_2d[:, 0].max() + margin),
        float(points_2d[:, 1].min() - margin),
        float(points_2d[:, 1].max() + margin),
    )


def _pad_fixed(points: np.ndarray, capacity: int):
    """Pad/truncate an (n, 2) host array to capacity; returns jnp arrays."""
    n = min(points.shape[0], capacity)
    out = np.zeros((capacity, 2), np.float32)
    if n > 0:
        out[:n] = points[:n]
        out[n:] = points[0]
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


@dataclass
class ScanRecord:
    points: np.ndarray          # (n, 2) sensor-frame
    pose: np.ndarray            # (3, 3) global


@dataclass
class SlamStats:
    scans: int = 0
    rejected: int = 0
    submap_corrections: int = 0
    loop_closures: int = 0
    icp_iters: int = 0
    wall_registration: float = 0.0
    wall_mapping: float = 0.0
    wall_loop_closure: float = 0.0


class SlamEngine:
    """Streaming SLAM engine. Feed scans via process_scan(); read
    global_pose / pose_trajectory / mapper like the reference's run_slam
    return values (slam.py:657)."""

    def __init__(self, cfg: SlamConfig, imu: IMUService | None = None,
                 verbose: bool = True):
        self.cfg = cfg
        self.imu = imu
        self.verbose = verbose

        self.global_pose = np.eye(3, dtype=np.float32)
        self.pose_trajectory: list[np.ndarray] = []
        self.scan_history: list[ScanRecord] = []
        self.prev_points: np.ndarray | None = None
        self.prev_rel_time = None
        self.mapper: OccupancyGrid2D | None = None
        self.submap_buffer: list[np.ndarray] = []   # global-frame scans
        self.pose_graph = PoseGraph2D()
        self.imu_yaw_offset = 0.0
        self.stats = SlamStats()
        self._key = jax.random.PRNGKey(cfg.ransac_iterations)

        self._cap = cfg.scan_capacity
        self._sub_cap = cfg.submap_capacity

    # ── registration front-end (reference slam.py:53-98) ─────────────────
    def _run_icp_pair(self, source: np.ndarray, target: np.ndarray):
        cfg = self.cfg
        sp, sm = _pad_fixed(source, self._cap)
        tp, tm = _pad_fixed(target, self._cap)
        R_init = jnp.eye(2, dtype=jnp.float32)
        t_init = jnp.zeros(2, jnp.float32)
        have_init = False

        method = cfg.alignment_method
        if method in ("rotation_search", "both"):
            R_init, t_init, _ = rotation_search(
                sp, sm, tp, tm,
                voxel_size=cfg.rotation_voxel_size,
                angle_step_coarse=float(cfg.angle_step_coarse),
                angle_step_fine=float(cfg.angle_step_fine),
            )
            have_init = True

        if method in ("features", "both"):
            if have_init:
                fa_src = np.asarray(
                    se2.apply_rt(sp, R_init, t_init), np.float32
                )
                fp, fm = jnp.asarray(fa_src), sm
            else:
                fp, fm = sp, sm
            self._key, sub = jax.random.split(self._key)
            R_f, t_f, n_in = feature_based_alignment(
                fp, fm, tp, tm, sub,
                voxel_size=cfg.feat_voxel,
                k_curvature=int(cfg.k_curvature),
                top_n=int(cfg.top_n),
                min_kp_dist=cfg.min_kp_dist,
                k_descriptor=int(cfg.k_descriptor),
                ratio_threshold=cfg.ratio_threshold,
                ransac_iterations=int(cfg.ransac_iterations),
                inlier_threshold=cfg.inlier_threshold,
            )
            if int(n_in) >= cfg.min_inliers:
                if have_init:
                    # compose (reference slam.py:84-88)
                    R_init = R_f @ R_init
                    t_init = t_init @ R_f.T + t_f
                else:
                    R_init, t_init = R_f, t_f
                have_init = True

        res = icp(
            sp, sm, tp, tm, R_init, t_init,
            voxel_size=cfg.icp_voxel,
            method=cfg.icp_method,
            max_iterations=int(cfg.icp_max_iterations),
            normal_k=int(cfg.icp_normal_k),
            error_threshold=cfg.icp_error_threshold,
        )
        self.stats.icp_iters += int(res.iters)
        return np.asarray(res.R), np.asarray(res.t), float(res.error)

    # ── submap (reference slam.py:103-225) ───────────────────────────────
    def _build_submap(self):
        combined = np.concatenate(self.submap_buffer, axis=0)
        cap = min(next_pow2(combined.shape[0]), self._sub_cap * 4)
        pts, mask = _pad_fixed(combined, cap)
        return voxel_downsample_fixed(pts, mask, self.cfg.submap_voxel,
                                      self._sub_cap)

    def _attempt_submap_icp(self, points: np.ndarray, predicted: np.ndarray,
                            imu_yaw):
        cfg = self.cfg
        sub_pts, sub_mask = self._build_submap()
        sp, sm = _pad_fixed(points, self._cap)

        pred = predicted.copy()
        if imu_yaw is not None:
            c, s = np.cos(imu_yaw), np.sin(imu_yaw)
            pred[:2, :2] = [[c, -s], [s, c]]
            angle_range, angle_step = cfg.imu_narrow, 0.5
        else:
            angle_range, angle_step = cfg.sub_rot_range, cfg.sub_rot_step

        R_init, t_init = submap_rotation_search(
            sp, sm, sub_pts, sub_mask, jnp.asarray(pred),
            angle_range=float(angle_range),
            angle_step=float(angle_step),
            fine_step=float(cfg.sub_rot_fine),
            voxel_size=cfg.sub_rot_voxel,
        )
        res = icp(
            sp, sm, sub_pts, sub_mask, R_init, t_init,
            voxel_size=cfg.icp_voxel,
            method="point_to_point",
            max_iterations=int(cfg.icp_max_iterations),
            error_threshold=cfg.icp_error_threshold,
            max_corr_dist=cfg.sub_corr_dist,
            use_gate=True,
        )
        self.stats.icp_iters += int(res.iters)
        return np.asarray(res.R), np.asarray(res.t), float(res.error)

    # ── loop closure (reference slam.py:231-268, 565-620) ────────────────
    def _find_loop_candidates(self, cur_idx: int):
        cfg = self.cfg
        n = len(self.scan_history)
        poses = np.stack([r.pose[:2, 2] for r in self.scan_history])
        cur = self.global_pose[:2, 2]
        steps = np.linalg.norm(np.diff(poses, axis=0), axis=1)
        cum = np.concatenate([[0.0], np.cumsum(steps)])
        idx = np.arange(n)
        dist = np.linalg.norm(poses - cur, axis=1)
        travel = cum[min(cur_idx, n - 1)] - cum
        ok = (
            (cur_idx - idx >= cfg.lc_min_interval)
            & (dist < cfg.lc_distance)
            & (travel >= cfg.lc_min_travel)
        )
        cand = [(int(i), float(dist[i])) for i in idx[ok]]
        cand.sort(key=lambda x: x[1])
        return cand[: cfg.lc_max_candidates]

    def _rebuild_map(self):
        """Replay all scans with current poses (reference slam.py:271-277)."""
        self.mapper.reset()
        for rec in self.scan_history:
            origin = rec.pose[:2, 2]
            gp = rec.points @ rec.pose[:2, :2].T + rec.pose[:2, 2]
            self.mapper.update_scan(origin, gp)

    def _try_loop_closure(self, points: np.ndarray, cur_idx: int) -> bool:
        cfg = self.cfg
        candidates = self._find_loop_candidates(cur_idx)
        if candidates and self.verbose:
            print(f"  LC candidates for scan {cur_idx}: "
                  + ", ".join(f"#{ci}({cd:.1f}m)" for ci, cd in candidates))
        closed = False
        for cand_idx, cand_dist in candidates:
            cand_points = self.scan_history[cand_idx].points
            r_lc, t_lc, err_lc = self._run_icp_pair(points, cand_points)
            if self.verbose:
                mark = "ok" if err_lc < cfg.lc_error_threshold else "x"
                print(f"    LC scan {cur_idx}<->{cand_idx}: "
                      f"icp_err={err_lc:.6f}  {mark}")
            if err_lc < cfg.lc_error_threshold:
                # edge z = vec(T_lc^-1)   (reference slam.py:583-593)
                T_lc = np.eye(3, dtype=np.float32)
                T_lc[:2, :2] = r_lc
                T_lc[:2, 2] = t_lc
                z_lc = np.asarray(
                    se2.pose_to_vec(se2.pose_inverse(jnp.asarray(T_lc)))
                )
                lc_info = np.eye(3, dtype=np.float32) * (
                    cfg.lc_info_scale / max(err_lc, 1e-6)
                )
                self.pose_graph.add_edge(cur_idx, cand_idx, z_lc, lc_info)
                if self.verbose:
                    print(f"  * Loop closure accepted: scan {cur_idx} <-> "
                          f"scan {cand_idx} (dist={cand_dist:.2f}m, "
                          f"icp_err={err_lc:.6f})")
                closed = True
                break

        if not closed:
            return False

        self.stats.loop_closures += 1
        self.pose_graph.optimize(n_iterations=cfg.lc_opt_iters, fix_node=0)
        corrected = self.pose_graph.get_poses_as_matrices()
        for k, rec in enumerate(self.scan_history):
            rec.pose = corrected[k]
        self.global_pose = corrected[len(self.scan_history) - 1].copy()
        self.pose_trajectory = [r.pose for r in self.scan_history[1:]]

        if cfg.submap_enabled:
            self.submap_buffer = [
                rec.points @ rec.pose[:2, :2].T + rec.pose[:2, 2]
                for rec in self.scan_history[-cfg.submap_size:]
            ]
        if self.mapper is not None:
            if self.verbose:
                print("  Rebuilding occupancy grid ...")
            self._rebuild_map()
        return True

    # ── per-scan state machine ───────────────────────────────────────────
    def process_scan(self, points_2d: np.ndarray, rel_time_us=None) -> bool:
        """Process one z-filtered 2D scan. Returns True if it advanced the
        trajectory (False for init/skip/reject)."""
        cfg = self.cfg
        if points_2d.shape[0] < 10:        # degenerate (slam.py:384-385)
            return False

        # first scan initialization (slam.py:388-453)
        if self.prev_points is None:
            self.prev_points = points_2d
            self.prev_rel_time = rel_time_us
            if self.imu is not None and rel_time_us is not None:
                self.imu_yaw_offset = self.imu.yaw_at(rel_time_us)
                if self.verbose:
                    print(f"  [IMU] Calibrated initial yaw offset: "
                          f"{np.degrees(self.imu_yaw_offset):.1f} deg")
            bounds = compute_bounds_from_scan(points_2d, cfg.map_margin)
            self.mapper = OccupancyGrid2D(
                *bounds,
                resolution=cfg.map_resolution,
                p_hit=cfg.p_hit, p_miss=cfg.p_miss,
                log_odds_min=cfg.log_odds_min,
                log_odds_max=cfg.log_odds_max,
                max_ray_cells=cfg.max_ray_cells,
            )
            gp = points_2d @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
            self.mapper.update_scan(self.global_pose[:2, 2], gp)
            if cfg.submap_enabled:
                self.submap_buffer.append(gp.copy())
            self.scan_history.append(
                ScanRecord(points_2d.copy(), self.global_pose.copy())
            )
            self.pose_graph.add_node(
                np.asarray(se2.pose_to_vec(jnp.asarray(self.global_pose)))
            )
            return False

        # IMU yaw for this scan (slam.py:455-463)
        imu_yaw = None
        imu_delta = None
        if self.imu is not None and rel_time_us is not None:
            raw_yaw = self.imu.yaw_at(rel_time_us)
            imu_yaw = (raw_yaw - self.imu_yaw_offset + np.pi) % (2 * np.pi) - np.pi
            if self.prev_rel_time is not None:
                imu_delta = self.imu.delta_yaw(self.prev_rel_time, rel_time_us)

        # Step 1: scan-to-scan odometry (slam.py:465-483)
        t0 = time.perf_counter()
        if imu_delta is not None:
            c, s = np.cos(imu_delta), np.sin(imu_delta)
            sp, sm = _pad_fixed(self.prev_points, self._cap)
            tp, tm = _pad_fixed(points_2d, self._cap)
            res = icp(
                sp, sm, tp, tm,
                jnp.asarray(np.array([[c, -s], [s, c]], np.float32)),
                jnp.zeros(2, jnp.float32),
                voxel_size=cfg.icp_voxel,
                method=cfg.icp_method,
                max_iterations=int(cfg.icp_max_iterations),
                normal_k=int(cfg.icp_normal_k),
                error_threshold=cfg.icp_error_threshold,
            )
            self.stats.icp_iters += int(res.iters)
            r_inc, t_inc, err_inc = (
                np.asarray(res.R), np.asarray(res.t), float(res.error)
            )
        else:
            r_inc, t_inc, err_inc = self._run_icp_pair(
                self.prev_points, points_2d
            )

        if err_inc > cfg.error_reject_threshold:   # (slam.py:485-490)
            if self.verbose:
                print(f"Scan {self.stats.scans}: S2S error {err_inc:.6f} "
                      f"too high, skipping")
            self.prev_points = points_2d
            self.prev_rel_time = rel_time_us
            self.stats.scans += 1
            self.stats.rejected += 1
            return False

        prev_global = self.global_pose.copy()
        self.global_pose = np.asarray(se2.apply_incremental_pose(
            jnp.asarray(self.global_pose), jnp.asarray(r_inc),
            jnp.asarray(t_inc),
        ))
        error = err_inc

        # Step 2: submap drift correction (slam.py:497-536)
        if cfg.submap_enabled and self.submap_buffer:
            r_sub, t_sub, err_sub = self._attempt_submap_icp(
                points_2d, self.global_pose.copy(), imu_yaw
            )
            if err_sub <= cfg.error_reject_threshold:
                submap_pose = np.eye(3, dtype=np.float32)
                submap_pose[:2, :2] = r_sub
                submap_pose[:2, 2] = t_sub
                pos_diff = float(np.linalg.norm(t_sub - self.global_pose[:2, 2]))
                sub_yaw = np.arctan2(r_sub[1, 0], r_sub[0, 0])
                inc_yaw = np.arctan2(self.global_pose[1, 0],
                                     self.global_pose[0, 0])
                yaw_diff = abs((sub_yaw - inc_yaw + np.pi) % (2 * np.pi) - np.pi)
                if pos_diff < cfg.sub_corr_dist and yaw_diff < np.deg2rad(15.0):
                    self.global_pose = submap_pose
                    error = err_sub
                    self.stats.submap_corrections += 1
                    if self.verbose:
                        print(f"  Submap correction applied "
                              f"(dpos={pos_diff:.3f}m, "
                              f"dyaw={np.degrees(yaw_diff):.1f} deg)")
        self.stats.wall_registration += time.perf_counter() - t0

        self.pose_trajectory.append(self.global_pose.copy())

        # pose graph node + odometry edge (slam.py:542-549)
        cur_idx = self.pose_graph.add_node(
            np.asarray(se2.pose_to_vec(jnp.asarray(self.global_pose)))
        )
        z_odom = np.asarray(se2.relative_pose_vec(
            jnp.asarray(self.scan_history[cur_idx - 1].pose),
            jnp.asarray(self.global_pose),
        ))
        odom_info = np.eye(3, dtype=np.float32) / max(error, 1e-6)
        self.pose_graph.add_edge(cur_idx - 1, cur_idx, z_odom, odom_info)

        # map + history + submap push (slam.py:551-562)
        t1 = time.perf_counter()
        gp = points_2d @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
        self.scan_history.append(
            ScanRecord(points_2d.copy(), self.global_pose.copy())
        )
        if self.mapper is not None:
            self.mapper.update_scan(self.global_pose[:2, 2], gp)
        if cfg.submap_enabled:
            self.submap_buffer.append(gp.copy())
            if len(self.submap_buffer) > cfg.submap_size:
                self.submap_buffer.pop(0)
        self.stats.wall_mapping += time.perf_counter() - t1

        # loop closure (slam.py:564-620)
        if cfg.lc_enabled and cur_idx >= cfg.lc_min_interval:
            t2 = time.perf_counter()
            self._try_loop_closure(points_2d, cur_idx)
            self.stats.wall_loop_closure += time.perf_counter() - t2

        self.prev_points = points_2d
        self.prev_rel_time = rel_time_us
        self.stats.scans += 1
        if self.verbose:
            pos = self.global_pose[:2, 2]
            yaw = np.degrees(np.arctan2(self.global_pose[1, 0],
                                        self.global_pose[0, 0]))
            print(f"Scan {self.stats.scans:4d}  err={error:.6f}  "
                  f"pos=({pos[0]:+.3f}, {pos[1]:+.3f})  yaw={yaw:+.2f} deg")
        return True


def run_slam(cfg: SlamConfig | dict, verbose: bool = True):
    """File-driven entry mirroring the reference (slam.py:282-657).

    Returns (global_pose, pose_trajectory, mapper, engine).
    """
    if isinstance(cfg, dict):
        cfg = SlamConfig.from_dict(cfg)

    imu = None
    if cfg.imu_enabled and cfg.imu_file:
        imu = IMUService(cfg.imu_file)

    engine = SlamEngine(cfg, imu=imu, verbose=verbose)
    service = LidarService(cfg.data_file, sleep_s=cfg.sleep_s, loop=cfg.loop)

    scan_counter = 0
    try:
        for ts, rel_us, raw_points in service.scans():
            scan_counter += 1
            if cfg.process_every_n > 1 and (
                scan_counter % cfg.process_every_n
            ) != 1:
                continue
            points = filter_and_flatten(raw_points, cfg.z_min, cfg.z_max)
            engine.process_scan(points, rel_us)
            if cfg.num_scans is not None and engine.stats.scans >= cfg.num_scans:
                break
    except KeyboardInterrupt:
        print("Stopping SLAM loop...")

    return engine.global_pose, engine.pose_trajectory, engine.mapper, engine
