"""BASELINE config #5 end-to-end: the scaled, sharded SLAM pipeline.

One pipeline combining the three scale axes that the small engine keeps
separate (VERDICT r1 missing #2):

* **points per scan** — registration runs ``models.icp.icp_large`` (dense
  cell-grid correspondences, 10^5+ points; replaces the KDTree query of
  /root/reference/utilities/icp.py:173,179 at a scale the reference's
  O(N log M) per-iteration query cannot reach),
* **map area** — the occupancy grid lives ROW-BLOCK-SHARDED across the
  device mesh and is never replicated
  (``parallel.sharded_grid.raytrace_update_block_sharded``; reference
  update_scan semantics, utilities/mapping.py:103-141),
* **keyframe count** — the pose graph optimizes through the distributed
  exact Schur-complement Gauss-Newton
  (``parallel.dist_pose_graph.optimize_schur``; replaces the dense
  O(n^3) solve of utilities/pose_graph.py:92-127).

Host Python only streams scans and owns the keyframe list; every per-scan
compute (ICP, world transform, ray trace) is one jitted device program.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.models.icp import icp_large
from icp_tpu.models.pose_graph import PoseGraph2D
from icp_tpu.ops.voxel import voxel_downsample_fixed
from icp_tpu.parallel.sharded_grid import (
    block_sharding, raytrace_update_block_sharded,
)
from icp_tpu.utils.masking import pad_points


@dataclass
class ScaledStats:
    scans: int = 0
    loop_closures: int = 0
    lc_checked: int = 0
    icp_iters: int = 0
    wall_registration: float = 0.0
    wall_mapping: float = 0.0
    wall_lc: float = 0.0
    wall_ba: float = 0.0
    ba_iterations: int = 0


class ScaledPipeline:
    """Streaming scaled SLAM: feed sensor-frame scans via step().

    Parameters size the three scale axes; all capacities are static so
    each program compiles once. The mesh may be any size >= 1 (size 1
    degrades to single-device exactness — same programs, no collectives).
    """

    def __init__(self, mesh, *,
                 scan_capacity: int = 131072,
                 extent: float = 100.0,
                 map_resolution: float = 0.25,
                 map_margin: float = 10.0,
                 max_range: float = 35.0,
                 icp_max_corr: float = 1.0,
                 icp_max_iterations: int = 30,
                 icp_grid_shape: tuple = (96, 96),
                 icp_cell_cap: int = 64,
                 icp_qcells: int = 4096,
                 p_hit: float = 0.7, p_miss: float = 0.4,
                 log_odds_min: float = -5.0, log_odds_max: float = 5.0,
                 map_ray_stride: int = 1,
                 kf_capacity: int = 8192,
                 kf_voxel: float = 0.3,
                 lc_every: int = 8,
                 lc_min_interval: int = 50,
                 lc_distance: float = 5.0,
                 lc_min_travel: float = 30.0,
                 lc_error_threshold: float = 0.05,
                 lc_max_corr: float = 6.0,
                 lc_iterations: int = 40,
                 lc_info_scale: float = 10.0,
                 dist_node_threshold: int = 2):
        self.mesh = mesh
        self.cap = int(scan_capacity)
        # free-space rays per scan fed to the map: at 10^5 points per scan
        # the ray set is hugely redundant against a coarse grid (every cell
        # on the scan ring is crossed by dozens of rays), so a stride key
        # bounds the Bresenham + scatter cost; hit cells are always painted
        # from ALL points (occupancy evidence is kept complete)
        self.map_ray_stride = max(int(map_ray_stride), 1)
        self.kf_cap = int(kf_capacity)
        self.kf_voxel = float(kf_voxel)
        self.max_range = float(max_range)
        self.lc_every = int(lc_every)
        self.lc_min_interval = int(lc_min_interval)
        self.lc_distance = float(lc_distance)
        self.lc_min_travel = float(lc_min_travel)
        self.lc_error_threshold = float(lc_error_threshold)
        self.lc_info_scale = float(lc_info_scale)

        # LC verification: keyframes are voxelized (<= kf_capacity pts), so
        # brute-force masked ICP is affordable and — unlike the cell-grid
        # registration ICP whose gate is sized for per-step motion — must
        # swallow ACCUMULATED loop drift. Coarse gated pull (lc_max_corr)
        # from the estimated relative pose, then a fine pass at the
        # registration gate. Compiled once (fixed kf_capacity shapes).
        from icp_tpu.models.icp import icp_core
        from icp_tpu.ops.nn import nn_query
        _coarse = float(lc_max_corr)
        _fine = float(icp_max_corr)
        _iters = int(lc_iterations)

        @jax.jit
        def _lc_verify(ap, am, bp, bm, R0, t0):
            r1 = icp_core(ap, am, bp, bm, R0, t0,
                          method="point_to_point", max_iterations=_iters,
                          max_corr_dist=_coarse, use_gate=True)
            r2 = icp_core(ap, am, bp, bm, r1.R, r1.t,
                          method="point_to_point", max_iterations=_iters,
                          max_corr_dist=_fine, use_gate=True)
            # acceptance metrics: keyframes ~metres apart only PARTIALLY
            # overlap, so the reference-style all-points mean error can't
            # distinguish a good closure (the non-overlap region dominates
            # it even at perfect alignment). Score the gated inliers and
            # their fraction instead.
            tr = ap @ r2.R.T + r2.t
            nn_d, _ = nn_query(tr, bp, bm, am)
            sq = nn_d * nn_d
            inl = ((sq < _fine * _fine) & am).astype(jnp.float32)
            n_in = jnp.sum(inl)
            ierr = jnp.sum(sq * inl) / jnp.maximum(n_in, 1.0)
            frac = n_in / jnp.maximum(jnp.sum(am.astype(jnp.float32)), 1.0)
            return r2, ierr, frac

        self._lc_verify = _lc_verify
        self._icp_kw = dict(
            max_corr_dist=float(icp_max_corr),
            max_iterations=int(icp_max_iterations),
            error_threshold=0.0,
            grid_shape=tuple(icp_grid_shape),
            cap=int(icp_cell_cap), qcap=int(icp_cell_cap),
            qcells=int(icp_qcells),
        )

        # ── block-sharded occupancy grid ─────────────────────────────────
        D = int(mesh.devices.size)
        lo = -extent - map_margin
        hi = extent + map_margin
        self.min_x = self.min_y = lo
        self.resolution = float(map_resolution)
        n_cells = int(np.ceil((hi - lo) / self.resolution))
        # round rows to a fixed multiple of 64 so the grid shape (and hence
        # results) is identical for any mesh size up to 64 devices
        self.ny = -(-n_cells // 64) * 64
        assert self.ny % D == 0, (self.ny, D)
        self.nx = n_cells
        self.l_hit = float(np.log(p_hit / (1.0 - p_hit)))
        self.l_miss = float(np.log(p_miss / (1.0 - p_miss)))
        self.lo_min, self.lo_max = float(log_odds_min), float(log_odds_max)
        self.max_steps = int(np.ceil(
            1.2 * self.max_range / self.resolution / 64.0)) * 64
        self.log_odds = jax.device_put(
            jnp.zeros((self.ny, self.nx), jnp.float32), block_sharding(mesh))

        mesh_ = mesh
        ms = self.max_steps
        l_hit, l_miss = self.l_hit, self.l_miss
        lo_min, lo_max = self.lo_min, self.lo_max
        minx, miny, inv_res = self.min_x, self.min_y, 1.0 / self.resolution
        stride = self.map_ray_stride

        @jax.jit
        def _paint(grid, pts, mask, R, t):
            """sensor->world transform + cell conversion + sharded trace."""
            world = pts @ R.T + t
            hit_cells = jnp.stack([
                jnp.floor((world[:, 0] - minx) * inv_res),
                jnp.floor((world[:, 1] - miny) * inv_res),
            ], axis=1).astype(jnp.int32)
            origin_cell = jnp.floor(
                (t - jnp.asarray([minx, miny])) * inv_res).astype(jnp.int32)
            # static stride SLICE (not mask): the Bresenham planes and the
            # free-cell scatter shrink by the stride factor
            ray_cells = hit_cells[::stride]
            ray_valid = mask[::stride]
            return raytrace_update_block_sharded(
                mesh_, grid, origin_cell, hit_cells, mask,
                jnp.float32(l_hit), jnp.float32(l_miss),
                jnp.float32(lo_min), jnp.float32(lo_max), max_steps=ms,
                ray_cells=ray_cells, ray_valid=ray_valid,
            )

        self._paint = _paint

        # ── pose graph on the mesh ───────────────────────────────────────
        self.pose_graph = PoseGraph2D()
        if D > 1:
            self.pose_graph.set_mesh(mesh, dist_node_threshold)
        self.global_pose = np.eye(3, dtype=np.float32)
        self.trajectory: list[np.ndarray] = []
        self.kf_points: list[np.ndarray] = []   # downsampled, sensor frame
        self.kf_pos: list[np.ndarray] = []
        self._prev = None                        # (padded pts, mask) device
        self._travel = [0.0]
        self.stats = ScaledStats()

    # ── helpers ──────────────────────────────────────────────────────────
    def _downsample_kf(self, pts_pad, mask):
        d, dm = voxel_downsample_fixed(pts_pad, mask, self.kf_voxel,
                                       self.kf_cap)
        d = np.asarray(d)
        dm = np.asarray(dm)
        return d[dm]

    def _add_node_edge(self, err):
        v = np.array([self.global_pose[0, 2], self.global_pose[1, 2],
                      np.arctan2(self.global_pose[1, 0],
                                 self.global_pose[0, 0])], np.float32)
        idx = self.pose_graph.add_node(v)
        if idx > 0:
            prev = self.pose_graph.nodes[idx - 1]
            c, s = np.cos(prev[2]), np.sin(prev[2])
            Rp = np.array([[c, -s], [s, c]], np.float32)
            dt_ = Rp.T @ (v[:2] - prev[:2])
            dth = (v[2] - prev[2] + np.pi) % (2 * np.pi) - np.pi
            self.pose_graph.add_edge(
                idx - 1, idx, np.array([dt_[0], dt_[1], dth], np.float32),
                np.eye(3, dtype=np.float32) / max(float(err), 1e-6))
        return idx

    # ── per-scan step ────────────────────────────────────────────────────
    def step(self, points: np.ndarray):
        """One scan: register -> pose -> node/edge -> sharded map paint ->
        periodic loop-closure check. ``points`` is (n, 2) sensor frame."""
        sp, sm = pad_points(points[:self.cap], self.cap)
        sp, sm = jnp.asarray(sp), jnp.asarray(sm)

        if self._prev is None:
            self._prev = (sp, sm)
            self.trajectory.append(self.global_pose.copy())
            self.kf_points.append(self._downsample_kf(sp, sm))
            self.kf_pos.append(self.global_pose[:2, 2].copy())
            self._add_node_edge(1.0)
            t0 = time.perf_counter()
            self.log_odds = self._paint(
                self.log_odds, sp, sm,
                jnp.asarray(self.global_pose[:2, :2]),
                jnp.asarray(self.global_pose[:2, 2]))
            self.stats.wall_mapping += time.perf_counter() - t0
            self.stats.scans += 1
            return

        pp, pm = self._prev
        t0 = time.perf_counter()
        res = icp_large(pp, pm, sp, sm,
                        jnp.eye(2, dtype=jnp.float32),
                        jnp.zeros(2, jnp.float32), **self._icp_kw)
        r_inc = np.asarray(res.R)
        t_inc = np.asarray(res.t)
        err = float(res.error)
        self.stats.icp_iters += int(res.iters)
        self.stats.wall_registration += time.perf_counter() - t0

        # global_pose @= T_inc^-1 (reference slam.py:493-494 semantics)
        T_inv = np.eye(3, dtype=np.float32)
        T_inv[:2, :2] = r_inc.T
        T_inv[:2, 2] = -r_inc.T @ t_inc
        self.global_pose = (self.global_pose @ T_inv).astype(np.float32)

        self._prev = (sp, sm)
        self.trajectory.append(self.global_pose.copy())
        step_d = float(np.linalg.norm(
            self.global_pose[:2, 2] - self.kf_pos[-1]))
        self._travel.append(self._travel[-1] + step_d)
        self.kf_points.append(self._downsample_kf(sp, sm))
        self.kf_pos.append(self.global_pose[:2, 2].copy())
        cur_idx = self._add_node_edge(err)

        t0 = time.perf_counter()
        self.log_odds = self._paint(
            self.log_odds, sp, sm,
            jnp.asarray(self.global_pose[:2, :2]),
            jnp.asarray(self.global_pose[:2, 2]))
        self.stats.wall_mapping += time.perf_counter() - t0
        self.stats.scans += 1

        if (cur_idx >= self.lc_min_interval
                and cur_idx % self.lc_every == 0):
            t0 = time.perf_counter()
            self._try_loop_closure(cur_idx)
            self.stats.wall_lc += time.perf_counter() - t0

    # ── loop closure (reference gates, slam.py:231-268) ──────────────────
    def _try_loop_closure(self, cur_idx: int):
        pos = np.stack(self.kf_pos)
        cur = pos[cur_idx]
        idx = np.arange(len(pos))
        dist = np.linalg.norm(pos - cur, axis=1)
        travel = self._travel[cur_idx] - np.asarray(self._travel)
        ok = ((cur_idx - idx >= self.lc_min_interval)
              & (dist < self.lc_distance)
              & (travel >= self.lc_min_travel))
        cands = idx[ok]
        if cands.size == 0:
            return
        cand = int(cands[np.argmin(dist[cands])])
        self.stats.lc_checked += 1

        ap, am = pad_points(self.kf_points[cur_idx], self.kf_cap)
        bp, bm = pad_points(self.kf_points[cand], self.kf_cap)
        # init from the estimated relative pose: its residual is exactly
        # the accumulated loop drift, which the coarse gate must cover
        T_init = np.linalg.inv(self.trajectory[cand]) @ \
            self.trajectory[cur_idx]
        res, ierr, frac = self._lc_verify(
            jnp.asarray(ap), jnp.asarray(am),
            jnp.asarray(bp), jnp.asarray(bm),
            jnp.asarray(T_init[:2, :2], jnp.float32),
            jnp.asarray(T_init[:2, 2], jnp.float32))
        err, frac = float(ierr), float(frac)
        self.stats.icp_iters += int(res.iters)
        if err >= self.lc_error_threshold or frac < 0.5:
            return
        r_lc, t_lc = np.asarray(res.R), np.asarray(res.t)
        # edge z = vec(T_lc^-1) (reference slam.py:583-593)
        z = np.array([
            *(-r_lc.T @ t_lc),
            -np.arctan2(r_lc[1, 0], r_lc[0, 0]),
        ], np.float32)
        self.pose_graph.add_edge(
            cur_idx, cand, z,
            np.eye(3, dtype=np.float32) * (self.lc_info_scale
                                           / max(err, 1e-6)))
        self.stats.loop_closures += 1

    # ── bundle adjustment ────────────────────────────────────────────────
    def optimize(self, n_iterations: int = 20):
        """Distributed BA over the whole keyframe graph; rewrites the
        trajectory from the corrected nodes (reference slam.py:601-609)."""
        t0 = time.perf_counter()
        self.pose_graph.optimize(n_iterations=n_iterations, fix_node=0)
        self.stats.wall_ba += time.perf_counter() - t0
        self.stats.ba_iterations += n_iterations
        corrected = self.pose_graph.get_poses_as_matrices()
        self.trajectory = [m.copy() for m in corrected]
        self.global_pose = self.trajectory[-1].copy()

    def time_gn_step(self, reps: int = 5) -> float:
        """Seconds per distributed Schur GN step on the CURRENT graph
        (compile excluded) — the headline BA kernel number."""
        from icp_tpu.parallel.dist_pose_graph import (
            gn_step_schur_sharded, partition_graph,
        )
        nodes, node_mask, ei, ej, z, om, em = self.pose_graph._packed()
        part = partition_graph(nodes.shape[0], ei, ej, z, om, em,
                               int(self.mesh.devices.size), 0)
        nd = jnp.asarray(nodes)
        nm = jnp.asarray(node_mask)
        fn = jax.jit(lambda a, b: gn_step_schur_sharded(self.mesh, a, b, part))
        out = fn(nd, nm)
        np.asarray(out)                      # sync (compile + first run)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(nd, nm)
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    def map_probability(self) -> np.ndarray:
        """Gathered full probability grid (pulls the sharded blocks)."""
        lo = np.asarray(self.log_odds)
        return 1.0 - 1.0 / (1.0 + np.exp(lo))
