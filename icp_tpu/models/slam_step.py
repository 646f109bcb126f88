"""Fused per-scan SLAM step — ONE device dispatch per scan.

The modular engine issues ~20 small device calls + host syncs per scan;
through a remote-attached TPU each round trip costs milliseconds, so
dispatch overhead dominated the compute 10:1. This module fuses the entire
per-scan pipeline (scan-to-scan ICP, rejection gate, submap voxelization +
rotation sweep + submap ICP + agreement gates, occupancy ray trace, submap
ring push) into a single jitted function over a device-resident state:

  host -> device: the new scan (one small transfer)
  device: everything
  device -> host: pose + error + flags (one tiny transfer)

Data-dependent accept/reject branching (reference slam.py:485-536) is
computed in-graph with masks/selects — a rejected scan freezes the pose and
zeroes the map/submap updates, exactly the reference's skip semantics.

The submap rolling window (reference slam.py:559-562 FIFO) is a circular
(K, cap, 2) ring buffer on device; the submap consumer voxel-merges all
slots, so circular overwrite == FIFO eviction.

The occupancy grid is donated in/out, so log-odds updates are in-place in
HBM.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.models.icp import icp_core
from icp_tpu.models.features import (FeatureSet, blank_features,
                                     extract_features, match_and_align)
from icp_tpu.models.prealign import rotation_search, submap_rotation_search
from icp_tpu.ops.raytrace import raytrace_update, raytrace_update_batched
from icp_tpu.ops.voxel import voxel_downsample, voxel_downsample_fixed
from icp_tpu.utils import se2


class SlamState(NamedTuple):
    """Device-resident streaming state."""
    prev_pts: jax.Array      # (cap, 2) previous scan (sensor frame)
    prev_mask: jax.Array     # (cap,)
    global_pose: jax.Array   # (3, 3)
    ring_pts: jax.Array      # (K, cap, 2) global-frame scans
    ring_mask: jax.Array     # (K, cap)
    ring_idx: jax.Array      # scalar int32 — next slot to write
    log_odds: jax.Array      # (ny, nx)
    key: jax.Array           # (2,) uint32 PRNG key (features-mode RANSAC)
    # features-mode cache: the PREVIOUS scan's extracted features.
    # extract_features is a pure function of one cloud, and in "features"
    # mode (no rotation-search pre-rotation) each scan's features are
    # computed once as the pair target and reused as the next pair's
    # source — bit-exact, halves per-scan feature extraction. Dummy
    # (1-sized) arrays in every other mode.
    feat: FeatureSet = None
    feat_valid: jax.Array = None   # bool scalar — cache holds prev's feats


class StepOut(NamedTuple):
    pose: jax.Array          # (3, 3) pose after this scan
    error: jax.Array         # registration error used (post-submap)
    accepted: jax.Array      # bool — scan advanced the trajectory
    sub_applied: jax.Array   # bool — submap correction replaced the pose
    err_inc: jax.Array       # raw scan-to-scan ICP error
    iters: jax.Array         # s2s ICP iterations
    sub_n: jax.Array         # valid submap points fed to correction
                             # (== capacity -> capacity saturated, voxels
                             # may have been truncated; engine warns)
    sweep_drop: jax.Array    # coarse-sweep voxels dropped by the static
                             # src/tgt caps (>0 -> sweep scoring lost
                             # points; engine counts + warns)


def blank_feat_state(cap: int, feat_shapes=None):
    """(FeatureSet, valid) initializer: real shapes in features mode
    (feat_shapes = (top_n, k_descriptor)), 1-sized dummies otherwise."""
    if feat_shapes is None:
        return blank_features(1, 1, 1), jnp.bool_(False)
    top_n, kd = feat_shapes
    return blank_features(cap, int(top_n), int(kd)), jnp.bool_(False)


def init_state(first_scan, first_mask, log_odds, ring_k: int, seed: int = 0,
               feat_shapes=None):
    """Device state after the reference's first-scan initialization.

    ``log_odds`` is the grid already containing the first scan's update
    (the engine performs the first update through the modular path while
    establishing bounds). ``feat_shapes``: (top_n, k_descriptor) to carry
    the features-mode cache (see SlamState.feat), None otherwise.
    """
    cap = first_scan.shape[0]
    ring_pts = jnp.zeros((ring_k, cap, 2), jnp.float32)
    ring_mask = jnp.zeros((ring_k, cap), bool)
    # slot 0 <- first scan in global frame (identity pose)
    ring_pts = ring_pts.at[0].set(first_scan)
    ring_mask = ring_mask.at[0].set(first_mask)
    feat, feat_valid = blank_feat_state(cap, feat_shapes)
    return SlamState(
        prev_pts=first_scan,
        prev_mask=first_mask,
        global_pose=jnp.eye(3, dtype=jnp.float32),
        ring_pts=ring_pts,
        ring_mask=ring_mask,
        ring_idx=jnp.int32(1),
        log_odds=jnp.asarray(log_odds, jnp.float32),
        key=jax.random.PRNGKey(seed),
        feat=feat,
        feat_valid=feat_valid,
    )


def make_slam_step(
    *,
    use_imu: bool,
    prealign: str = "rotation_search",
    icp_method: str,
    icp_voxel: float,
    icp_max_iterations: int,
    icp_normal_k: int,
    icp_error_threshold: float,
    error_reject_threshold: float,
    # no-IMU pre-alignment (rotation search)
    rotation_voxel_size: float,
    angle_step_coarse: float,
    angle_step_fine: float,
    # no-IMU pre-alignment (features/RANSAC; prealign "features"/"both")
    feat_voxel: float = 0.2,
    k_curvature: int = 10,
    top_n: int = 100,
    min_kp_dist: float = 0.3,
    k_descriptor: int = 30,
    ratio_threshold: float = 0.8,
    ransac_iterations: int = 1000,
    inlier_threshold: float = 0.5,
    min_inliers: int = 3,
    # submap
    submap_enabled: bool,
    submap_voxel: float,
    submap_capacity: int,
    sub_rot_range: float,
    sub_rot_step: float,
    sub_rot_fine: float,
    sub_rot_voxel: float,
    sub_corr_dist: float,
    imu_narrow: float,
    sweep_src_cap: int | None = None,
    sweep_tgt_cap: int | None = None,
    # mapping
    grid_min_x: float,
    grid_min_y: float,
    grid_resolution: float,
    l_hit: float,
    l_miss: float,
    log_odds_min: float,
    log_odds_max: float,
    max_ray_cells: int,
    free_cells_cap: int | None = None,
    batched_map: bool = False,
    nn_impl: str = "auto",
):
    """Build the fused jitted step for a fixed configuration + grid.

    ``batched_map``: the single-scan ``step`` always paints the map
    per scan; when True, ``batch`` instead skips the in-scan raytrace and
    applies ONE deduplicated whole-batch map update afterwards
    (ops/raytrace.raytrace_update_batched) — consecutive scans' free-space
    regions overlap almost entirely, so this replaces B large scatters
    with one sort + one unique-cell scatter. Clamping then happens once
    per batch (see raytrace_update_batched's docstring for why that is
    the only semantic difference and why it is immaterial)."""

    inv_res = 1.0 / grid_resolution
    grid_min = np.array([grid_min_x, grid_min_y], np.float32)

    # cache previous-scan features across steps: exact only when the
    # source cloud reaches feature extraction UNROTATED, i.e. pure
    # "features" mode without IMU ("both" pre-rotates by the sweep result,
    # which changes the voxel binning)
    cache_feats = (not use_imu) and prealign == "features"
    feat_kw = dict(voxel_size=feat_voxel, k_curvature=k_curvature,
                   top_n=top_n, min_kp_dist=min_kp_dist,
                   k_descriptor=k_descriptor)

    def step(state: SlamState, cur_pts, cur_mask, imu_delta, imu_yaw,
             paint_map: bool = True):
        # ── Step 1: scan-to-scan odometry (slam.py:465-483) ──────────────
        key = state.key
        feat_cur = state.feat
        feat_cur_valid = state.feat_valid
        if use_imu:
            R0 = se2.rotmat(imu_delta)
            t0 = jnp.zeros(2, jnp.float32)
        elif prealign == "none":       # vanilla ICP (reference method "none")
            R0 = jnp.eye(2, dtype=jnp.float32)
            t0 = jnp.zeros(2, jnp.float32)
        elif cache_feats:
            # features-only pre-alignment with the per-scan cache: the
            # current scan's features are extracted ONCE here and carried
            # as the next step's source features (reference recomputes
            # both sides per pair, features.py:283-295 — identical output,
            # half the extraction work)
            key, sub = jax.random.split(key)
            feat_cur = extract_features(cur_pts, cur_mask, **feat_kw)
            feat_cur_valid = jnp.bool_(True)
            feat_prev = lax.cond(
                state.feat_valid,
                lambda: state.feat,
                lambda: extract_features(state.prev_pts, state.prev_mask,
                                         **feat_kw),
            )
            R_f, t_f, n_in = match_and_align(
                feat_prev, feat_cur, sub,
                ratio_threshold=ratio_threshold,
                ransac_iterations=ransac_iterations,
                inlier_threshold=inlier_threshold,
            )
            ok = n_in >= min_inliers
            R0 = jnp.where(ok, R_f, jnp.eye(2, dtype=jnp.float32))
            t0 = jnp.where(ok, t_f, jnp.zeros(2, jnp.float32))
        else:
            if prealign in ("rotation_search", "both"):
                R0, t0, _ = rotation_search(
                    state.prev_pts, state.prev_mask, cur_pts, cur_mask,
                    voxel_size=rotation_voxel_size,
                    angle_step_coarse=angle_step_coarse,
                    angle_step_fine=angle_step_fine,
                )
            else:
                R0 = jnp.eye(2, dtype=jnp.float32)
                t0 = jnp.zeros(2, jnp.float32)
            if prealign in ("features", "both"):
                # feature alignment on the pre-rotated source, composed
                # exactly like the reference (slam.py:68-88)
                from icp_tpu.models.features import feature_based_alignment
                key, sub = jax.random.split(key)
                fa_src = state.prev_pts @ R0.T + t0
                R_f, t_f, n_in = feature_based_alignment(
                    fa_src, state.prev_mask, cur_pts, cur_mask, sub,
                    voxel_size=feat_voxel,
                    k_curvature=k_curvature, top_n=top_n,
                    min_kp_dist=min_kp_dist, k_descriptor=k_descriptor,
                    ratio_threshold=ratio_threshold,
                    ransac_iterations=ransac_iterations,
                    inlier_threshold=inlier_threshold,
                )
                ok = n_in >= min_inliers
                R0 = jnp.where(ok, R_f @ R0, R0)
                t0 = jnp.where(ok, t0 @ R_f.T + t_f, t0)
        src_d, src_dm = voxel_downsample(state.prev_pts, state.prev_mask,
                                         icp_voxel)
        tgt_d, tgt_dm = voxel_downsample(cur_pts, cur_mask, icp_voxel)
        res = icp_core(
            src_d, src_dm, tgt_d, tgt_dm, R0, t0,
            method=icp_method,
            max_iterations=icp_max_iterations,
            normal_k=icp_normal_k,
            error_threshold=icp_error_threshold,
            nn_impl=nn_impl,
        )
        err_inc = res.error
        # degenerate scan (<10 valid points): skip entirely, carrying ALL
        # state including prev (slam.py:384-385 `continue`s before any
        # update). Also makes all-False-mask padding scans exact no-ops,
        # which the batched LC path relies on.
        degenerate = jnp.sum(cur_mask) < 10
        accepted = jnp.logical_not(degenerate) & (
            err_inc <= error_reject_threshold          # slam.py:485
        )

        new_pose = se2.apply_incremental_pose(state.global_pose, res.R, res.t)
        new_pose = jnp.where(accepted, new_pose, state.global_pose)
        error = err_inc

        # ── Step 2: submap correction (slam.py:497-536) ─────────────────
        sub_applied = jnp.bool_(False)
        sub_n = jnp.int32(0)
        sweep_drop = jnp.int32(0)
        if submap_enabled:
            flat_pts = state.ring_pts.reshape(-1, 2)
            flat_mask = state.ring_mask.reshape(-1)
            sub_pts, sub_mask = voxel_downsample_fixed(
                flat_pts, flat_mask, submap_voxel, submap_capacity
            )
            sub_n = jnp.sum(sub_mask).astype(jnp.int32)
            if use_imu:
                pred = se2.make_pose(se2.rotmat(imu_yaw), new_pose[:2, 2])
                a_range, a_step = imu_narrow, 0.5
            else:
                pred = new_pose
                a_range, a_step = sub_rot_range, sub_rot_step
            R_s, t_s, s_drop, t_drop = submap_rotation_search(
                cur_pts, cur_mask, sub_pts, sub_mask, pred,
                angle_range=a_range, angle_step=a_step,
                fine_step=sub_rot_fine, voxel_size=sub_rot_voxel,
                src_cap=sweep_src_cap, tgt_cap=sweep_tgt_cap,
                with_overflow=True,
            )
            sweep_drop = s_drop + t_drop
            cur_d, cur_dm = voxel_downsample(cur_pts, cur_mask, icp_voxel)
            # the reference's ICP re-voxelizes the (already submap-voxel
            # downsampled) submap at icp voxel (icp.py:150-151 on top of
            # slam.py:103-108) — the second pass re-centers voxel means on
            # the icp grid, which measurably changes the correction
            sub_d, sub_dm = voxel_downsample(sub_pts, sub_mask, icp_voxel)
            res_sub = icp_core(
                cur_d, cur_dm, sub_d, sub_dm, R_s, t_s,
                method="point_to_point",
                max_iterations=icp_max_iterations,
                error_threshold=icp_error_threshold,
                max_corr_dist=sub_corr_dist,
                use_gate=True,
                nn_impl=nn_impl,
            )
            pos_diff = jnp.linalg.norm(res_sub.t - new_pose[:2, 2])
            sub_yaw = jnp.arctan2(res_sub.R[1, 0], res_sub.R[0, 0])
            inc_yaw = se2.yaw_of_pose(new_pose)
            yaw_diff = jnp.abs(se2.wrap_angle(sub_yaw - inc_yaw))
            sub_ok = (
                accepted
                & (res_sub.error <= error_reject_threshold)
                & (pos_diff < sub_corr_dist)
                & (yaw_diff < jnp.deg2rad(15.0))
            )
            sub_pose = se2.make_pose(res_sub.R, res_sub.t)
            new_pose = jnp.where(sub_ok, sub_pose, new_pose)
            error = jnp.where(sub_ok, res_sub.error, error)
            sub_applied = sub_ok

        # ── map update (slam.py:551-557) ────────────────────────────────
        gp = se2.transform_points(cur_pts, new_pose)
        if paint_map:
            eff_mask = cur_mask & accepted
            origin_cell = jnp.floor(
                (new_pose[:2, 2] - grid_min) * inv_res
            ).astype(jnp.int32)
            hit_cells = jnp.floor((gp - grid_min) * inv_res).astype(jnp.int32)
            log_odds = raytrace_update(
                state.log_odds, origin_cell, hit_cells, eff_mask,
                jnp.float32(l_hit), jnp.float32(l_miss),
                jnp.float32(log_odds_min), jnp.float32(log_odds_max),
                max_steps=max_ray_cells, free_cap=free_cells_cap,
            )
        else:
            log_odds = state.log_odds     # painted once per batch, below

        # ── submap ring push (slam.py:559-562) ──────────────────────────
        K = state.ring_pts.shape[0]
        slot = state.ring_idx % K
        ring_pts = jnp.where(
            accepted,
            state.ring_pts.at[slot].set(gp),
            state.ring_pts,
        )
        ring_mask = jnp.where(
            accepted,
            state.ring_mask.at[slot].set(cur_mask),
            state.ring_mask,
        )
        ring_idx = state.ring_idx + accepted.astype(jnp.int32)

        if cache_feats:
            # degenerate scans are skipped wholesale (prev unchanged), so
            # the cache must keep describing the OLD prev
            new_feat = jax.tree_util.tree_map(
                lambda a, b: jnp.where(degenerate, a, b),
                state.feat, feat_cur)
            new_feat_valid = jnp.where(degenerate, state.feat_valid,
                                       feat_cur_valid)
        else:
            new_feat, new_feat_valid = state.feat, state.feat_valid
        new_state = SlamState(
            prev_pts=jnp.where(degenerate, state.prev_pts, cur_pts),
            prev_mask=jnp.where(degenerate, state.prev_mask, cur_mask),
            global_pose=new_pose,
            ring_pts=ring_pts,
            ring_mask=ring_mask,
            ring_idx=ring_idx,
            log_odds=log_odds,
            key=key,
            feat=new_feat,
            feat_valid=new_feat_valid,
        )
        out = StepOut(
            pose=new_pose, error=error, accepted=accepted,
            sub_applied=sub_applied, err_inc=err_inc, iters=res.iters,
            sub_n=sub_n, sweep_drop=sweep_drop,
        )
        return new_state, out

    def batch(state: SlamState, scans, masks, imu_deltas, imu_yaws):
        """Process a whole (B, cap, 2) batch of scans in ONE dispatch.

        The per-scan recurrence runs as a lax.scan on device; the host sees
        one upload and one small stacked-StepOut download per batch, which
        amortizes the host<->device round trip that dominates when the TPU
        is attached over a network tunnel.
        """
        new_state, outs = jax.lax.scan(
            lambda st, xs: step(st, xs[0], xs[1], xs[2], xs[3],
                                paint_map=not batched_map),
            state, (scans, masks, imu_deltas, imu_yaws),
        )
        if batched_map:
            R = outs.pose[:, :2, :2]                     # (B, 2, 2)
            t = outs.pose[:, :2, 2]                      # (B, 2)
            gp = jnp.einsum("bni,bji->bnj", scans, R) + t[:, None, :]
            eff = masks & outs.accepted[:, None]
            origin_cells = jnp.floor(
                (t - grid_min) * inv_res).astype(jnp.int32)
            hit_cells = jnp.floor((gp - grid_min) * inv_res).astype(jnp.int32)
            log_odds = raytrace_update_batched(
                new_state.log_odds, origin_cells, hit_cells, eff,
                jnp.float32(l_hit), jnp.float32(l_miss),
                jnp.float32(log_odds_min), jnp.float32(log_odds_max),
                max_steps=max_ray_cells, unique_cap=free_cells_cap,
                scan_cap=free_cells_cap,
            )
            new_state = new_state._replace(log_odds=log_odds)
        return new_state, outs

    return jax.jit(step, donate_argnums=(0,)), jax.jit(
        batch, donate_argnums=(0,)
    )
