"""Pre-alignment: correlative rotation search (global and submap-centered).

TPU-native re-design of:
  * rotation_search        — /root/reference/utilities/features.py:165-242
  * _submap_rotation_search — /root/reference/slam.py:111-183

The per-angle Python/KDTree loops become batched sweeps (icp_tpu.ops.sweep);
the coarse->fine refinement keeps the reference's exact schedule (coarse grid
over the full range, fine grid of +/- one coarse step around the winner). The
80th-percentile translation refinement of the submap variant is a masked
quantile (sort + interpolated gather), matching np.percentile semantics.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.ops.nn import nn_query
from icp_tpu.ops.sweep import sweep_scores
from icp_tpu.ops.voxel import voxel_downsample
from icp_tpu.utils.masking import BIG, masked_centroid, masked_mean
from icp_tpu.utils.se2 import rotmat


def _fine_count(step_coarse_deg: float, step_fine_deg: float) -> int:
    """Number of angles np.arange(lo, hi, fine) yields for hi-lo = 2*coarse.

    Matches reference features.py:227-229 / slam.py:154-156 arange semantics.
    """
    lo = -np.deg2rad(step_coarse_deg)
    hi = np.deg2rad(step_coarse_deg)
    return int(np.ceil((hi - lo) / np.deg2rad(step_fine_deg) - 1e-9))


@partial(jax.jit, static_argnames=("angle_step_coarse", "angle_step_fine",
                                   "src_cap", "tgt_cap"))
def rotation_search(
    source, src_mask, target, tgt_mask,
    *,
    voxel_size=0.3,
    angle_step_coarse: float = 2.0,
    angle_step_fine: float = 0.2,
    src_cap: int | None = None,
    tgt_cap: int | None = None,
):
    """Brute-force global rotation search after centroid alignment.

    Returns (R (2,2), t (2,), score). Degenerate inputs (<5 valid points in
    either cloud after downsampling) return (I, 0, BIG) — reference
    features.py:203-204 returns inf there.

    ``src_cap``/``tgt_cap``: optional static compaction of the sweep clouds
    (valid voxels occupy the first slots — see submap_rotation_search).
    """
    src, sm = voxel_downsample(source, src_mask, voxel_size)
    tgt, tm = voxel_downsample(target, tgt_mask, voxel_size)
    if src_cap is not None and src_cap < src.shape[0]:
        src, sm = src[:src_cap], sm[:src_cap]
    if tgt_cap is not None and tgt_cap < tgt.shape[0]:
        tgt, tm = tgt[:tgt_cap], tm[:tgt_cap]

    mu_s = masked_centroid(src, sm)
    mu_t = masked_centroid(tgt, tm)
    src_c = src - mu_s

    coarse = jnp.asarray(
        np.deg2rad(np.arange(-180.0, 180.0, angle_step_coarse)), jnp.float32
    )
    scores_c = sweep_scores(src_c, sm, tgt, tm, coarse, mu_t)
    best_c = coarse[jnp.argmin(scores_c)]

    nf = _fine_count(angle_step_coarse, angle_step_fine)
    lo = best_c - np.deg2rad(angle_step_coarse)
    fine = lo + jnp.arange(nf, dtype=jnp.float32) * np.deg2rad(angle_step_fine)
    scores_f = sweep_scores(src_c, sm, tgt, tm, fine, mu_t)
    i_f = jnp.argmin(scores_f)
    best = fine[i_f]
    best_score = scores_f[i_f]

    R = rotmat(best)
    t = mu_t - R @ mu_s

    ok = (jnp.sum(sm) >= 5) & (jnp.sum(tm) >= 5)
    R = jnp.where(ok, R, jnp.eye(2, dtype=jnp.float32))
    t = jnp.where(ok, t, jnp.zeros(2, jnp.float32))
    best_score = jnp.where(ok, best_score, BIG)
    return R, t, best_score


def _masked_percentile(values, mask, q: float):
    """np.percentile(values[mask], q) with linear interpolation, static shape."""
    n = values.shape[0]
    v = jnp.where(mask, values, BIG)
    v_sorted = jnp.sort(v)
    cnt = jnp.sum(mask.astype(jnp.int32))
    pos = (q / 100.0) * (cnt.astype(jnp.float32) - 1.0)
    pos = jnp.maximum(pos, 0.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(cnt - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    vlo = v_sorted[jnp.clip(lo, 0, n - 1)]
    vhi = v_sorted[jnp.clip(hi, 0, n - 1)]
    return vlo * (1.0 - frac) + vhi * frac


@partial(
    jax.jit,
    static_argnames=("angle_range", "angle_step", "fine_step",
                     "src_cap", "tgt_cap", "with_overflow"),
)
def submap_rotation_search(
    source_local, src_mask, submap_global, submap_mask, predicted_pose,
    *,
    angle_range: float = 60.0,
    angle_step: float = 2.0,
    fine_step: float = 0.5,
    voxel_size=0.3,
    src_cap: int | None = None,
    tgt_cap: int | None = None,
    with_overflow: bool = False,
):
    """Rotation sweep around the predicted yaw with translation pinned to the
    predicted position, then one NN-centroid translation refinement using the
    closest 80% of correspondences.

    Reference: _submap_rotation_search (/root/reference/slam.py:111-183).
    Returns (R (2,2), t (2,)).

    ``src_cap`` / ``tgt_cap`` optionally shrink the static capacity of the
    voxel-downsampled clouds the sweep scores run over: voxel_downsample
    emits valid voxels in the FIRST n_unique slots, so a slice is lossless
    whenever n_unique <= cap (the coarse 0.2-0.3 m sweep voxel grid yields
    far fewer voxels than the raw-cloud capacity the inputs are padded to —
    the full-capacity sweep wastes >10x compute on masked padding). Pick
    caps with generous headroom; if a cloud ever overflows, the overflow
    voxels (lexicographically last) are dropped from the sweep scoring
    only — the subsequent ICP still sees the full submap. With
    ``with_overflow`` the dropped-voxel counts are returned as extra
    outputs (R, t, src_drop, tgt_drop) so callers can count/warn instead
    of silently losing sweep accuracy.
    """
    src, sm = voxel_downsample(source_local, src_mask, voxel_size)
    tgt, tm = voxel_downsample(submap_global, submap_mask, voxel_size)
    src_drop = jnp.int32(0)
    tgt_drop = jnp.int32(0)
    if src_cap is not None and src_cap < src.shape[0]:
        src_drop = jnp.sum(sm[src_cap:].astype(jnp.int32))
        src, sm = src[:src_cap], sm[:src_cap]
    if tgt_cap is not None and tgt_cap < tgt.shape[0]:
        tgt_drop = jnp.sum(tm[tgt_cap:].astype(jnp.int32))
        tgt, tm = tgt[:tgt_cap], tm[:tgt_cap]

    pred_t = predicted_pose[:2, 2]
    pred_theta = jnp.arctan2(predicted_pose[1, 0], predicted_pose[0, 0])

    offsets = jnp.asarray(
        np.deg2rad(np.arange(-angle_range, angle_range + angle_step, angle_step)),
        jnp.float32,
    )
    angles = pred_theta + offsets
    scores = sweep_scores(src, sm, tgt, tm, angles, pred_t)
    best = angles[jnp.argmin(scores)]

    nf = _fine_count(angle_step, fine_step)
    if nf > 0:
        lo = best - np.deg2rad(angle_step)
        fine = lo + jnp.arange(nf, dtype=jnp.float32) * np.deg2rad(fine_step)
        fscores = sweep_scores(src, sm, tgt, tm, fine, pred_t)
        best = fine[jnp.argmin(fscores)]

    R_best = rotmat(best)

    # Translation refinement (slam.py:168-181): NN match at the predicted
    # placement, keep the closest 80% (squared-distance percentile), and take
    # the centroid offset of those correspondences.
    rotated = src @ R_best.T
    placed = rotated + pred_t
    nn_dists, nn_idx = nn_query(placed, tgt, tm, sm)
    d_sq = nn_dists * nn_dists
    thresh = _masked_percentile(d_sq, sm, 80.0)
    inlier = (d_sq <= thresh) & sm
    matched = tgt[nn_idx]
    refined_t = masked_mean(matched - rotated, inlier[:, None], axis=0)
    enough = jnp.sum(inlier.astype(jnp.float32)) >= 5
    t_out = jnp.where(enough, refined_t, pred_t)

    ok = (jnp.sum(sm) >= 5) & (jnp.sum(tm) >= 5)
    R_out = jnp.where(ok, R_best, predicted_pose[:2, :2])
    t_out = jnp.where(ok, t_out, pred_t)
    if with_overflow:
        return R_out, t_out, src_drop, tgt_drop
    return R_out, t_out
