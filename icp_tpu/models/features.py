"""Feature-based pre-alignment: curvature keypoints + descriptors + RANSAC.

TPU-native re-design of /root/reference/utilities/features.py:

* curvature: batched closed-form eigensolve (icp_tpu.ops.eig2) instead of a
  per-point eigh loop (features.py:35-54);
* keypoint NMS: the greedy descending-curvature suppression loop
  (features.py:57-71) becomes a ``lax.scan`` over sorted candidates with a
  vectorized distance check per step — same greedy result, on device;
* descriptors: one kNN query + sort (features.py:76-87);
* matching: batched Lowe ratio test via top-2 distances (features.py:92-106);
* RANSAC: all hypotheses batched with explicit PRNG keys
  (icp_tpu.ops.ransac, replacing features.py:125-160's sequential unseeded
  loop).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.ops.eig2 import compute_curvature
from icp_tpu.ops.nn import knn_query, pairwise_sqdist
from icp_tpu.ops.ransac import ransac_align
from icp_tpu.ops.voxel import voxel_downsample
from icp_tpu.utils.masking import BIG


@partial(jax.jit, static_argnames=("top_n", "block"))
def extract_keypoints(points, mask, curvatures, *, top_n: int = 100,
                      min_dist=0.3, block: int = 32):
    """Greedy descending-curvature selection with spatial NMS.

    Reference: extract_keypoints (/root/reference/utilities/features.py:57-71).
    Returns (kp_idx (top_n,) int32 original indices, kp_mask (top_n,) bool).
    Selection order (descending curvature) is preserved, matching the
    reference's output ordering.

    Greedy NMS is inherently sequential, but a length-N ``lax.scan`` with a
    tiny body is pure latency on TPU. Instead, candidates are processed in
    blocks of ``block``: one vectorized (B, N) clash check against
    already-kept points per block, then the B-step greedy recurrence
    unrolled over the block's (B, B) in-block distances. Identical output
    to the per-point loop (a point clashes either with an earlier block —
    the matrix check — or with an earlier point of its own block — the
    unrolled check), with N/B scan steps instead of N.
    """
    n = points.shape[0]
    curv = jnp.where(mask, curvatures, -1.0)
    order = jnp.argsort(-curv)                     # descending, invalid last
    pts_sorted = points[order]
    mask_sorted = mask[order]
    min_d2 = min_dist * min_dist

    n_pad = -(-n // block) * block
    pad = n_pad - n
    if pad:
        pts_sorted = jnp.concatenate(
            [pts_sorted, jnp.full((pad, 2), 1e9, pts_sorted.dtype)])
        mask_sorted = jnp.concatenate([mask_sorted, jnp.zeros(pad, bool)])

    def step(carry, b):
        kept, count = carry                        # kept: (n_pad,) sorted slots
        pb = lax.dynamic_slice(pts_sorted, (b * block, 0), (block, 2))
        mb = lax.dynamic_slice_in_dim(mask_sorted, b * block, block)
        # clash vs already-kept earlier blocks: one (B, N) pass
        d2_all = jnp.sum(
            (pb[:, None, :] - pts_sorted[None, :, :]) ** 2, axis=-1)
        clash_prev = jnp.any(kept[None, :] & (d2_all < min_d2), axis=1)
        # in-block greedy recurrence, unrolled (B small, static)
        d2_in = jnp.sum((pb[:, None, :] - pb[None, :, :]) ** 2, axis=-1)
        taken = jnp.zeros(block, bool)
        cnt = count
        for j in range(block):
            clash_in = jnp.any(taken & (d2_in[j] < min_d2))
            take = mb[j] & ~clash_prev[j] & ~clash_in & (cnt < top_n)
            taken = taken.at[j].set(take)
            cnt = cnt + take.astype(jnp.int32)
        kept = lax.dynamic_update_slice(kept, taken, (b * block,))
        return (kept, cnt), taken

    (kept, _), takes = lax.scan(
        step, (jnp.zeros(n_pad, bool), jnp.int32(0)),
        jnp.arange(n_pad // block)
    )
    takes = takes.reshape(n_pad)[:n]
    # compact the kept sorted-slots to the front, preserving order
    slot = jnp.cumsum(takes.astype(jnp.int32)) - 1
    slot = jnp.where(takes, slot, top_n)
    kp_idx = jnp.zeros(top_n, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop"
    )
    kp_count = jnp.sum(takes.astype(jnp.int32))
    kp_mask = jnp.arange(top_n) < kp_count
    return kp_idx, kp_mask


@partial(jax.jit, static_argnames=("k",))
def compute_descriptors(points, mask, kp_idx, kp_mask, *, k: int = 30):
    """Sorted-distance descriptor: distances to the k nearest points
    (self excluded), rotation invariant.

    Reference: compute_descriptors (/root/reference/utilities/features.py:76-87).
    Returns (top_n, k) f32.
    """
    kp_pts = points[kp_idx]
    dists, _ = knn_query(kp_pts, kp_mask, points, mask, k + 1)
    return dists[:, 1:]                            # drop self column


@jax.jit
def match_descriptors(da, ma, db, mb, ratio=0.8):
    """Lowe-ratio nearest-descriptor matching.

    Reference: match_descriptors (/root/reference/utilities/features.py:92-106).
    Returns (match_j (A,) int32 — index into db rows, match_mask (A,) bool).
    """
    D = pairwise_sqdist(da, db, mb)                # (A, B), masked cols BIG
    neg2, idx2 = lax.top_k(-D, 2)                  # two smallest
    d0, d1 = -neg2[:, 0], -neg2[:, 1]
    ratio_sq = ratio * ratio
    nb = jnp.sum(mb.astype(jnp.int32))
    ok = ma & (d0 < ratio_sq * d1) & (d1 < BIG) & (nb >= 2)
    return idx2[:, 0], ok


def compact_matches(src_kp, dst_kp, match_j, match_mask):
    """Gather matched pairs and compact valid ones to the front.

    Returns (src (A, 2), dst (A, 2), pair_mask (A,)) ready for ransac_align.
    """
    a = src_kp.shape[0]
    order = jnp.argsort(jnp.logical_not(match_mask))   # valid first, stable
    src = src_kp[order]
    dst = dst_kp[match_j[order]]
    count = jnp.sum(match_mask.astype(jnp.int32))
    pair_mask = jnp.arange(a) < count
    return src, dst, pair_mask


class FeatureSet(NamedTuple):
    """Extracted per-cloud features (fixed shapes; streamable state).

    ``kp_xy`` carries the keypoint coordinates directly so a cached set
    is self-contained (no gather into the source cloud needed later)."""
    pts: jax.Array        # (cap, 2) voxel-downsampled cloud
    mask: jax.Array       # (cap,)
    kp_xy: jax.Array      # (top_n, 2) keypoint coordinates
    kp_mask: jax.Array    # (top_n,)
    desc: jax.Array       # (top_n, k_descriptor)


def blank_features(cap: int, top_n: int, k_descriptor: int) -> FeatureSet:
    """All-invalid FeatureSet of the right shapes (state initializer)."""
    return FeatureSet(
        pts=jnp.zeros((cap, 2), jnp.float32),
        mask=jnp.zeros((cap,), bool),
        kp_xy=jnp.zeros((top_n, 2), jnp.float32),
        kp_mask=jnp.zeros((top_n,), bool),
        desc=jnp.zeros((top_n, k_descriptor), jnp.float32),
    )


@partial(
    jax.jit,
    static_argnames=("k_curvature", "top_n", "k_descriptor"),
)
def extract_features(points, mask, *, voxel_size=0.2, k_curvature: int = 10,
                     top_n: int = 100, min_kp_dist=0.3,
                     k_descriptor: int = 30) -> FeatureSet:
    """Per-cloud half of the pipeline: downsample -> curvature ->
    keypoints -> descriptors (reference features.py:283-295). Pure
    function of one cloud, so the fused streaming step caches the current
    scan's set and reuses it as the next scan's source — bit-exact."""
    pts, m = voxel_downsample(points, mask, voxel_size)
    curv = compute_curvature(pts, m, k=k_curvature)
    kpi, kpm = extract_keypoints(pts, m, curv, top_n=top_n,
                                 min_dist=min_kp_dist)
    desc = compute_descriptors(pts, m, kpi, kpm, k=k_descriptor)
    return FeatureSet(pts=pts, mask=m, kp_xy=pts[kpi], kp_mask=kpm,
                      desc=desc)


@partial(jax.jit, static_argnames=("ransac_iterations",))
def match_and_align(fs: FeatureSet, ft: FeatureSet, key, *,
                    ratio_threshold=0.8, ransac_iterations: int = 1000,
                    inlier_threshold=0.5):
    """Pair half: Lowe-ratio matching + batched RANSAC + failure gates
    (reference features.py:298-315). Returns (R, t, n_inliers)."""
    match_j, match_mask = match_descriptors(
        fs.desc, fs.kp_mask, ft.desc, ft.kp_mask, ratio_threshold
    )
    m_src, m_dst, pair_mask = compact_matches(
        fs.kp_xy, ft.kp_xy, match_j, match_mask
    )
    R, t, n_inliers = ransac_align(
        m_src, m_dst, pair_mask, key,
        n_iter=ransac_iterations, inlier_thresh=inlier_threshold,
    )
    enough = (
        (jnp.sum(fs.mask.astype(jnp.int32)) >= 10)
        & (jnp.sum(ft.mask.astype(jnp.int32)) >= 10)
        & (jnp.sum(fs.kp_mask.astype(jnp.int32)) >= 2)
        & (jnp.sum(ft.kp_mask.astype(jnp.int32)) >= 2)
        & (jnp.sum(match_mask.astype(jnp.int32)) >= 2)
    )
    R = jnp.where(enough, R, jnp.eye(2, dtype=jnp.float32))
    t = jnp.where(enough, t, jnp.zeros(2, jnp.float32))
    n_inliers = jnp.where(enough, n_inliers, 0)
    return R, t, n_inliers


@partial(
    jax.jit,
    static_argnames=("k_curvature", "top_n", "k_descriptor",
                     "ransac_iterations"),
)
def feature_based_alignment(
    source, src_mask, target, tgt_mask, key,
    *,
    voxel_size=0.2,
    k_curvature: int = 10,
    top_n: int = 100,
    min_kp_dist=0.3,
    k_descriptor: int = 30,
    ratio_threshold=0.8,
    ransac_iterations: int = 1000,
    inlier_threshold=0.5,
):
    """Full feature-alignment pipeline. Returns (R, t, n_inliers).

    Reference: feature_based_alignment
    (/root/reference/utilities/features.py:247-315). All failure paths
    (too few points / keypoints / matches, RANSAC failure) return
    (I, 0, 0) like the reference. Composed from extract_features (per
    cloud) + match_and_align (per pair)."""
    fs = extract_features(source, src_mask, voxel_size=voxel_size,
                          k_curvature=k_curvature, top_n=top_n,
                          min_kp_dist=min_kp_dist,
                          k_descriptor=k_descriptor)
    ft = extract_features(target, tgt_mask, voxel_size=voxel_size,
                          k_curvature=k_curvature, top_n=top_n,
                          min_kp_dist=min_kp_dist,
                          k_descriptor=k_descriptor)
    return match_and_align(fs, ft, key, ratio_threshold=ratio_threshold,
                           ransac_iterations=ransac_iterations,
                           inlier_threshold=inlier_threshold)
