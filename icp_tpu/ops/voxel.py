"""Mean-per-voxel downsampling as a sort + segment reduction.

The reference implements this with ``np.unique(..., axis=0)`` +
``np.bincount`` (/root/reference/utilities/icp.py:117-129), both of which
have data-dependent output shapes. The TPU-native formulation keeps a static
shape: lexicographically sort points by integer voxel coordinates
(``lax.sort`` with multiple keys — one fused on-device sort), mark segment
heads, assign each segment a dense slot with a cumulative sum, and
scatter-add points into fixed-capacity (sum, count) accumulators. Output
capacity equals input capacity (n_unique <= n_valid always), so shapes are
static and the op jits once per capacity bucket.

Slot ordering matches ``np.unique``'s lexicographic row order, so outputs are
element-wise comparable to the reference (mean computed in f32 vs f64).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_INT_SENTINEL = 2**30  # sorts after any real voxel coordinate (plain int)


@partial(jax.jit, static_argnames=())
def voxel_downsample(points, mask, voxel_size):
    """Masked mean-per-voxel downsample.

    Parameters
    ----------
    points : (N, D) f32, D in {2, 3}
    mask : (N,) bool — valid input slots
    voxel_size : scalar (traced ok)

    Returns
    -------
    out_points : (N, D) f32 — voxel means, lexicographic voxel order
    out_mask : (N,) bool — True for the first n_unique slots
    """
    n, d = points.shape
    inv = 1.0 / voxel_size
    min_bound = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    coords = jnp.floor((points - min_bound) * inv).astype(jnp.int32)
    coords = jnp.where(mask[:, None], coords, _INT_SENTINEL)

    # Lexicographic sort by (c0, c1[, c2]), carrying the coordinate planes
    # through the sort as values: no post-sort gathers (element gathers
    # execute near-scalar on TPU, and a (N, 2) row gather additionally
    # pads the trailing dim to 128 lanes — see BENCHMARKS.md layout notes).
    keys = tuple(coords[:, j] for j in range(d))
    vals = tuple(points[:, j] for j in range(d))
    sorted_ops = lax.sort(keys + vals, num_keys=d, is_stable=False)
    sorted_keys = jnp.stack(sorted_ops[:d], axis=1)        # (N, D)
    sorted_mask = sorted_ops[0] != _INT_SENTINEL

    # Segment heads: first row, or any voxel coordinate differs from prev.
    diff = jnp.any(sorted_keys != jnp.roll(sorted_keys, 1, axis=0), axis=1)
    head = diff.at[0].set(True) & sorted_mask
    slot = jnp.cumsum(head.astype(jnp.int32)) - 1          # (N,) dense segment id
    slot = jnp.where(sorted_mask, slot, n)                 # invalid -> dropped

    # Per-plane flat scatters (a (N, D) row scatter would lane-pad D->128).
    counts = jnp.zeros((n,), points.dtype).at[slot].add(
        sorted_mask.astype(points.dtype), mode="drop"
    )
    sums = [
        jnp.zeros((n,), points.dtype).at[slot].add(
            jnp.where(sorted_mask, sorted_ops[d + j], 0.0), mode="drop"
        )
        for j in range(d)
    ]
    out_mask = counts > 0
    out = jnp.stack(sums, axis=1) / jnp.maximum(counts, 1.0)[:, None]
    # Park invalid slots on the first voxel mean so stray unmasked reads
    # stay in-range.
    out = jnp.where(out_mask[:, None], out, out[0])
    return out, out_mask


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample_fixed(points, mask, voxel_size, capacity: int):
    """voxel_downsample with output truncated/padded to ``capacity`` slots.

    Useful when the consumer wants a smaller static shape than the input
    capacity (e.g. submap assembly). Voxels beyond ``capacity`` are dropped
    (callers choose capacity >= expected unique count).

    When capacity < N the segment means are computed WITHOUT scatters:
    TPU scatter-add costs ~10 ns per scattered element regardless of
    operand size (tools/profile_scatter.py), so the three (N,) scatters of
    voxel_downsample dominate the fused SLAM step at submap scale
    (N = ring_k * cap). Because the rows are already sorted by voxel key,
    each voxel is a contiguous run: compact the run-start positions with
    one single-key sort, take per-plane cumulative sums, and difference
    them at the run boundaries — one (capacity+1,) gather per plane
    instead of one (N,) scatter per plane.
    """
    n, d = points.shape
    if capacity >= n:
        out, out_mask = voxel_downsample(points, mask, voxel_size)
        pad = capacity - n
        out = jnp.pad(out, ((0, pad), (0, 0)))
        out_mask = jnp.pad(out_mask, (0, pad))
        return out, out_mask

    inv = 1.0 / voxel_size
    min_bound = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    coords = jnp.floor((points - min_bound) * inv).astype(jnp.int32)
    coords = jnp.where(mask[:, None], coords, _INT_SENTINEL)

    keys = tuple(coords[:, j] for j in range(d))
    vals = tuple(points[:, j] for j in range(d))
    sorted_ops = lax.sort(keys + vals, num_keys=d, is_stable=False)
    sorted_keys = jnp.stack(sorted_ops[:d], axis=1)
    sorted_mask = sorted_ops[0] != _INT_SENTINEL

    diff = jnp.any(sorted_keys != jnp.roll(sorted_keys, 1, axis=0), axis=1)
    head = diff.at[0].set(True) & sorted_mask

    # run-start positions of the first `capacity` voxels (+1 for the end
    # boundary of the last kept run; sentinel n when fewer runs exist)
    idx = jnp.arange(n, dtype=jnp.int32)
    bpos = jnp.where(head, idx, n).astype(jnp.int32)
    pos = lax.sort(bpos, is_stable=False)[:capacity + 1]

    def seg_sums(v):
        csp = jnp.concatenate([jnp.zeros((1,), v.dtype), jnp.cumsum(v)])
        g = csp[pos]
        return g[1:] - g[:-1]

    counts = seg_sums(sorted_mask.astype(points.dtype))
    # Cumsum-difference in f32 loses precision once the running total gets
    # large, so accumulate per-point DEVIATIONS from the voxel center
    # (each bounded by voxel_size/2) and reconstruct
    # mean = center + sum(dev)/count. The center is constant within a run,
    # read back at the run-start rows.
    start_row = jnp.minimum(pos[:-1], n - 1)        # clamp sentinels
    out_mask = counts > 0.5
    cols = []
    for j in range(d):
        center = min_bound[j] + (
            sorted_ops[j].astype(points.dtype) + 0.5) * voxel_size
        dev = jnp.where(sorted_mask, sorted_ops[d + j] - center, 0.0)
        seg_center = center[start_row]
        cols.append(seg_center
                    + seg_sums(dev) / jnp.maximum(counts, 1.0))
    out = jnp.stack(cols, axis=1)
    out = jnp.where(out_mask[:, None], out, out[0])
    return out, out_mask
