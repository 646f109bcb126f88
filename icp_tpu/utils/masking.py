"""Fixed-capacity padded point sets.

The reference pipeline is dynamic everywhere (per-scan point counts vary,
inlier sets shrink, voxel outputs have data-dependent size). XLA traces one
static shape, so the TPU-native design represents every point cloud as a
``(capacity, D)`` array plus a boolean validity mask. All kernels in
``icp_tpu.ops`` accept and produce (points, mask) pairs.

Capacities are bucketed to powers of two so the number of distinct compiled
programs stays small across a whole sequence.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# sentinel "infinite" distance for masked slots; a plain float (not a jnp
# scalar) so importing this module never initializes an XLA backend —
# jax.distributed.initialize must run before any backend touch
BIG = 1e30


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (minimum 8)."""
    n = max(int(n), 8)
    return 1 << (n - 1).bit_length()


def bucket_capacity(n: int, minimum: int = 256) -> int:
    """Pad-target capacity for n points: pow2 bucketing with a floor, so
    repeated calls across a sequence reuse a handful of compiled programs."""
    return max(next_pow2(n), minimum)


def pad_points(points: np.ndarray, capacity: int | None = None):
    """Pad an (n, D) host array to (capacity, D) + bool mask.

    Padding rows are filled with the first valid point (not zeros) so that
    masked reductions that forget the mask still see in-range coordinates
    rather than wild values. Returns numpy arrays (cheap to device_put).
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if capacity is None:
        capacity = bucket_capacity(n)
    if n > capacity:
        raise ValueError(f"point count {n} exceeds capacity {capacity}")
    d = points.shape[1] if points.ndim == 2 else 2
    out = np.zeros((capacity, d), dtype=np.float32)
    if n > 0:
        out[:n] = points
        out[n:] = points[0]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return out, mask


def masked_min(x, mask, axis=None):
    """Min of x over entries where mask is True (BIG where all-masked)."""
    return jnp.min(jnp.where(mask, x, BIG), axis=axis)


def masked_max(x, mask, axis=None):
    return jnp.max(jnp.where(mask, x, -BIG), axis=axis)


def masked_mean(x, mask, axis=None, eps=1e-12):
    """Mean of x over entries where mask is True."""
    m = mask.astype(x.dtype)
    s = jnp.sum(x * m, axis=axis)
    c = jnp.sum(m, axis=axis)
    return s / jnp.maximum(c, eps)


def masked_centroid(points, mask):
    """(N, D), (N,) -> (D,) masked mean of points."""
    return masked_mean(points, mask[..., None], axis=-2)
