"""Batched RANSAC rigid alignment — all hypotheses in parallel.

The reference runs 1000 sequential hypotheses with unseeded ``np.random``
(/root/reference/utilities/features.py:125-160). TPU-native: sample all
hypothesis pairs with an explicit PRNG key, fit every 2-point rigid
transform with the closed-form Procrustes (no try/except — the closed form
is total), evaluate all H x P residuals as one batched computation, argmax
inliers, then refit on the best hypothesis's inlier set. Deterministic given
the key; hypothesis axis shards trivially across devices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from icp_tpu.ops.rigid import p2p_solve_2d


@partial(jax.jit, static_argnames=("n_iter",))
def ransac_align(src, dst, pair_mask, key, *, n_iter: int = 1000,
                 inlier_thresh=0.5):
    """RANSAC rigid 2D transform from matched point pairs.

    src, dst: (P, 2) matched pairs, ``pair_mask`` (P,) marks valid pairs
    (valid pairs must be compacted to the front — see
    icp_tpu.models.features.compact_matches). Returns (R, t, n_inliers):
    identity and 0 when fewer than 2 pairs or no hypothesis scores an inlier
    (reference features.py:130-131,137-138).
    """
    P = src.shape[0]
    n = jnp.sum(pair_mask.astype(jnp.int32))
    nf = n.astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (n_iter,))
    u2 = jax.random.uniform(k2, (n_iter,))
    # sample 2 distinct indices from [0, n): i2 skips i1
    i1 = jnp.minimum((u1 * nf).astype(jnp.int32), jnp.maximum(n - 1, 0))
    i2r = jnp.minimum((u2 * jnp.maximum(nf - 1.0, 1.0)).astype(jnp.int32),
                      jnp.maximum(n - 2, 0))
    i2 = i2r + (i2r >= i1).astype(jnp.int32)
    i2 = jnp.minimum(i2, jnp.maximum(n - 1, 0))

    two_w = jnp.ones((2,), jnp.float32)

    def fit(a, b):
        s2 = jnp.stack([src[a], src[b]])
        d2 = jnp.stack([dst[a], dst[b]])
        return p2p_solve_2d(s2, d2, two_w)

    Rs, ts = jax.vmap(fit)(i1, i2)                       # (H, 2, 2), (H, 2)

    # residuals of every hypothesis on every pair: (H, P)
    proj = jnp.einsum("pd,hed->hpe", src, Rs) + ts[:, None, :]
    err = jnp.linalg.norm(proj - dst[None, :, :], axis=-1)
    is_in = (err < inlier_thresh) & pair_mask[None, :]
    counts = jnp.sum(is_in.astype(jnp.int32), axis=-1)   # (H,)

    best = jnp.argmax(counts)                            # first max, like the
    best_count = counts[best]                            # reference's strict >
    R_best, t_best = Rs[best], ts[best]

    # refit on all inliers of the best model (features.py:152-158)
    mask_best = is_in[best]
    m_count = jnp.sum(mask_best.astype(jnp.int32))
    R_refit, t_refit = p2p_solve_2d(src, dst, mask_best.astype(jnp.float32))
    use_refit = (best_count >= 2) & (m_count >= 2)
    R_out = jnp.where(use_refit, R_refit, R_best)
    t_out = jnp.where(use_refit, t_refit, t_best)
    n_out = jnp.where(use_refit, m_count, best_count)

    ok = (n >= 2) & (best_count > 0)
    R_out = jnp.where(ok, R_out, jnp.eye(2, dtype=src.dtype))
    t_out = jnp.where(ok, t_out, jnp.zeros(2, src.dtype))
    n_out = jnp.where(ok, n_out, 0)
    return R_out, t_out, n_out
