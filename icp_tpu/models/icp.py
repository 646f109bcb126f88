"""Iterative Closest Point — fully jitted, masked, TPU-native.

Re-design of the reference driver (/root/reference/utilities/icp.py:132-223).
Differences that make it TPU-native rather than a translation:

* Per-scan point clouds are fixed-capacity (capacity, D) arrays + masks, so
  one compiled program serves a whole sequence (capacity bucketing happens at
  the call site).
* The iteration loop is a ``lax.while_loop`` over {NN query, correspondence
  gate, closed-form solve, accumulate, convergence check} — the whole solve
  is one XLA program with zero host round-trips.
* KDTree queries become masked brute-force MXU matmuls (icp_tpu.ops.nn).
* The SVD / np.linalg.solve steps become closed-form batched solves
  (icp_tpu.ops.rigid).
* Correspondence gating (max_corr_dist) is a weight vector, not a gather, so
  shapes stay static; the "too few inliers -> break" guard
  (reference icp.py:183-189) becomes a stop flag that freezes the state.

Convergence matches reference semantics (icp.py:215-218): stop when
|prev_error - error| < error_threshold, where error is the mean squared
point-to-point NN residual over all (valid) points, computed after applying
the iteration's transform. An extra relative floor (32 ulp of the error)
stops iteration once the delta is below f32 noise — the reference runs in
f64 where thresholds like 1e-10 are meaningful.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from icp_tpu.ops.nn import nn_query
from icp_tpu.ops.eig2 import estimate_normals
from icp_tpu.ops.rigid import p2p_solve_2d, p2p_solve_3d, p2l_solve_2d
from icp_tpu.ops.voxel import voxel_downsample
from icp_tpu.utils.masking import masked_mean

_F32_EPS = 1.1920929e-07  # plain float: no eager backend init at import


class ICPResult(NamedTuple):
    R: jax.Array          # (D, D) accumulated rotation
    t: jax.Array          # (D,) accumulated translation
    error: jax.Array      # scalar mean squared NN residual
    iters: jax.Array      # iterations executed
    n_inliers: jax.Array  # inlier count at the last executed iteration
    # points silently outside static capacities (icp_large: target cells
    # over `cap` / grid extent + final-bin query overflow past
    # qcells/qcap; 0 for the brute-force paths). Callers surface this —
    # a saturated capacity degrades matching invisibly otherwise
    # ("no silent caps"; the round-3 submap-ring density bug presented
    # exactly as an unexplained inlier collapse). Plain-int default: a
    # jnp default here would initialize a backend at module import.
    dropped: jax.Array | int = 0


def _nn_tiles(n: int, m: int):
    """Largest power-of-two Pallas tile sizes dividing (n, m), or None when
    the shapes don't meet the TPU tiling minimum (sublane 8, lane 128)."""
    tn = 256
    while tn >= 8 and n % tn:
        tn //= 2
    tm = 1024
    while tm >= 128 and m % tm:
        tm //= 2
    if n % tn or m % tm or tn < 8 or tm < 128:
        return None
    return tn, tm


@partial(
    jax.jit,
    static_argnames=("method", "max_iterations", "normal_k", "use_gate",
                     "nn_impl"),
)
def icp_core(
    source,
    src_mask,
    target,
    tgt_mask,
    R_init,
    t_init,
    *,
    method: str = "point_to_point",
    max_iterations: int = 100,
    normal_k: int = 10,
    error_threshold=1e-7,
    max_corr_dist=0.0,
    use_gate: bool = False,
    nn_impl: str = "auto",
):
    """ICP on already-downsampled masked clouds. See module docstring.

    source/target: (N, D)/(M, D) with masks. R_init/t_init must always be
    provided (identity for the un-initialized case) — they are dynamic
    values, so no retrace.

    ``nn_impl``: per-iteration correspondence search (the hot query,
    reference icp.py:179). "xla" materializes the (N, M) distance matrix;
    "pallas" streams target tiles through VMEM (ops/pallas/nn_kernel.py),
    keeping HBM traffic O(N+M) — the win grows with M (submap matching);
    "auto" picks pallas on TPU when the 2D shapes tile cleanly AND the
    target is large enough for streaming to pay: the measured crossover
    (BENCHMARKS.md decision table) is M ~ 4096 — below it the whole
    distance matrix is small enough that the fused XLA form wins (at
    768 x 768 inside the scanned fused step, XLA is ~1.3x faster; at
    1024 x 8192 pallas wins ~7%, at 65k targets ~1.6x). Both break
    argmin ties toward the lower index, so results are identical.
    """
    dim = source.shape[1]
    use_p2l = method == "point_to_line" and dim == 2

    nn_tiles = None
    if nn_impl in ("pallas", "auto") and dim == 2:
        nn_tiles = _nn_tiles(source.shape[0], target.shape[0])
        if nn_tiles is None and nn_impl == "pallas":
            raise ValueError(
                f"nn_impl='pallas' needs tileable 2D shapes, got "
                f"N={source.shape[0]}, M={target.shape[0]}")
        if nn_impl == "auto" and (
            jax.default_backend() not in ("tpu",)
            or target.shape[0] < 4096          # measured crossover
        ):
            nn_tiles = None
    n_valid = jnp.sum(src_mask.astype(jnp.float32))
    min_inliers = jnp.maximum(3.0, jnp.floor(n_valid / 10.0))
    max_corr_sq = jnp.asarray(max_corr_dist, jnp.float32) ** 2
    error_threshold = jnp.asarray(error_threshold, jnp.float32)

    target_normals = (
        estimate_normals(target, tgt_mask, k=normal_k) if use_p2l else None
    )

    def cond(carry):
        it, _, _, _, _, _, stop, _ = carry
        return (it < max_iterations) & jnp.logical_not(stop)

    def body(carry):
        it, transformed, r_total, t_total, prev_error, _, _, _ = carry

        if nn_tiles is not None:
            from icp_tpu.ops.pallas.nn_kernel import nn_pallas
            d2, nn_idx = nn_pallas(transformed, target, tgt_mask,
                                   tn=nn_tiles[0], tm=nn_tiles[1])
            nn_dists = jnp.sqrt(d2)
        else:
            nn_dists, nn_idx = nn_query(transformed, target, tgt_mask,
                                        src_mask)
        nearest = target[nn_idx]

        if use_gate:
            inlier = (nn_dists * nn_dists < max_corr_sq) & src_mask
        else:
            inlier = src_mask
        w = inlier.astype(jnp.float32)
        n_in = jnp.sum(w)
        abort = n_in < min_inliers  # reference icp.py:186-187

        if use_p2l:
            nm = target_normals[nn_idx]
            r, t = p2l_solve_2d(transformed, nearest, nm, w)
        elif dim == 2:
            r, t = p2p_solve_2d(transformed, nearest, w)
        else:
            r, t = p2p_solve_3d(transformed, nearest, w)

        new_r_total = r @ r_total
        new_t_total = t_total @ r.T + t
        new_transformed = transformed @ r.T + t

        sq = jnp.sum((nearest - new_transformed) ** 2, axis=-1)
        error = masked_mean(sq, src_mask)

        delta = jnp.abs(prev_error - error)
        eff_thresh = jnp.maximum(error_threshold, 32.0 * _F32_EPS * error)
        converged = delta < eff_thresh

        # On abort, freeze state (reference breaks before applying the solve).
        keep = jnp.logical_not(abort)
        transformed = jnp.where(keep, new_transformed, transformed)
        r_total = jnp.where(keep, new_r_total, r_total)
        t_total = jnp.where(keep, new_t_total, t_total)
        error = jnp.where(keep, error, prev_error)

        stop = abort | converged
        return (it + 1, transformed, r_total, t_total, error, error, stop, n_in)

    transformed0 = source @ R_init.T + t_init
    inf = jnp.float32(jnp.inf)
    carry0 = (
        jnp.int32(0), transformed0, R_init, t_init, inf, inf,
        jnp.bool_(False), jnp.float32(0),
    )
    it, _, r_total, t_total, _, error, _, n_in = lax.while_loop(
        cond, body, carry0
    )
    return ICPResult(r_total, t_total, error, it, n_in.astype(jnp.int32))


@partial(
    jax.jit,
    static_argnames=("method", "max_iterations", "normal_k", "use_gate",
                     "nn_impl"),
)
def icp(
    source,
    src_mask,
    target,
    tgt_mask,
    R_init,
    t_init,
    *,
    voxel_size,
    method: str = "point_to_point",
    max_iterations: int = 100,
    normal_k: int = 10,
    error_threshold=1e-7,
    max_corr_dist=0.0,
    use_gate: bool = False,
    nn_impl: str = "auto",
):
    """Full ICP entry: voxel-downsample both clouds, then run icp_core.

    Mirrors the reference ``ICP`` signature and flow
    (/root/reference/utilities/icp.py:132-223).
    """
    src_d, src_dm = voxel_downsample(source, src_mask, voxel_size)
    tgt_d, tgt_dm = voxel_downsample(target, tgt_mask, voxel_size)
    return icp_core(
        src_d, src_dm, tgt_d, tgt_dm, R_init, t_init,
        method=method,
        max_iterations=max_iterations,
        normal_k=normal_k,
        error_threshold=error_threshold,
        max_corr_dist=max_corr_dist,
        use_gate=use_gate,
        nn_impl=nn_impl,
    )


def identity_init(dim: int = 2):
    """Identity (R, t) pair for the 'no initial guess' case."""
    return jnp.eye(dim, dtype=jnp.float32), jnp.zeros((dim,), jnp.float32)


@partial(
    jax.jit,
    static_argnames=("max_iterations", "grid_shape", "cap", "qcap",
                     "qcells", "method"),
)
def icp_large(
    source,
    src_mask,
    target,
    tgt_mask,
    R_init,
    t_init,
    *,
    max_corr_dist,
    max_iterations: int = 50,
    error_threshold=1e-7,
    grid_shape: tuple = (256, 256),
    cap: int = 16,
    qcap: int = 16,
    qcells: int = 4096,
    cell_size=None,
    method: str = "point_to_point",
):
    """Gated ICP for large clouds (10^5+ points).

    The brute-force (N, M) distance matrix is infeasible at this scale, so
    correspondences come from a dense cell grid (icp_tpu.ops.densegrid)
    built ONCE on the target with cell size >= max_corr_dist: exact for
    every correspondence the gate would keep (reference icp.py:183-189
    discards pairs beyond max_corr_dist anyway).

    TPU-shaped iteration: the source cloud lives in COMPACT cell-binned
    planes (occupied cells x qcap); each iteration runs the zero-gather
    neighborhood compare (ops.densegrid.compact_nn), solves the rigid
    step directly on the compact planes, and transforms them in place.
    The O(N log N) re-binning sort only happens when accumulated movement
    exceeds the exactness margin (cell_size - max_corr_dist) — cell_size
    defaults to 1.5x max_corr_dist so early large steps re-bin and late
    small steps don't.

    ``grid_shape`` (static) must cover the target extent at cell_size;
    out-of-extent targets are dropped (grid.overflow).

    ``method="point_to_line"`` (the reference's s2s default,
    /root/reference/utilities/icp.py:192-195) uses per-CELL target
    normals from the binned grid (ops.densegrid.cell_normals) instead of
    per-point kNN normals — every match in a cell shares the normal of
    its 3x3-cell surface patch, gathered once per re-bin. Cells with a
    degenerate neighborhood fall back to the residual direction (which
    reduces the p2l residual to the p2p one for that pair). The solve is
    centered on the weighted source centroid: at 100 m world coordinates
    the raw [c, nx, ny] normal equations of the reference's formulation
    would be ~1e4-conditioned in f32.
    """
    from icp_tpu.ops.densegrid import (
        CompactQueries, bin_queries, build_dense_grid, cell_normals,
        compact_nn, grid_origin)

    use_p2l = method == "point_to_line"
    max_corr = jnp.asarray(max_corr_dist, jnp.float32)
    cell = (1.5 * max_corr if cell_size is None
            else jnp.asarray(cell_size, jnp.float32))
    margin = cell - max_corr
    origin = grid_origin(target, tgt_mask, cell)
    grid = build_dense_grid(target, tgt_mask, cell, origin,
                            grid_shape=grid_shape, cap=cap)
    if use_p2l:
        nrm_x, nrm_y, nrm_ok = cell_normals(grid)
    n_valid = jnp.sum(src_mask.astype(jnp.float32))
    min_inliers = jnp.maximum(3.0, jnp.floor(n_valid / 10.0))
    error_threshold = jnp.asarray(error_threshold, jnp.float32)
    max_corr_sq = max_corr * max_corr
    Cx = grid_shape[1]

    def gather_normals(cq: "CompactQueries"):
        """Per-query-cell target normal (one row gather per re-bin, not
        per iteration — staleness while a query drifts inside the margin
        is the same staleness the NN exactness contract tolerates)."""
        rows = cq.cell_yx[:, 0] * Cx + cq.cell_yx[:, 1]      # (qcells,)
        return nrm_x[rows], nrm_y[rows], nrm_ok[rows]

    def rebin(r_total, t_total):
        pts = source @ r_total.T + t_total
        cq = bin_queries(pts, src_mask, origin, cell,
                         grid_shape=grid_shape, qcells=qcells, qcap=qcap)
        nq = gather_normals(cq) if use_p2l else (
            jnp.zeros(1), jnp.zeros(1), jnp.zeros(1, bool))
        return cq, nq

    def cond(carry):
        return (carry[0] < max_iterations) & jnp.logical_not(carry[6])

    def body(carry):
        it, (cq, nq), r_total, t_total, prev_error, _, _, _, drift = carry

        d2, bi, bx, by = compact_nn(cq, grid)
        inlier = (d2 < max_corr_sq) & cq.mask
        w = inlier.astype(jnp.float32)
        n_in = jnp.sum(w)
        abort = n_in < min_inliers

        a = jnp.stack([cq.x.ravel(), cq.y.ravel()], axis=1)
        b = jnp.stack([bx.ravel(), by.ravel()], axis=1)
        wf = w.ravel()
        if use_p2l:
            nqx, nqy, nok = nq
            # residual-direction fallback for degenerate cells (acts as
            # a p2p pull for those pairs)
            d_s = jnp.sqrt(jnp.maximum(d2, 1e-12))
            fbx = (bx - cq.x) / d_s
            fby = (by - cq.y) / d_s
            nx_ = jnp.where(nok[:, None], nqx[:, None], fbx).ravel()
            ny_ = jnp.where(nok[:, None], nqy[:, None], fby).ravel()
            nrm = jnp.stack([nx_, ny_], axis=1)
            # center the solve on the weighted source centroid (f32)
            cw = jnp.sum(a * wf[:, None], 0) / jnp.maximum(n_in, 1.0)
            r, t1 = p2l_solve_2d(a - cw, b - cw, nrm, wf)
            t = t1 + cw - r @ cw
        else:
            r, t = p2p_solve_2d(a, b, wf)
        new_r_total = r @ r_total
        new_t_total = t_total @ r.T + t

        # transform the compact planes in place (rigid, elementwise)
        nx = r[0, 0] * cq.x + r[0, 1] * cq.y + t[0]
        ny = r[1, 0] * cq.x + r[1, 1] * cq.y + t[1]

        sq = (bx - nx) ** 2 + (by - ny) ** 2
        error = masked_mean(sq, inlier)
        delta = jnp.abs(prev_error - error)
        eff = jnp.maximum(error_threshold, 32.0 * _F32_EPS * error)
        converged = delta < eff

        keep = jnp.logical_not(abort)
        kf = keep.astype(jnp.float32)
        nx = kf * nx + (1.0 - kf) * cq.x
        ny = kf * ny + (1.0 - kf) * cq.y
        r_total = jnp.where(keep, new_r_total, r_total)
        t_total = jnp.where(keep, new_t_total, t_total)
        error = jnp.where(keep, error, prev_error)

        # conservative drift bound: the largest per-point displacement
        move_sq = jnp.max(jnp.where(cq.mask,
                                    (nx - cq.x) ** 2 + (ny - cq.y) ** 2,
                                    0.0))
        drift = drift + jnp.sqrt(move_sq)
        cq_moved = (cq._replace(x=nx, y=ny), nq)
        cq_next, drift = lax.cond(
            drift > margin,
            lambda: (rebin(r_total, t_total), jnp.float32(0.0)),
            lambda: (cq_moved, drift),
        )
        return (it + 1, cq_next, r_total, t_total, error, error,
                abort | converged, n_in, drift)

    cq0 = rebin(R_init, t_init)
    inf = jnp.float32(jnp.inf)
    carry0 = (jnp.int32(0), cq0, R_init, t_init, inf, inf,
              jnp.bool_(False), jnp.float32(0), jnp.float32(0))
    out = lax.while_loop(cond, body, carry0)
    it, (cq_f, _), r_total, t_total, _, error, _, n_in, _ = out
    dropped = grid.overflow + cq_f.overflow
    return ICPResult(r_total, t_total, error, it, n_in.astype(jnp.int32),
                     dropped)
