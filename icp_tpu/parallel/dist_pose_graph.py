"""Distributed SE(2) pose-graph Gauss-Newton.

Scale path for the reference's dense O(n^3) optimizer
(/root/reference/utilities/pose_graph.py:92-127): the normal-equation
system H dx = -b is a sum over edges, so edges shard across devices and
the per-shard partial sums combine with psum over ICI — the classic
"distributed normal equations" pattern (SURVEY.md §5, BASELINE.json).

Two solve strategies:

* ``gn_step_sharded`` — dense: each device assembles H/b from its edge
  shard, psum, replicated dense solve. Right for n up to ~1-2k nodes.
* ``gn_step_cg_sharded`` — matrix-free: block-Jacobi-preconditioned CG
  where each Hx product is an edge gather/compute/scatter on the local
  shard followed by a psum. Never materializes H; scales to 50k+ keyframes
  (BASELINE.json config #5).
* ``gn_step_schur_sharded`` — EXACT distributed solve via Schur-complement
  reduction (the BASELINE.json north-star pattern): keyframes are sharded
  in contiguous chunks; the separator set is the endpoints of cross-chunk
  edges (plus the anchor). Each device densely eliminates its interior
  block H_II locally, the reduced separator system
  S = H_SS - H_SI H_II^-1 H_IS is psum-combined over ICI and solved
  replicated (3s x 3s, s = #separators, small for SLAM graphs where cross
  edges are chain links + loop closures), and interiors back-substitute
  locally. One GN step = one local dense factorization + ONE psum round —
  exact (matches the dense solve to solver precision), D x the dense
  path's memory/compute capacity, no iteration-count tuning like CG.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icp_tpu.models.pose_graph import (
    ANCHOR_WEIGHT, edge_terms, _block_products, _scatter_dense,
    robust_omega,
)
from icp_tpu.utils.se2 import wrap_angle


def _apply_update(nodes, node_mask, dx):
    n = nodes.shape[0]
    dxr = dx.reshape(n, 3)
    new = jnp.stack([
        nodes[:, 0] + dxr[:, 0],
        nodes[:, 1] + dxr[:, 1],
        wrap_angle(nodes[:, 2] + dxr[:, 2]),
    ], axis=-1)
    return jnp.where(node_mask[:, None], new, nodes)


def gn_step_sharded(mesh: Mesh, nodes, node_mask, ei, ej, z, omega,
                    edge_mask, fix_node, *, axis: str = "d"):
    """One dense GN step with edges sharded over ``axis``.

    nodes replicated (N, 3); edge arrays sharded on their leading axis
    (length divisible by mesh size; pad with masked edges).
    Returns updated replicated nodes.
    """
    n = nodes.shape[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def _step(nd, nm, lei, lej, lz, lom, lem, fix):
        e, A, B = edge_terms(nd, lei, lej, lz, lom, lem)
        blocks = _block_products(e, A, B, lom, lem)
        H, b = _scatter_dense(n, lei, lej, *blocks)
        H = lax.psum(H, axis)                      # combine edge shards
        b = lax.psum(b, axis)

        idx3 = jnp.arange(3 * n)
        anchor = (idx3 // 3) == fix
        H = jnp.where(anchor[:, None] | anchor[None, :], 0.0, H)
        H = H + jnp.diag(
            jnp.where(anchor, ANCHOR_WEIGHT, 0.0)
            + jnp.where(jnp.repeat(jnp.logical_not(nm), 3), 1.0, 0.0)
        )
        b = jnp.where(anchor, 0.0, b)
        dx = jnp.linalg.solve(H, -b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return _apply_update(nd, nm, dx)

    return _step(nodes, node_mask, ei, ej, z, omega, edge_mask, fix_node)


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (block-Jacobi preconditioner)."""
    c0 = jnp.cross(M[..., :, 1], M[..., :, 2], axis=-1)
    c1 = jnp.cross(M[..., :, 2], M[..., :, 0], axis=-1)
    c2 = jnp.cross(M[..., :, 0], M[..., :, 1], axis=-1)
    det = jnp.sum(M[..., :, 0] * c0, axis=-1)[..., None, None]
    adj = jnp.stack([c0, c1, c2], axis=-2)         # rows of adjugate^T
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    inv = adj / safe
    eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
    return jnp.where(jnp.abs(det) > 1e-12, inv, eye)


def gn_step_cg_sharded(mesh: Mesh, nodes, node_mask, ei, ej, z, omega,
                       edge_mask, fix_node, robust_mask=None,
                       robust_phi=1.0, damping=0.0, *, axis: str = "d",
                       cg_iters: int = 50, cg_tol=1e-8):
    """One matrix-free GN step: block-Jacobi preconditioned CG over
    psum-combined edge shards. Never forms H. ``robust_mask`` flags edges
    for DCS reweighting (models.pose_graph.robust_omega). ``damping`` > 0
    is the Levenberg-Marquardt diagonal scaling (H + damping diag(H)),
    applied matrix-free inside Hx and to the preconditioner blocks; 0 is
    plain GN. Returns updated nodes."""
    n = nodes.shape[0]
    if robust_mask is None:
        robust_mask = jnp.zeros(ei.shape[0], bool)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P()),
        out_specs=P(),
    )
    def _step(nd, nm, lei, lej, lz, lom, lem, lrb, rphi, damp, fix):
        e, A, B = edge_terms(nd, lei, lej, lz, lom, lem)
        lom = robust_omega(e, lom, lrb, rphi)
        w = lem.astype(e.dtype)[:, None, None]
        om = lom * w
        AtO = jnp.einsum("eij,eik->ejk", A, om)
        BtO = jnp.einsum("eij,eik->ejk", B, om)

        free = nm & (jnp.arange(n) != fix)          # solvable nodes

        # rhs: -b, projected to free nodes
        b = jnp.zeros((n, 3), e.dtype)
        b = b.at[lei].add(jnp.einsum("ejk,ek->ej", AtO, e))
        b = b.at[lej].add(jnp.einsum("ejk,ek->ej", BtO, e))
        b = lax.psum(b, axis)
        rhs = jnp.where(free[:, None], -b, 0.0)

        # block-diagonal of H for the preconditioner
        Dblk = jnp.zeros((n, 3, 3), e.dtype)
        Dblk = Dblk.at[lei].add(jnp.einsum("ejk,ekl->ejl", AtO, A))
        Dblk = Dblk.at[lej].add(jnp.einsum("ejk,ekl->ejl", BtO, B))
        Dblk = lax.psum(Dblk, axis)
        Dblk = Dblk + jnp.eye(3, dtype=e.dtype) * 1e-8
        # LM diagonal (H's per-coordinate diagonal = Dblk's): damp both
        # the operator (matrix-free, below) and the preconditioner blocks
        dvec = jnp.diagonal(Dblk, axis1=-2, axis2=-1)          # (n, 3)
        Minv = _inv3x3(Dblk + damp * dvec[:, :, None] * jnp.eye(3,
                                                               dtype=e.dtype))

        # Hx product without materializing H: per edge, s = A x_i + B x_j,
        # then y_i += A^T om s and y_j += B^T om s, psum across shards.
        def Hx(x):
            xp = jnp.where(free[:, None], x, 0.0)
            s = (jnp.einsum("ejk,ek->ej", A, xp[lei])
                 + jnp.einsum("ejk,ek->ej", B, xp[lej]))
            oms = jnp.einsum("ejk,ek->ej", om, s)
            y = jnp.zeros_like(x)
            y = y.at[lei].add(jnp.einsum("ekj,ek->ej", A, oms))
            y = y.at[lej].add(jnp.einsum("ekj,ek->ej", B, oms))
            y = lax.psum(y, axis)
            y = y + damp * dvec * xp       # (H + damp diag(H)) x
            return jnp.where(free[:, None], y, 0.0)

        def precond(r):
            return jnp.einsum("njk,nk->nj", Minv, r) * free[:, None]

        # PCG
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def body(carry, _):
            x, r, p, rz = carry
            Hp = Hx(p)
            denom = jnp.sum(p * Hp)
            alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * Hp
            zz = precond(r)
            rz_new = jnp.sum(r * zz)
            beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
            p = zz + beta * p
            return (x, r, p, rz_new), rz_new

        (xf, _, _, _), _ = lax.scan(body, (x0, r0, p0, rz0), None,
                                    length=cg_iters)
        dx = xf.reshape(-1)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return _apply_update(nd, nm, dx)

    return _step(nodes, node_mask, ei, ej, z, omega, edge_mask,
                 robust_mask, jnp.float32(robust_phi),
                 jnp.float32(damping), fix_node)


class SchurPartition(NamedTuple):
    """Host-computed graph partition for ``gn_step_schur_sharded``.

    Keyframes split into ``n_dev`` contiguous chunks; separators are the
    endpoints of cross-chunk edges plus the anchor node. Edges are
    re-bucketed so every edge lives on the device owning its interior
    endpoint (separator-separator edges go to the first endpoint's chunk),
    which makes each device's interior Hessian block complete locally.
    All (D, ...) arrays are padded to uniform per-device capacities, and
    every capacity (interiors, edges, separators) is rounded up to a
    power of two so repeated optimize calls on a growing graph reuse a
    handful of compiled step programs instead of re-tracing each time.
    """
    int_ids: np.ndarray    # (D, i_cap) int32 global ids, n = padding
    int_valid: np.ndarray  # (D, i_cap) bool
    sep_ids: np.ndarray    # (s_cap,) int32 global separator ids (padded)
    sep_valid: np.ndarray  # (s_cap,) bool
    lei: np.ndarray        # (D, e_cap) int32 global i endpoint
    lej: np.ndarray        # (D, e_cap) int32 global j endpoint
    lei_loc: np.ndarray    # (D, e_cap) int32 unified local index of i
    lej_loc: np.ndarray    # (D, e_cap) int32 unified local index of j
    z: np.ndarray          # (D, e_cap, 3)
    omega: np.ndarray      # (D, e_cap, 3, 3)
    edge_mask: np.ndarray  # (D, e_cap) bool
    robust: np.ndarray     # (D, e_cap) bool — DCS-reweighted edges
    fix_sep_pos: int       # anchor's position in sep_ids


def partition_graph(n: int, ei, ej, z, omega, edge_mask, n_dev: int,
                    fix_node: int, robust=None) -> SchurPartition:
    """Partition a pose graph for the distributed Schur solve (host side,
    NumPy; runs once per optimize call, not per GN iteration).
    ``robust``: optional (E,) bool DCS flags, re-bucketed with the edges."""
    ei = np.asarray(ei, np.int64)
    ej = np.asarray(ej, np.int64)
    em = np.asarray(edge_mask, bool)
    z = np.asarray(z, np.float32)
    om = np.asarray(omega, np.float32)
    rb = (np.zeros(len(ei), bool) if robust is None
          else np.asarray(robust, bool))

    chunk = -(-n // n_dev)                       # ceil
    dev_of = np.minimum(np.arange(n) // chunk, n_dev - 1)

    cross = em & (dev_of[ei] != dev_of[ej])
    sep = np.unique(np.concatenate(
        [ei[cross], ej[cross], np.array([fix_node], np.int64)]))
    sep_pos = np.full(n, -1, np.int64)
    sep_pos[sep] = np.arange(len(sep))
    is_sep = sep_pos >= 0

    def _pow2(x, lo=1):
        return max(lo, 1 << max(0, int(x) - 1).bit_length())

    int_lists = []
    int_pos = np.full(n, -1, np.int64)           # position in OWN device list
    for d in range(n_dev):
        ids = np.where((dev_of == d) & ~is_sep)[0]
        int_pos[ids] = np.arange(len(ids))
        int_lists.append(ids)
    i_cap = _pow2(max(len(x) for x in int_lists))
    int_ids = np.full((n_dev, i_cap), n, np.int32)
    int_valid = np.zeros((n_dev, i_cap), bool)
    for d, ids in enumerate(int_lists):
        int_ids[d, :len(ids)] = ids
        int_valid[d, :len(ids)] = True

    # edge -> device of its interior endpoint (sep-sep: first endpoint)
    e_dev = np.where(~is_sep[ei], dev_of[ei],
                     np.where(~is_sep[ej], dev_of[ej], dev_of[ei]))

    def uloc(node):
        return np.where(is_sep[node], i_cap + sep_pos[node], int_pos[node])

    buckets = [np.where(em & (e_dev == d))[0] for d in range(n_dev)]
    e_cap = _pow2(max(len(b) for b in buckets))
    L = lambda shape, fill, dt: np.full(shape, fill, dt)
    lei = L((n_dev, e_cap), 0, np.int32)
    lej = L((n_dev, e_cap), 0, np.int32)
    lei_loc = L((n_dev, e_cap), 0, np.int32)
    lej_loc = L((n_dev, e_cap), 0, np.int32)
    lz = np.zeros((n_dev, e_cap, 3), np.float32)
    lom = np.zeros((n_dev, e_cap, 3, 3), np.float32)
    lem = np.zeros((n_dev, e_cap), bool)
    lrb = np.zeros((n_dev, e_cap), bool)
    for d, b in enumerate(buckets):
        k = len(b)
        lei[d, :k] = ei[b]
        lej[d, :k] = ej[b]
        lei_loc[d, :k] = uloc(ei[b])
        lej_loc[d, :k] = uloc(ej[b])
        lz[d, :k] = z[b]
        lom[d, :k] = om[b]
        lem[d, :k] = True
        lrb[d, :k] = rb[b]

    s_raw = len(sep)
    s_cap = _pow2(s_raw)
    sep_ids = np.zeros(s_cap, np.int32)
    sep_ids[:s_raw] = sep
    sep_valid = np.zeros(s_cap, bool)
    sep_valid[:s_raw] = True
    return SchurPartition(int_ids, int_valid, sep_ids, sep_valid,
                          lei, lej, lei_loc, lej_loc, lz, lom, lem, lrb,
                          int(sep_pos[fix_node]))


def gn_step_schur_sharded(mesh: Mesh, nodes, node_mask,
                          part: SchurPartition, robust_phi=1.0,
                          damping=0.0, *, axis: str = "d"):
    """One EXACT GN step via distributed Schur-complement reduction.

    Per device: assemble the local (interior + separator) normal-equation
    blocks from its edge bucket, factor H_II once against [H_IS | b_I]
    (so back-substitution is a matmul, not a second solve), psum the
    reduced separator system, solve it replicated, back-substitute.
    Matches the reference dense iteration
    (/root/reference/utilities/pose_graph.py:92-127) exactly on the same
    graph. Returns updated replicated nodes.
    """
    n = nodes.shape[0]
    i_cap = part.int_ids.shape[1]
    s = len(part.sep_ids)
    nl = i_cap + s
    k = 3 * i_cap
    fix_sep = part.fix_sep_pos

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(),
                  P(axis), P(axis), P(), P(),
                  P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def _step(nd, nm, int_ids, int_valid, sep_ids, sep_valid,
              lei, lej, lei_loc, lej_loc, lz, lom, lem, lrb, rphi, damp):
        int_ids, int_valid = int_ids[0], int_valid[0]
        lei, lej = lei[0], lej[0]
        lei_loc, lej_loc = lei_loc[0], lej_loc[0]
        lz, lom, lem, lrb = lz[0], lom[0], lem[0], lrb[0]

        e, A, B = edge_terms(nd, lei, lej, lz, lom, lem)
        lom = robust_omega(e, lom, lrb, rphi)
        blocks = _block_products(e, A, B, lom, lem)
        H, b = _scatter_dense(nl, lei_loc, lej_loc, *blocks)

        # interior regularization: padded slots and invalid nodes get an
        # identity diagonal (their rhs is zero, so their dx is zero)
        nm_pad = jnp.concatenate([nm, jnp.zeros(1, bool)])   # id n = padding
        int_reg = jnp.logical_not(int_valid & nm_pad[int_ids])
        diag = jnp.zeros(3 * nl, H.dtype).at[:k].set(jnp.repeat(int_reg, 3))
        H = H + jnp.diag(diag)
        # LM diagonal scaling: interior diagonals are complete locally;
        # the separator block's partial diagonals sum to the global one
        # under the psum below, so local damp * diag(H) is globally exact
        H = H + jnp.diag(damp * jnp.diag(H))

        H_II = H[:k, :k]
        H_IS = H[:k, k:]
        H_SS = H[k:, k:]
        b_I = b[:k]
        b_S = b[k:]

        # one factorization serves reduction AND back-substitution
        X = jnp.linalg.solve(H_II, jnp.concatenate([H_IS, b_I[:, None]], 1))
        X_IS, x_b = X[:, :-1], X[:, -1]
        S = lax.psum(H_SS - H_IS.T @ X_IS, axis)
        r = lax.psum(b_S - H_IS.T @ x_b, axis)

        # anchor clamp on the reduced system (reference :109-114 semantics)
        a = (jnp.arange(3 * s) // 3) == fix_sep
        # padded separator slots route through the sentinel node row n
        # (masked, identity diagonal, zero rhs) so their dx is discarded
        nm_pad2 = jnp.concatenate([nm, jnp.zeros(1, bool)])
        uid = jnp.where(sep_valid, sep_ids, n)
        sep_bad = jnp.repeat(jnp.logical_not(nm_pad2[uid] & sep_valid), 3)
        S = jnp.where(a[:, None] | a[None, :], 0.0, S)
        S = S + jnp.diag(jnp.where(a, ANCHOR_WEIGHT, 0.0)
                         + jnp.where(sep_bad, 1.0, 0.0))
        r = jnp.where(a, 0.0, r)

        dx_S = jnp.linalg.solve(S, -r)
        dx_I = -(X_IS @ dx_S + x_b)                 # = H_II^-1(-b_I - H_IS dx_S)

        dx = jnp.zeros((n + 1, 3), nd.dtype)
        dx = dx.at[int_ids].add(
            dx_I.reshape(i_cap, 3) * int_valid[:, None])
        dx = lax.psum(dx, axis)
        dx = dx.at[uid].set(dx_S.reshape(s, 3))
        dx = dx[:n].reshape(-1)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return _apply_update(nd, nm, dx)

    return _step(nodes, node_mask,
                 jnp.asarray(part.int_ids), jnp.asarray(part.int_valid),
                 jnp.asarray(part.sep_ids), jnp.asarray(part.sep_valid),
                 jnp.asarray(part.lei), jnp.asarray(part.lej),
                 jnp.asarray(part.lei_loc), jnp.asarray(part.lej_loc),
                 jnp.asarray(part.z), jnp.asarray(part.omega),
                 jnp.asarray(part.edge_mask), jnp.asarray(part.robust),
                 jnp.float32(robust_phi), jnp.float32(damping))


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _schur_step_cached(mesh, nodes, node_mask, part, robust_phi=1.0,
                       damping=0.0, *, axis="d"):
    """Module-level jit of the Schur GN step: the partition arrays are
    ARGUMENTS (not closure constants), and partition_graph buckets its
    capacities to powers of two — so repeated optimize calls on a
    growing graph reuse compiled programs instead of re-tracing every
    online-BA invocation."""
    return gn_step_schur_sharded(mesh, nodes, node_mask, part, robust_phi,
                                 damping, axis=axis)


@partial(jax.jit, static_argnames=("mesh", "axis", "cg_iters"))
def _cg_step_cached(mesh, nodes, node_mask, ei, ej, z, omega, edge_mask,
                    fix_node, robust_mask=None, robust_phi=1.0,
                    damping=0.0, *, axis="d", cg_iters=100):
    """Module-level jit of the PCG GN step (see _schur_step_cached)."""
    return gn_step_cg_sharded(mesh, nodes, node_mask, ei, ej, z, omega,
                              edge_mask, fix_node, robust_mask, robust_phi,
                              damping, axis=axis, cg_iters=cg_iters)


def schur_within_limits(part: SchurPartition, *, max_separators: int,
                        cg_node_threshold: int, dense_budget: int) -> bool:
    """Shared Schur-vs-PCG selection predicate (used by
    PoseGraph2D._optimize_distributed and ScaledPipeline.time_gn_step so
    the benchmarked strategy is the executed one): dense closure clusters
    blow up the separator set, and the per-device dense block
    (3(i_cap+s))^2 f32 is bounded by both the memory budget and the TPU
    LU custom call's scoped-VMEM ceiling (see pose_graph.py)."""
    sep_count = int(np.sum(part.sep_valid))
    i_cap = int(part.int_ids.shape[1])
    s_cap = int(part.sep_ids.shape[0])
    dense_bytes = (3 * (i_cap + s_cap)) ** 2 * 4
    return not (sep_count > max_separators
                or i_cap > cg_node_threshold
                or dense_bytes > dense_budget)


def optimize_cg(mesh: Mesh, nodes, node_mask, ei, ej, z, omega, edge_mask,
                fix_node: int = 0, *, n_iterations: int = 20,
                convergence_eps=1e-6, cg_iters: int = 100, axis: str = "d",
                robust_mask=None, robust_phi: float = 1.0,
                damping: float = 0.0):
    """Full Gauss-Newton via the matrix-free PCG step — the scale path
    when the Schur reduction stops being cheap (separator blowup from
    dense closure clusters, or interiors too large to factor densely:
    the per-device dense block is (3(i_cap+s))^2 f32, which at 50k nodes
    on small meshes exceeds HBM). Never materializes H; each GN iteration
    is cg_iters Hx products, each one edge gather/compute/scatter + one
    psum. Edge arrays are padded here to a mesh-size multiple.

    Replaces the reference's dense solve
    (/root/reference/utilities/pose_graph.py:92-127) in the regime its
    O(n^3)/O(n^2) costs cannot reach. Returns (nodes, iters_run).
    """
    n_dev = mesh.shape[axis]
    e = ei.shape[0]
    if robust_mask is None:
        robust_mask = np.zeros(e, bool)
    pad = (-e) % n_dev
    if pad:
        zp = np.zeros
        ei = np.concatenate([np.asarray(ei), zp(pad, np.int32)])
        ej = np.concatenate([np.asarray(ej), zp(pad, np.int32)])
        z = np.concatenate([np.asarray(z), zp((pad, 3), np.float32)])
        omega = np.concatenate([np.asarray(omega),
                                zp((pad, 3, 3), np.float32)])
        edge_mask = np.concatenate([np.asarray(edge_mask),
                                    zp(pad, bool)])
        robust_mask = np.concatenate([np.asarray(robust_mask),
                                      zp(pad, bool)])
    args = tuple(jnp.asarray(a) for a in (ei, ej, z, omega, edge_mask))
    rb = jnp.asarray(robust_mask)
    step = lambda nd, nm: _cg_step_cached(
        mesh, nd, nm, *args, jnp.int32(fix_node), rb,
        jnp.float32(robust_phi), jnp.float32(damping),
        axis=axis, cg_iters=cg_iters)
    it = 0
    for it in range(1, n_iterations + 1):
        new = step(nodes, node_mask)
        dn = float(jnp.linalg.norm(
            jnp.where(node_mask[:, None], new - nodes, 0.0)))
        nodes = new
        if dn < convergence_eps:
            break
    return nodes, it


def optimize_schur(mesh: Mesh, nodes, node_mask, part: SchurPartition, *,
                   n_iterations: int = 20, convergence_eps=1e-6,
                   axis: str = "d", robust_phi: float = 1.0,
                   damping: float = 0.0):
    """Full Gauss-Newton optimize via the distributed Schur step.

    The partition depends only on graph TOPOLOGY (edges/chunks), not poses,
    so one ``partition_graph`` call serves every iteration. Convergence
    semantics mirror the reference (stop when ||dx|| < eps,
    /root/reference/utilities/pose_graph.py:129-132), checked on host
    between device steps. Returns (nodes, iters_run).
    """
    step = lambda nd, nm: _schur_step_cached(mesh, nd, nm, part,
                                             jnp.float32(robust_phi),
                                             jnp.float32(damping),
                                             axis=axis)
    it = 0
    for it in range(1, n_iterations + 1):
        new = step(nodes, node_mask)
        dn = float(jnp.linalg.norm(
            jnp.where(node_mask[:, None], new - nodes, 0.0)))
        nodes = new
        if dn < convergence_eps:
            break
    return nodes, it
