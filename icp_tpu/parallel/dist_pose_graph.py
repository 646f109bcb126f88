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
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icp_tpu.models.pose_graph import (
    ANCHOR_WEIGHT, edge_terms, _block_products, _scatter_dense,
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
                       edge_mask, fix_node, *, axis: str = "d",
                       cg_iters: int = 50, cg_tol=1e-8):
    """One matrix-free GN step: block-Jacobi preconditioned CG over
    psum-combined edge shards. Never forms H. Returns updated nodes."""
    n = nodes.shape[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def _step(nd, nm, lei, lej, lz, lom, lem, fix):
        e, A, B = edge_terms(nd, lei, lej, lz, lom, lem)
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
        Minv = _inv3x3(Dblk)

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

    return _step(nodes, node_mask, ei, ej, z, omega, edge_mask, fix_node)
