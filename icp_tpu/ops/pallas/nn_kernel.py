"""Pallas TPU kernel: tiled brute-force nearest-neighbor (2D points).

The XLA formulation (icp_tpu.ops.nn) materializes the (N, M) squared
distance matrix in HBM before the row argmin. This kernel streams target
tiles through VMEM and keeps a running (min, argmin) per source row in
scratch, so HBM traffic is O(N + M) instead of O(N*M) — the difference
matters once M reaches submap scale (10^4-10^5 points).

For 2D points the distance needs 4 VPU flops/pair; no MXU matmul is
involved, so the kernel is purely bandwidth/VPU bound and tiles are chosen
for lane alignment: source coordinates as (N, 1) columns, target
coordinates as (1, M) rows, distance blocks (TN, TM).

Grid iterates target tiles innermost; TPU grid execution is sequential per
core, so the scratch accumulator carries across j steps and results are
written on the last target tile (standard streaming-reduction pattern).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _nn_kernel(sx_ref, sy_ref, tx_ref, ty_ref, tm_ref,
               dist_ref, idx_ref, best_d_ref, best_i_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    TM = tx_ref.shape[1]

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, BIG)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    sx = sx_ref[:]                        # (TN, 1)
    sy = sy_ref[:]
    tx = tx_ref[:]                        # (1, TM)
    ty = ty_ref[:]
    ddx = sx - tx                         # (TN, TM)
    ddy = sy - ty
    d2 = ddx * ddx + ddy * ddy
    d2 = jnp.where(tm_ref[:] != 0, d2, BIG)

    local_min = jnp.min(d2, axis=1, keepdims=True)              # (TN, 1)
    local_arg = jnp.argmin(d2, axis=1).reshape(-1, 1)           # (TN, 1)
    global_arg = (j * TM + local_arg).astype(jnp.int32)

    better = local_min < best_d_ref[:]
    best_i_ref[:] = jnp.where(better, global_arg, best_i_ref[:])
    best_d_ref[:] = jnp.where(better, local_min, best_d_ref[:])

    @pl.when(j == nj - 1)
    def _():
        dist_ref[:] = best_d_ref[:]
        idx_ref[:] = best_i_ref[:]


def _nn_min_kernel(sx_ref, sy_ref, tx_ref, ty_ref, tm_ref,
                   dist_ref, best_d_ref):
    """Min-only variant of _nn_kernel: no argmin bookkeeping.

    Used by the angle-sweep scorer (icp_tpu.ops.sweep), which needs only
    min_j ||p_i - q_j||^2 per row — the (A*N, M) distance matrix the XLA
    formulation materializes (~0.6 GB at submap sweep shapes) never leaves
    VMEM here.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d_ref[:] = jnp.full_like(best_d_ref, BIG)

    ddx = sx_ref[:] - tx_ref[:]                                 # (TN, TM)
    ddy = sy_ref[:] - ty_ref[:]
    d2 = ddx * ddx + ddy * ddy
    d2 = jnp.where(tm_ref[:] != 0, d2, BIG)
    best_d_ref[:] = jnp.minimum(best_d_ref[:],
                                jnp.min(d2, axis=1, keepdims=True))

    @pl.when(j == nj - 1)
    def _():
        dist_ref[:] = best_d_ref[:]


@partial(jax.jit, static_argnames=("tn", "tm", "interpret"))
def nn_min_pallas(source, target, tgt_mask, *, tn: int = 256,
                  tm: int = 1024, interpret: bool = False):
    """Min squared distance from each source row to any valid target.

    source (N, 2), target (M, 2), tgt_mask (M,) bool. Arbitrary N/M —
    padded internally (padded targets masked out, padded source rows
    sliced off). Returns (N,) f32; BIG where no valid target exists.
    """
    n = source.shape[0]
    m = target.shape[0]
    n_p = -(-n // tn) * tn
    m_p = -(-m // tm) * tm
    src = jnp.pad(source.astype(jnp.float32), ((0, n_p - n), (0, 0)))
    tgt = jnp.pad(target.astype(jnp.float32), ((0, m_p - m), (0, 0)))
    msk = jnp.pad(tgt_mask, (0, m_p - m))

    sx = src[:, 0:1]
    sy = src[:, 1:2]
    tx = tgt[:, 0].reshape(1, m_p)
    ty = tgt[:, 1].reshape(1, m_p)
    tmk = msk.astype(jnp.float32).reshape(1, m_p)

    grid = (n_p // tn, m_p // tm)
    dist = pl.pallas_call(
        _nn_min_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sx, sy, tx, ty, tmk)
    return dist[:n, 0]


@partial(jax.jit, static_argnames=("tn", "tm"))
def nn_pallas(source, target, tgt_mask, *, tn: int = 256, tm: int = 512):
    """Nearest valid target per source row via the Pallas streaming kernel.

    source (N, 2), target (M, 2), tgt_mask (M,) bool. N % tn == 0 and
    M % tm == 0 required (pad at the call site; padded targets must be
    masked). Returns (sq_dists (N,), indices (N,) int32).
    """
    n = source.shape[0]
    m = target.shape[0]
    assert n % tn == 0 and m % tm == 0, (n, tn, m, tm)

    sx = source[:, 0:1]                   # (N, 1)
    sy = source[:, 1:2]
    tx = target[:, 0].reshape(1, m)       # (1, M)
    ty = target[:, 1].reshape(1, m)
    tmk = tgt_mask.astype(jnp.float32).reshape(1, m)

    grid = (n // tn, m // tm)
    dist, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tn, 1), jnp.float32),
            pltpu.VMEM((tn, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(sx, sy, tx, ty, tmk)
    return dist[:, 0], idx[:, 0]
