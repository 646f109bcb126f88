"""Sharded correlative sweeps and RANSAC: hypothesis axes over the mesh.

Rotation-search angles and RANSAC hypotheses are embarrassingly parallel
(SURVEY.md §2.2): each device scores its shard of the hypothesis axis
against replicated point clouds, and a single all_gather / argmin combines.
Collectives ride ICI; the clouds (few hundred KB) replicate once.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from icp_tpu.ops.sweep import sweep_scores


def sweep_scores_sharded(mesh: Mesh, source, src_mask, target, tgt_mask,
                         angles, t_offset, *, axis: str = "d",
                         chunk: int = 8):
    """sweep_scores with the angle axis sharded over ``axis``.

    ``angles`` length must be divisible by the mesh size (pad with +inf-score
    angles if needed — caller's responsibility). Returns replicated (A,)
    scores.
    """
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P()),
        out_specs=P(axis),
    )
    def _shard(src, sm, tgt, tm, angs, toff):
        return sweep_scores(src, sm, tgt, tm, angs, toff, chunk=chunk)

    return _shard(source, src_mask, target, tgt_mask, angles, t_offset)
