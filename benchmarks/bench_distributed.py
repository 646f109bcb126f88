"""Scaled distributed pose-graph benchmark (BASELINE.json config #5).

Builds a synthetic trajectory-shaped SE(2) graph (odometry chain + periodic
loop closures) at 50k keyframes, runs matrix-free PCG Gauss-Newton steps
with edges sharded over a device mesh, and reports step time + scaling
efficiency across mesh sizes.

Run on CPU with 8 virtual devices to exercise the collectives:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_distributed.py
On the TPU chip it measures single-device throughput of the same program.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_graph(n_nodes: int, lc_every: int = 97, seed: int = 0):
    rng = np.random.default_rng(seed)
    # smooth noisy trajectory
    dyaw = rng.normal(0.02, 0.05, n_nodes)
    yaw = np.cumsum(dyaw)
    step = np.stack([0.5 * np.cos(yaw), 0.5 * np.sin(yaw)], 1)
    xy = np.cumsum(step, 0)
    nodes = np.concatenate([xy, yaw[:, None]], 1).astype(np.float32)
    nodes += rng.normal(scale=0.05, size=nodes.shape).astype(np.float32)

    ei = list(range(n_nodes - 1))
    ej = list(range(1, n_nodes))
    for k in range(lc_every, n_nodes, lc_every):
        ei.append(k)
        ej.append(max(k - lc_every + 3, 0))
    ei = np.asarray(ei, np.int32)
    ej = np.asarray(ej, np.int32)
    # measurements: true relative + noise
    z = []
    for a, b in zip(ei, ej):
        Ta = _pose(nodes[a])
        Tb = _pose(nodes[b])
        T = np.linalg.inv(Ta) @ Tb
        z.append([T[0, 2], T[1, 2], np.arctan2(T[1, 0], T[0, 0])])
    z = np.asarray(z, np.float32) + rng.normal(
        scale=0.01, size=(len(ei), 3)).astype(np.float32)
    om = np.broadcast_to(np.eye(3, dtype=np.float32), (len(ei), 3, 3)).copy()
    return nodes, ei, ej, z, om


def _pose(v):
    c, s = np.cos(v[2]), np.sin(v[2])
    return np.array([[c, -s, v[0]], [s, c, v[1]], [0, 0, 1]], np.float64)


def main():
    import jax
    import jax.numpy as jnp
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.dist_pose_graph import gn_step_cg_sharded

    n_nodes = int(os.environ.get("BENCH_PG_NODES", 50_000))
    nodes, ei, ej, z, om = build_graph(n_nodes)
    n_dev_avail = len(jax.devices())
    print(f"devices: {n_dev_avail} x {jax.devices()[0].platform}",
          file=sys.stderr)

    results = {}
    sizes = sorted({1, min(2, n_dev_avail), min(4, n_dev_avail), n_dev_avail})
    for nd in sizes:
        mesh = make_mesh(nd)
        E = len(ei)
        pad = (-E) % nd
        eip = np.concatenate([ei, np.zeros(pad, np.int32)])
        ejp = np.concatenate([ej, np.zeros(pad, np.int32)])
        zp = np.concatenate([z, np.zeros((pad, 3), np.float32)])
        omp = np.concatenate([om, np.zeros((pad, 3, 3), np.float32)])
        emask = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])

        args = (jnp.asarray(nodes), jnp.ones(n_nodes, bool),
                jnp.asarray(eip), jnp.asarray(ejp), jnp.asarray(zp),
                jnp.asarray(omp), jnp.asarray(emask), jnp.int32(0))
        step_fn = jax.jit(
            lambda *a: gn_step_cg_sharded(mesh, *a, cg_iters=25)
        )
        out = step_fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        REPS = 5
        for _ in range(REPS):
            out = step_fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS
        results[nd] = dt
        print(f"mesh={nd}: GN-CG step {dt*1000:.1f} ms "
              f"({E} edges, {n_nodes} nodes)", file=sys.stderr)

    # Schur-complement reduction (exact solve) at a size where dense
    # per-device interior elimination fits: n/D interior nodes -> (3n/D)^2
    # local factorization. Uses the full mesh.
    from icp_tpu.parallel.dist_pose_graph import (
        partition_graph, gn_step_schur_sharded,
    )
    n_schur = min(n_nodes, int(os.environ.get("BENCH_PG_SCHUR_NODES", 4096)))
    nodes_s, ei_s, ej_s, z_s, om_s = build_graph(n_schur)
    mesh = make_mesh(n_dev_avail)
    part = partition_graph(n_schur, ei_s, ej_s, z_s, om_s,
                           np.ones(len(ei_s), bool), n_dev_avail, 0)
    sargs = (jnp.asarray(nodes_s), jnp.ones(n_schur, bool))
    schur_fn = jax.jit(lambda nd, nm: gn_step_schur_sharded(mesh, nd, nm, part))
    out = schur_fn(*sargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = schur_fn(*sargs)
    jax.block_until_ready(out)
    dt_schur = (time.perf_counter() - t0) / 5
    print(f"mesh={n_dev_avail}: Schur exact GN step {dt_schur*1000:.1f} ms "
          f"({n_schur} nodes, {len(part.sep_ids)} separators)",
          file=sys.stderr)

    base = results[sizes[0]]
    eff = {}
    for nd in sizes[1:]:
        eff[nd] = base / (results[nd] * nd / sizes[0])
    largest = sizes[-1]
    print(json.dumps({
        "metric": "dist_pose_graph_gn_step_ms",
        "value": round(results[largest] * 1000, 2),
        "unit": "ms/step",
        "n_nodes": n_nodes,
        "n_devices": largest,
        "scaling_efficiency": {str(k): round(v, 3) for k, v in eff.items()},
        "schur_exact_step_ms": round(dt_schur * 1000, 2),
        "schur_nodes": n_schur,
        "schur_separators": int(len(part.sep_ids)),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
