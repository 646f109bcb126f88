"""Scaling-efficiency harness — BASELINE's "scans/sec scaling efficiency
at 1 chip / 1 host / 2 hosts" curve from one script.

Sweeps mesh sizes over the available devices and runs the IDENTICAL
scaled-pipeline workload (BASELINE config #5, scaled down by env knobs)
on each, emitting ONE JSON line per mesh size with scans/s, the
distributed GN-step time, and efficiency vs the smallest mesh.

On a real pod slice this script runs as-is on every host:
``icp_tpu.parallel.mesh.init_distributed`` picks up the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables
(no-op on single-process rigs), jax.devices() then spans the slice, and
the sharded programs' collectives ride ICI/DCN. On a dev box with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
the same sweep validates the sharded programs and measures collective
overhead — NOT real speedup (all virtual devices share one host's cores);
each row records backend + virtual-device status so the two cannot be
confused.

Env knobs: BENCH_SCALING_MESHES (default "1,2,4,8", clipped to available
devices), BENCH_SCALING_SCANS (default 120), BENCH_SCALING_POINTS
(default 16384).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(n_dev: int, scans, base_sps=None):
    import jax
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.scaled import ScaledPipeline

    n_points = scans[0].shape[0]
    cap = 1 << int(np.ceil(np.log2(n_points)))
    pipe = ScaledPipeline(
        make_mesh(n_dev),
        scan_capacity=cap, extent=100.0, map_resolution=0.25,
        map_margin=10.0, max_range=35.0,
        icp_max_corr=1.0, icp_max_iterations=30,
        icp_method="point_to_line",
        icp_grid_shape=(160, 160), icp_cell_cap=64, icp_qcells=8192,
        map_ray_stride=8, kf_capacity=4096, kf_voxel=0.3,
        lc_every=8, lc_min_interval=max(50, len(scans) // 10),
        lc_distance=15.0, lc_min_travel=60.0, lc_error_threshold=0.05,
        dist_node_threshold=2,
    )
    WARM = 3
    t0 = None
    for k, scan in enumerate(scans):
        pipe.step(scan)
        if k + 1 == WARM:
            jax.block_until_ready(pipe.log_odds)
            t0 = time.perf_counter()
    pipe.finish()
    jax.block_until_ready(pipe.log_odds)
    wall = time.perf_counter() - t0
    sps = (len(scans) - WARM) / wall
    gn_ms = pipe.time_gn_step(reps=3) * 1000

    row = {
        "metric": "scaling_efficiency",
        "n_devices": n_dev,
        "value": round(sps, 2),
        "unit": "scans/s",
        "gn_step_ms": round(gn_ms, 3),
        "gn_step_strategy": pipe.gn_step_strategy,
        "n_scans": len(scans),
        "points_per_scan": int(n_points),
        "n_processes": jax.process_count(),
        "backend": jax.default_backend(),
        "virtual_devices": ("xla_force_host_platform_device_count"
                            in os.environ.get("XLA_FLAGS", "")),
    }
    if base_sps is not None:
        row["efficiency_vs_smallest"] = round(sps / base_sps, 3)
    return row, sps


def main():
    from icp_tpu.parallel.mesh import init_distributed
    init_distributed()                      # no-op unless a pod slice
    import jax

    avail = len(jax.devices())
    meshes = [int(x) for x in os.environ.get(
        "BENCH_SCALING_MESHES", "1,2,4,8").split(",")]
    meshes = sorted({m for m in meshes if m <= avail})
    n_scans = int(os.environ.get("BENCH_SCALING_SCANS", 120))
    n_points = int(os.environ.get("BENCH_SCALING_POINTS", 16384))
    log(f"devices available: {avail} ({jax.default_backend()}), "
        f"meshes {meshes}, {n_scans} scans x {n_points} pts")

    from icp_tpu.utils.synth import large_scan_stream
    scans = [s for s, _ in large_scan_stream(
        n_scans, n_points=n_points, extent=100.0, max_range=35.0,
        noise=0.02, seed=3)]

    base = None
    for m in meshes:
        row, sps = run_one(m, scans, base)
        if base is None:
            base = sps
        log(f"  mesh={m}: {sps:.2f} scans/s  gn {row['gn_step_ms']} ms")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
