"""Sweep tpu.batch_scans to find the throughput-optimal batch size.

Each batch is ONE device dispatch (models/slam_step.batch); the fixed
per-dispatch cost (network-tunnel round trip + scan-loop prologue) is
amortized over the batch, so throughput should rise with B until compile
time / HBM working set pushes back.

Usage: python tools/profile_batchsize.py [B ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def run_engine(cfg_dict, scans, rels, imu, B):
    from icp_tpu.engine import SlamEngine
    from icp_tpu.utils.config import SlamConfig

    cfg_dict = dict(cfg_dict)
    cfg_dict["tpu"] = dict(cfg_dict["tpu"], batch_scans=B)
    cfg = SlamConfig.from_dict(cfg_dict)
    engine = SlamEngine(cfg, imu=imu, verbose=False)
    engine.process_scan(scans[0], rels[0])
    WARM = 3
    for k in range(1, 1 + WARM * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    start = 1 + WARM * B
    n_timed = ((len(scans) - start) // B) * B
    t0 = time.perf_counter()
    for k in range(start, start + n_timed, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    dt = time.perf_counter() - t0
    return n_timed / dt, n_timed


def main():
    from icp_tpu.utils.synth import generate_sequence
    from icp_tpu.services.lidar import LidarService
    from icp_tpu.services.imu import IMUService
    from icp_tpu.engine import filter_and_flatten

    os.makedirs("data", exist_ok=True)
    lidar_csv, imu_csv = "data/bench_lidar.csv", "data/bench_imu.csv"
    if not (os.path.exists(lidar_csv) and os.path.exists(imu_csv)):
        generate_sequence(lidar_csv, imu_csv, n_scans=200, n_beams=720,
                          noise=0.005, trajectory="loop", seed=42)

    cfg_dict = {
        "data_file": lidar_csv,
        "imu": {"enabled": True, "file": imu_csv, "narrow_search_range": 3.0},
        "icp": {"method": "point_to_line", "normal_k": 12, "voxel_size": 0.04,
                "error_threshold": 1e-10, "max_iterations": 150,
                "error_reject_threshold": 0.5},
        "features": {"method": "rotation_search"},
        "submap": {"enabled": True, "size": 40, "voxel_size": 0.04,
                   "max_corr_dist": 1.5, "rotation_fine_step": 0.1,
                   "rotation_voxel_size": 0.2},
        "loop_closure": {"enabled": False},
        "filter": {"z_min": 0.5, "z_max": 2.0},
        "mapping": {"resolution": 0.05, "margin": 50.0},
        "display": {"live_map": False},
        "tpu": {"scan_capacity": 768, "submap_capacity": 4096,
                "max_ray_cells": 640},
    }

    scans, rels = [], []
    for ts, rel, raw in LidarService(lidar_csv).scans():
        scans.append(filter_and_flatten(raw, 0.5, 2.0))
        rels.append(rel)
    imu = IMUService(imu_csv)

    Bs = [int(a) for a in sys.argv[1:]] or [16, 32, 48]
    for B in Bs:
        sps, n = run_engine(cfg_dict, scans, rels, imu, B)
        print(f"B={B:3d}: {sps:7.1f} scans/s  ({n} scans timed)", flush=True)


if __name__ == "__main__":
    main()
