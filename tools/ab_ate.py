"""ATE A/B harness: run the bench config on the bench sequence with
config overrides and print indexed ATE + correction stats.

Usage:
  python tools/ab_ate.py                    # base bench config
  python tools/ab_ate.py sub_rot_fine=0.05 submap_voxel=0.05
  AB_SCANS=120 python tools/ab_ate.py ...   # shorter sequence

Runs on whatever backend is live (CPU by default outside axon; the ATE
of the f32 programs matches TPU to sub-mm — BENCHMARKS.md quotes CPU
A/Bs for exactly this purpose). The chase target is VERDICT r3 weak #6:
default-config ATE 0.0487 vs the NumPy baseline's 0.0463 m.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    import jax
    if os.environ.get("AB_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    from icp_tpu.utils.config import SlamConfig
    from icp_tpu.services.lidar import LidarService
    from icp_tpu.services.imu import IMUService
    from icp_tpu.engine import SlamEngine, filter_and_flatten
    from icp_tpu.utils.metrics import ate as ate_fn

    overrides = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        overrides[k] = v

    cfg = SlamConfig.from_dict({
        "data_file": "data/bench_lidar.csv",
        "imu": {"enabled": True, "file": "data/bench_imu.csv",
                "narrow_search_range": 3.0},
        "icp": {"method": "point_to_line", "normal_k": 16, "voxel_size": 0.04,
                "error_threshold": 1e-10, "max_iterations": 150,
                "error_reject_threshold": 0.5},
        "features": {"method": "rotation_search", "rotation_voxel_size": 0.15,
                     "angle_step_coarse": 1.5, "angle_step_fine": 0.1},
        "submap": {"enabled": True, "size": 40, "voxel_size": 0.05,
                   "max_corr_dist": 1.5, "rotation_range": 60.0,
                   "rotation_step": 0.8, "rotation_fine_step": 0.05,
                   "rotation_voxel_size": 0.15},
        "loop_closure": {"enabled": False},
        "filter": {"z_min": 0.5, "z_max": 2.0},
        "mapping": {"resolution": 0.05, "margin": 50.0},
        "tpu": {"scan_capacity": 768, "submap_capacity": 4096,
                "max_ray_cells": 448, "batch_scans": 16},
    })
    for k, v in overrides.items():
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            setattr(cfg, k, v.lower() in ("1", "true"))
        elif isinstance(cur, int):
            setattr(cfg, k, int(v))
        elif isinstance(cur, float):
            setattr(cfg, k, float(v))
        else:
            setattr(cfg, k, v)

    scans, rels = [], []
    for ts, rel, raw in LidarService("data/bench_lidar.csv").scans():
        scans.append(filter_and_flatten(raw, cfg.z_min, cfg.z_max))
        rels.append(rel)
    n_scans = int(os.environ.get("AB_SCANS", len(scans)))
    scans, rels = scans[:n_scans], rels[:n_scans]
    gt = np.load("data/bench_gt.npy")
    # AB_IMU=0 reproduces bench_suite's features row, which runs BOTH
    # modes IMU-less so the prealigner does all the rotation work
    imu = (IMUService("data/bench_imu.csv")
           if os.environ.get("AB_IMU", "1") == "1" else None)
    if imu is None:
        cfg.imu_enabled = False

    t0 = time.perf_counter()
    eng = SlamEngine(cfg, imu=imu, verbose=False)
    B = cfg.batch_scans
    eng.process_scan(scans[0], rels[0])
    for k in range(1, len(scans), B):
        eng.process_scans_batched(scans[k:k + B], rels[k:k + B])
    eng.finish()
    wall = time.perf_counter() - t0

    est = np.stack([p[:2, 2] for p in eng.pose_trajectory])
    a = ate_fn(est, gt, indices=eng.pose_scan_indices)
    print(f"overrides={overrides}  ATE={a:.4f} m  "
          f"poses={len(est)}  rejected={eng.stats.rejected}  "
          f"submap_corr={eng.stats.submap_corrections}  "
          f"sweep_drop={eng.stats.sweep_dropped_voxels}  "
          f"wall={wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
