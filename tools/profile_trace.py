"""Capture a jax.profiler trace of the steady-state fused batch step.

Writes a TensorBoard/perfetto trace into data/trace/ and prints the
top device ops by self time parsed from the .trace.json.gz (no
tensorboard needed).

Usage: python tools/profile_trace.py
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax


def main():
    from icp_tpu.utils.synth import generate_sequence
    from icp_tpu.utils.config import SlamConfig
    from icp_tpu.services.lidar import LidarService
    from icp_tpu.services.imu import IMUService
    from icp_tpu.engine import SlamEngine, filter_and_flatten

    os.makedirs("data", exist_ok=True)
    lidar_csv, imu_csv = "data/bench_lidar.csv", "data/bench_imu.csv"
    if not (os.path.exists(lidar_csv) and os.path.exists(imu_csv)):
        generate_sequence(lidar_csv, imu_csv, n_scans=200, n_beams=720,
                          noise=0.005, trajectory="loop", seed=42)

    cfg = SlamConfig.from_dict({
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
                "max_ray_cells": 640, "batch_scans": 16},
    })

    scans, rels = [], []
    for ts, rel, raw in LidarService(lidar_csv).scans():
        scans.append(filter_and_flatten(raw, 0.5, 2.0))
        rels.append(rel)
    imu = IMUService(imu_csv)

    B = cfg.batch_scans
    engine = SlamEngine(cfg, imu=imu, verbose=False)
    engine.process_scan(scans[0], rels[0])
    for k in range(1, 1 + 4 * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()

    trace_dir = "data/trace"
    jax.profiler.start_trace(trace_dir)
    k0 = 1 + 4 * B
    for k in range(k0, k0 + 4 * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # parse the perfetto trace: per-op self time on device tracks
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace json found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # find device process ids (TPU / device named tracks)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    print("processes:", {p: n for p, n in pid_names.items()})
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            tot[name] += dur
            cnt[name] += 1
            total += dur
    print(f"\ntotal device op time: {total/1e3:.2f} ms over 64 scans "
          f"({total/1e3/64:.3f} ms/scan)")
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for name, d in top:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
