"""In-context attribution: time the fused batch step with pieces stubbed.

Builds variants of models/slam_step.make_slam_step with individual
sub-programs replaced by trivial stand-ins (monkeypatching the module
globals slam_step references at trace time). The time difference between
the full step and a variant is that piece's true in-context cost —
including fusion/layout effects the standalone microbench misses.

Usage: python tools/profile_step3.py
"""
from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

import icp_tpu.models.slam_step as ss
from icp_tpu.models.icp import icp_core as real_icp_core
from icp_tpu.models.icp import ICPResult
from icp_tpu.ops.voxel import voxel_downsample as real_vd
from icp_tpu.ops.voxel import voxel_downsample_fixed as real_vdf
from icp_tpu.ops.raytrace import raytrace_update as real_rt
from icp_tpu.models.prealign import submap_rotation_search as real_srs


@contextmanager
def patched(**repl):
    saved = {k: getattr(ss, k) for k in repl}
    for k, v in repl.items():
        setattr(ss, k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            setattr(ss, k, v)


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
        scans.append(filter_and_flatten(raw, cfg.z_min, cfg.z_max))
        rels.append(rel)
    imu = IMUService(imu_csv)

    # ray-length stats for the max_ray_cells question
    rmax = max(float(np.max(np.linalg.norm(s, axis=1))) for s in scans)
    print(f"max scan range over dataset: {rmax:.2f} m "
          f"-> {int(np.ceil(rmax / 0.05))} cells at 0.05 res", flush=True)

    B = cfg.batch_scans
    engine = SlamEngine(cfg, imu=imu, verbose=False)
    engine.process_scan(scans[0], rels[0])
    for k in range(1, 1 + 4 * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    state = engine._state
    mk_kwargs = dict(
        use_imu=True, prealign="rotation_search",
        icp_method="point_to_line", icp_voxel=0.04, icp_max_iterations=150,
        icp_normal_k=12, icp_error_threshold=1e-10,
        error_reject_threshold=0.5,
        rotation_voxel_size=0.15, angle_step_coarse=1.5, angle_step_fine=0.1,
        # submap_capacity matches bench.py (and the engine state built
        # above) unconditionally so the PROFILE_BATCHED A/B isolates
        # batched_map alone instead of conflating it with a capacity
        # change (ADVICE r3)
        submap_enabled=True, submap_voxel=0.04, submap_capacity=4096,
        sub_rot_range=60.0, sub_rot_step=0.8, sub_rot_fine=0.1,
        sub_rot_voxel=0.2, sub_corr_dist=1.5, imu_narrow=3.0,
        grid_min_x=engine.mapper.min_x, grid_min_y=engine.mapper.min_y,
        grid_resolution=engine.mapper.resolution,
        l_hit=engine.mapper.l_hit, l_miss=engine.mapper.l_miss,
        log_odds_min=engine.mapper.log_odds_min,
        log_odds_max=engine.mapper.log_odds_max,
        max_ray_cells=640,
        free_cells_cap=engine.mapper.free_cells_cap,
    )
    # PROFILE_BATCHED=1: profile the shipping hot path (batched_map dedup
    # raytrace once per chunk) instead of the per-scan-paint step variant
    if os.environ.get("PROFILE_BATCHED"):
        mk_kwargs["batched_map"] = True
    print(f"free_cells_cap={engine.mapper.free_cells_cap}", flush=True)

    k0 = 1 + 4 * B
    pts, msk, deltas, yaws = engine._pack_batch(
        scans[k0:k0 + B], rels[k0:k0 + B], B, engine.prev_rel_time)
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)
    deltas, yaws = jnp.asarray(deltas), jnp.asarray(yaws)

    def clone(st):
        return jax.tree_util.tree_map(lambda x: x + 0, st)

    def time_variant(name, patches, kwargs=None):
        kw = dict(mk_kwargs)
        if kwargs:
            kw.update(kwargs)
        with patched(**patches):
            _, batch_fn = ss.make_slam_step(**kw)
            st = clone(state)
            st2, outs = batch_fn(st, pts, msk, deltas, yaws)
            np.asarray(outs.pose)          # compile+warm
            ts = []
            for _ in range(8):
                st = clone(state)
                np.asarray(st.ring_idx)
                t0 = time.perf_counter()
                st2, outs = batch_fn(st, pts, msk, deltas, yaws)
                np.asarray(outs.pose)
                ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"{name:46s} {t*1e3:8.2f} ms  ({t/B*1e3:5.2f} ms/scan)",
              flush=True)
        return t

    import json
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results_path = ("data/profile3_batched.json"
                    if os.environ.get("PROFILE_BATCHED")
                    else "data/profile3.json")
    results = {}
    if os.path.exists(results_path):
        results = json.load(open(results_path))

    def want(name):
        return which in ("all", name)

    if want("full"):
        results["full"] = time_variant("full step", {})
        json.dump(results, open(results_path, "w"))
    t_full = results.get("full", 0.0)

    # no raytrace
    def rt_stub(g, o, h, m, lh, lm, lo, hi, *, max_steps,
                free_cap=None, unique_cap=None, scan_cap=None):
        return g + lh * 0.0
    if want("nort"):
        t = time_variant("  - raytrace stubbed",
                         {"raytrace_update": rt_stub,
                          "raytrace_update_batched": rt_stub})
        print(f"    => raytrace in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["nort"] = t
        json.dump(results, open(results_path, "w"))
    t_nort = results.get("nort", 0.0)

    # raytrace with max_steps=256
    if want("rt256"):
        t = time_variant("  max_ray_cells=256", {},
                         kwargs={"max_ray_cells": 256})
        print(f"    => raytrace saving vs 640: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["rt256"] = t
        json.dump(results, open(results_path, "w"))

    # no submap rotation search (use predicted pose directly)
    def srs_stub(src, sm, tgt, tm, pred, **kw):
        if kw.get("with_overflow"):
            return (pred[:2, :2], pred[:2, 2], jnp.int32(0), jnp.int32(0))
        return pred[:2, :2], pred[:2, 2]
    if want("nosrs"):
        t = time_variant("  - submap rot search stubbed",
                         {"submap_rotation_search": srs_stub})
        print(f"    => srs in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["nosrs"] = t
        json.dump(results, open(results_path, "w"))

    # no submap ICP (icp_core with use_gate=True stubbed)
    def icp_stub(src, sm, tgt, tm, R0, t0, **kw):
        if kw.get("use_gate"):
            return ICPResult(R0, t0, jnp.float32(0.001), jnp.int32(1),
                             jnp.int32(100))
        return real_icp_core(src, sm, tgt, tm, R0, t0, **kw)
    if want("nosubicp"):
        t = time_variant("  - submap icp stubbed", {"icp_core": icp_stub})
        print(f"    => submap icp in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["nosubicp"] = t
        json.dump(results, open(results_path, "w"))

    # no s2s ICP
    def icp_stub2(src, sm, tgt, tm, R0, t0, **kw):
        if not kw.get("use_gate"):
            return ICPResult(R0, t0, jnp.float32(0.001), jnp.int32(1),
                             jnp.int32(100))
        return real_icp_core(src, sm, tgt, tm, R0, t0, **kw)
    if want("nos2s"):
        t = time_variant("  - s2s icp stubbed", {"icp_core": icp_stub2})
        print(f"    => s2s icp in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["nos2s"] = t
        json.dump(results, open(results_path, "w"))

    # no submap voxelize (slice the ring, no sort)
    def vdf_stub(p, m, v, cap):
        return p[:cap], m[:cap]
    if want("novdf"):
        t = time_variant("  - submap voxelize stubbed",
                         {"voxel_downsample_fixed": vdf_stub})
        print(f"    => submap voxelize in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["novdf"] = t
        json.dump(results, open(results_path, "w"))

    # no per-scan voxel downsample (identity)
    def vd_stub(p, m, v):
        return p, m
    if want("novd"):
        t = time_variant("  - scan voxel downsample stubbed",
                         {"voxel_downsample": vd_stub})
        print(f"    => scan voxelize in-context: {(t_full-t)/B*1e3:.2f} ms/scan")
        results["novd"] = t
        json.dump(results, open(results_path, "w"))

    # everything stubbed except raytrace (sanity floor)
    if want("skeleton"):
        t = time_variant(
            "  only raytrace (rest stubbed)",
            {"submap_rotation_search": srs_stub,
             "icp_core": lambda *a, **kw: ICPResult(
                 a[4], a[5], jnp.float32(0.001), jnp.int32(1), jnp.int32(100)),
             "voxel_downsample_fixed": vdf_stub,
             "voxel_downsample": vd_stub})
        results["skeleton"] = t
        json.dump(results, open(results_path, "w"))
        print(f"    => skeleton+raytrace: {t/B*1e3:.2f} ms/scan")


if __name__ == "__main__":
    main()
