"""Component-level profile of the fused SLAM step on the real TPU.

Reproduces the bench config, runs the engine to steady state, snapshots the
device state, then times each sub-program of models/slam_step.py standalone
on the REAL steady-state inputs. On the network-attached TPU,
block_until_ready does not block (BENCHMARKS.md), so every timing fetches a
scalar to host; per-call cost is measured by running the op N times with a
data dependency chain where possible, else N independent dispatches with one
final fetch (dispatch pipelining makes that a throughput bound, which is
what the batched step sees anyway).

Usage: python tools/profile_step.py
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
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, n=30, **kw):
    """Median wall time of fn(*args) with a host fetch per call."""
    out = fn(*args, **kw)
    fetch(out)                      # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from icp_tpu.utils.synth import generate_sequence
    from icp_tpu.utils.config import SlamConfig
    from icp_tpu.services.lidar import LidarService
    from icp_tpu.services.imu import IMUService
    from icp_tpu.engine import SlamEngine, filter_and_flatten
    from icp_tpu.models.icp import icp_core
    from icp_tpu.models.prealign import submap_rotation_search
    from icp_tpu.ops.voxel import voxel_downsample, voxel_downsample_fixed
    from icp_tpu.ops.raytrace import raytrace_update
    from icp_tpu.ops.sweep import sweep_scores
    from icp_tpu.utils import se2

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
        "features": {"method": "rotation_search",
                     "rotation_voxel_size": 0.15,
                     "angle_step_coarse": 1.5, "angle_step_fine": 0.1},
        "submap": {"enabled": True, "size": 40, "voxel_size": 0.04,
                   "max_corr_dist": 1.5, "rotation_range": 60.0,
                   "rotation_step": 0.8, "rotation_fine_step": 0.1,
                   "rotation_voxel_size": 0.2},
        "loop_closure": {"enabled": False},
        "filter": {"z_min": 0.5, "z_max": 2.0},
        "mapping": {"resolution": 0.05, "margin": 50.0},
        "display": {"live_map": False},
        "tpu": {"scan_capacity": 1024, "submap_capacity": 8192,
                "max_ray_cells": 640, "batch_scans": 16},
    })

    scans, rels = [], []
    for ts, rel, raw in LidarService(lidar_csv).scans():
        scans.append(filter_and_flatten(raw, cfg.z_min, cfg.z_max))
        rels.append(rel)
    imu = IMUService(imu_csv)

    B = cfg.batch_scans
    engine = SlamEngine(cfg, imu=imu, verbose=False)
    engine.process_scan(scans[0], rels[0])
    # run to steady state (full submap ring)
    for k in range(1, 1 + 4 * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    state = engine._state
    print("steady state reached; profiling ...", flush=True)

    # ── end-to-end batch step ────────────────────────────────────────────
    k0 = 1 + 4 * B
    pts, msk, deltas, yaws = engine._pack_batch(
        scans[k0:k0 + B], rels[k0:k0 + B], B, engine.prev_rel_time)
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)
    deltas, yaws = jnp.asarray(deltas), jnp.asarray(yaws)

    def run_batch(state):
        st, outs = engine._batch_fn(state, pts, msk, deltas, yaws)
        return st, outs

    # donated arg: rebuild state each call; time includes the (tiny) state
    # rebuild upload? No: clone on device first.
    def clone(st):
        return jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, 'dtype')
                                      else x, st)

    st = clone(state)
    st2, outs = run_batch(st)
    fetch(outs.pose)
    ts = []
    for _ in range(10):
        st = clone(state)
        fetch(st.ring_idx)
        t0 = time.perf_counter()
        st2, outs = run_batch(st)
        fetch(outs.pose)
        ts.append(time.perf_counter() - t0)
    t_batch = float(np.median(ts))
    print(f"batch step (B={B}):        {t_batch*1e3:8.2f} ms "
          f"({t_batch/B*1e3:.2f} ms/scan)")

    # ── realistic single-scan inputs at steady state ─────────────────────
    cur = pts[0]
    cur_m = msk[0]
    prev = state.prev_pts
    prev_m = state.prev_mask
    icp_voxel = float(cfg.icp_voxel)

    # voxel downsample of one scan
    vd = jax.jit(lambda p, m: voxel_downsample(p, m, icp_voxel))
    t = timeit(vd, cur, cur_m)
    print(f"voxel_downsample 1024:     {t*1e3:8.2f} ms")

    # submap voxelization (40960 -> 8192)
    flat_pts = state.ring_pts.reshape(-1, 2)
    flat_msk = state.ring_mask.reshape(-1)
    vdf = jax.jit(lambda p, m: voxel_downsample_fixed(
        p, m, float(cfg.submap_voxel), int(cfg.submap_capacity)))
    t = timeit(vdf, flat_pts, flat_msk)
    print(f"submap voxelize 40960:     {t*1e3:8.2f} ms")
    sub_pts, sub_mask = vdf(flat_pts, flat_msk)
    n_sub = int(jnp.sum(sub_mask))
    print(f"  (submap valid pts: {n_sub})")

    # s2s ICP (p2l, IMU init)
    src_d, src_dm = vd(prev, prev_m)
    tgt_d, tgt_dm = vd(cur, cur_m)
    R0 = se2.rotmat(deltas[0])
    t0v = jnp.zeros(2, jnp.float32)
    s2s = jax.jit(lambda a, am, b, bm, R, t: icp_core(
        a, am, b, bm, R, t, method="point_to_line",
        max_iterations=150, normal_k=12, error_threshold=1e-10))
    res = s2s(src_d, src_dm, tgt_d, tgt_dm, R0, t0v)
    print(f"  s2s iters: {int(res.iters)}  err={float(res.error):.2e}")
    t = timeit(s2s, src_d, src_dm, tgt_d, tgt_dm, R0, t0v)
    print(f"s2s icp (p2l, 150max):     {t*1e3:8.2f} ms")

    # submap rotation search
    pose = state.global_pose
    pred = se2.make_pose(se2.rotmat(yaws[0]), pose[:2, 2])
    srs = jax.jit(lambda c, cm, s, sm, p: submap_rotation_search(
        c, cm, s, sm, p, angle_range=float(cfg.imu_narrow), angle_step=0.5,
        fine_step=float(cfg.sub_rot_fine), voxel_size=float(cfg.sub_rot_voxel)))
    t = timeit(srs, cur, cur_m, sub_pts, sub_mask, pred)
    print(f"submap rotation search:    {t*1e3:8.2f} ms")
    R_s, t_s = srs(cur, cur_m, sub_pts, sub_mask, pred)

    # submap ICP (p2p gated, 1024 x 8192)
    sub_icp = jax.jit(lambda a, am, b, bm, R, t: icp_core(
        a, am, b, bm, R, t, method="point_to_point",
        max_iterations=150, error_threshold=1e-10,
        max_corr_dist=float(cfg.sub_corr_dist), use_gate=True))
    res2 = sub_icp(tgt_d, tgt_dm, sub_pts, sub_mask, R_s, t_s)
    print(f"  submap icp iters: {int(res2.iters)}  "
          f"err={float(res2.error):.2e}  inliers={int(res2.n_inliers)}")
    t = timeit(sub_icp, tgt_d, tgt_dm, sub_pts, sub_mask, R_s, t_s)
    print(f"submap icp (p2p gated):    {t*1e3:8.2f} ms")

    # raytrace update
    gp = se2.transform_points(cur, pose)
    grid_min = jnp.array([engine.mapper.min_x, engine.mapper.min_y],
                         jnp.float32)
    inv_res = 1.0 / engine.mapper.resolution
    origin_cell = jnp.floor((pose[:2, 2] - grid_min) * inv_res).astype(
        jnp.int32)
    hit_cells = jnp.floor((gp - grid_min) * inv_res).astype(jnp.int32)
    lo = state.log_odds + 0
    rt = jax.jit(lambda g, o, h, m: raytrace_update(
        g, o, h, m, jnp.float32(engine.mapper.l_hit),
        jnp.float32(engine.mapper.l_miss),
        jnp.float32(engine.mapper.log_odds_min),
        jnp.float32(engine.mapper.log_odds_max),
        max_steps=int(cfg.max_ray_cells)))
    t = timeit(rt, lo, origin_cell, hit_cells, cur_m)
    print(f"raytrace 1024x640:         {t*1e3:8.2f} ms")

    # sweep_scores alone at submap shapes (23 angles x 1024 x 8192)
    angles = jnp.linspace(-0.05, 0.05, 23)
    sw = jax.jit(lambda s, sm_, tg, tm_, a: sweep_scores(
        s, sm_, tg, tm_, a, pose[:2, 2]))
    # voxelized inputs as the search uses
    src_r, src_rm = jax.jit(lambda p, m: voxel_downsample(
        p, m, float(cfg.sub_rot_voxel)))(cur, cur_m)
    tgt_r, tgt_rm = jax.jit(lambda p, m: voxel_downsample(
        p, m, float(cfg.sub_rot_voxel)))(sub_pts, sub_mask)
    t = timeit(sw, src_r, src_rm, tgt_r, tgt_rm, angles)
    print(f"sweep 23x1024x8192:        {t*1e3:8.2f} ms")

    # single dispatch overhead floor
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    t = timeit(tiny, z, n=50)
    print(f"dispatch+fetch floor:      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
