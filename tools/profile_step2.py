"""Accurate per-op device timing: K on-device repetitions per dispatch.

Each op is wrapped in a lax.scan that re-applies it K times with a real data
dependency (an output-derived scalar perturbs the next input), so XLA cannot
dead-code or hoist the body, and the single dispatch+fetch cost amortizes
over K. Reported time = (t_total - t_floor) / K.

Usage: python tools/profile_step2.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

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
from jax import lax

K = 32


def bench_rep(make_body, carry0, n=5, k=K):
    """Time lax.scan(body, carry0, None, length=k) per-iteration."""
    @jax.jit
    def run(c):
        c, _ = lax.scan(lambda cc, _: (make_body(cc), None), c, None,
                        length=k)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x) if hasattr(x, "dtype") else x, c)

    out = run(carry0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # compile+warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(carry0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def floor_time(n=10):
    f = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(f(z))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(z))
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
        "features": {"method": "rotation_search"},
        "submap": {"enabled": True, "size": 40, "voxel_size": 0.04,
                   "max_corr_dist": 1.5, "rotation_fine_step": 0.1,
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
    for k in range(1, 1 + 4 * B, B):
        engine.process_scans_batched(scans[k:k + B], rels[k:k + B])
    engine.finish()
    state = engine._state
    fl = floor_time()
    print(f"dispatch floor: {fl*1e3:.2f} ms; K={K} reps per dispatch\n",
          flush=True)

    def report(name, t):
        print(f"{name:42s} {(t - fl)/K*1e3:8.3f} ms", flush=True)

    k0 = 1 + 4 * B
    pts, msk, deltas, yaws = engine._pack_batch(
        scans[k0:k0 + B], rels[k0:k0 + B], B, engine.prev_rel_time)
    cur, cur_m = jnp.asarray(pts[0]), jnp.asarray(msk[0])
    prev, prev_m = state.prev_pts, state.prev_mask
    icp_voxel = float(cfg.icp_voxel)

    # perturbation helper: tiny shift derived from a scalar keeps dependency
    def shift(pts_, s):
        return pts_ + (s * 1e-9)

    # ── voxel downsample 1024 @0.04 ──────────────────────────────────────
    def body(c):
        p, acc = c
        o, m = voxel_downsample(p, cur_m, icp_voxel)
        return shift(p, o[0, 0]), acc + o[0, 0]
    t = bench_rep(body, (cur, jnp.float32(0)))
    report("voxel_downsample 1024 @0.04", t)

    # ── submap voxelize 40960 -> 8192 @0.04 ──────────────────────────────
    flat_pts = state.ring_pts.reshape(-1, 2)
    flat_msk = state.ring_mask.reshape(-1)

    def body(c):
        p, acc = c
        o, m = voxel_downsample_fixed(p, flat_msk, float(cfg.submap_voxel),
                                      int(cfg.submap_capacity))
        return shift(p, o[0, 0]), acc + o[0, 0]
    t = bench_rep(body, (flat_pts, jnp.float32(0)), k=8)
    report("submap voxelize 40960->8192 @0.04", t)

    sub_pts, sub_mask = voxel_downsample_fixed(
        flat_pts, flat_msk, float(cfg.submap_voxel), int(cfg.submap_capacity))
    n_sub = int(jnp.sum(sub_mask))
    print(f"    (submap valid: {n_sub})")

    # ── s2s ICP p2l ──────────────────────────────────────────────────────
    vd = jax.jit(lambda p, m: voxel_downsample(p, m, icp_voxel))
    src_d, src_dm = vd(prev, prev_m)
    tgt_d, tgt_dm = vd(cur, cur_m)
    R0 = se2.rotmat(jnp.asarray(deltas[0]))
    t0v = jnp.zeros(2, jnp.float32)

    def body(c):
        s, acc = c
        r = icp_core(s, src_dm, tgt_d, tgt_dm, R0, t0v,
                     method="point_to_line", max_iterations=150,
                     normal_k=12, error_threshold=1e-10)
        return shift(s, r.error), acc + r.error
    t = bench_rep(body, (src_d, jnp.float32(0)))
    report("s2s icp p2l (IMU init, ~6 iters)", t)

    # ── submap rotation search ───────────────────────────────────────────
    pose = state.global_pose
    pred = se2.make_pose(se2.rotmat(jnp.asarray(yaws[0])), pose[:2, 2])

    def body(c):
        p, acc = c
        R_s, t_s = submap_rotation_search(
            p, cur_m, sub_pts, sub_mask, pred,
            angle_range=float(cfg.imu_narrow), angle_step=0.5,
            fine_step=float(cfg.sub_rot_fine),
            voxel_size=float(cfg.sub_rot_voxel))
        return shift(p, t_s[0]), acc + t_s[0]
    t = bench_rep(body, (cur, jnp.float32(0)), k=8)
    report("submap rotation search (8192 tgt)", t)

    srs = jax.jit(partial(
        submap_rotation_search,
        angle_range=float(cfg.imu_narrow), angle_step=0.5,
        fine_step=float(cfg.sub_rot_fine), voxel_size=float(cfg.sub_rot_voxel)))
    R_s, t_s = srs(cur, cur_m, sub_pts, sub_mask, pred)

    # ── submap ICP p2p gated 1024 x 8192 ─────────────────────────────────
    def body(c):
        s, acc = c
        r = icp_core(s, tgt_dm, sub_pts, sub_mask, R_s, t_s,
                     method="point_to_point", max_iterations=150,
                     error_threshold=1e-10,
                     max_corr_dist=float(cfg.sub_corr_dist), use_gate=True)
        return shift(s, r.error), acc + r.error
    t = bench_rep(body, (tgt_d, jnp.float32(0)), k=8)
    report("submap icp p2p gated (1024x8192, ~26 it)", t)

    # same at 4096 target capacity
    sub4, sub4_m = sub_pts[:4096], sub_mask[:4096]

    def body(c):
        s, acc = c
        r = icp_core(s, tgt_dm, sub4, sub4_m, R_s, t_s,
                     method="point_to_point", max_iterations=150,
                     error_threshold=1e-10,
                     max_corr_dist=float(cfg.sub_corr_dist), use_gate=True)
        return shift(s, r.error), acc + r.error
    t = bench_rep(body, (tgt_d, jnp.float32(0)), k=8)
    report("submap icp p2p gated (1024x4096)", t)

    # ── raytrace (grid carried through scan; correct dependency) ─────────
    gp = se2.transform_points(cur, pose)
    grid_min = jnp.array([engine.mapper.min_x, engine.mapper.min_y],
                         jnp.float32)
    inv_res = 1.0 / engine.mapper.resolution
    origin_cell = jnp.floor((pose[:2, 2] - grid_min) * inv_res).astype(
        jnp.int32)
    hit_cells = jnp.floor((gp - grid_min) * inv_res).astype(jnp.int32)
    print(f"    (grid shape: {state.log_odds.shape})")

    def body(g):
        return raytrace_update(
            g, origin_cell, hit_cells, cur_m,
            jnp.float32(engine.mapper.l_hit),
            jnp.float32(engine.mapper.l_miss),
            jnp.float32(engine.mapper.log_odds_min),
            jnp.float32(engine.mapper.log_odds_max),
            max_steps=int(cfg.max_ray_cells))
    t = bench_rep(body, state.log_odds + 0)
    report("raytrace 1024 rays x 640 cells", t)

    # ── sweeps: current einsum vs broadcast-diff variant ─────────────────
    vd02 = jax.jit(lambda p, m: voxel_downsample(p, m,
                                                 float(cfg.sub_rot_voxel)))
    src_r, src_rm = vd02(cur, cur_m)
    tgt_r, tgt_rm = vd02(sub_pts, sub_mask)
    print(f"    (0.2-voxel valid: src {int(jnp.sum(src_rm))}, "
          f"tgt {int(jnp.sum(tgt_rm))})")
    angles = jnp.linspace(-0.05, 0.05, 23)

    def body(c):
        a, acc = c
        s = sweep_scores(src_r, src_rm, tgt_r, tgt_rm, a, pose[:2, 2])
        return a + s[0] * 1e-12, acc + s[0]
    t = bench_rep(body, (angles, jnp.float32(0)))
    report("sweep einsum 23 x 1024 x 8192", t)

    from icp_tpu.utils.masking import BIG, masked_mean

    def sweep_bdiff(source, src_mask_, target, tgt_mask_, angs, t_offset,
                    chunk=8):
        A = angs.shape[0]
        pad = (-A) % chunk
        ap = jnp.pad(angs, (0, pad)).reshape(-1, chunk)
        tgt_i = jnp.where(tgt_mask_[:, None], target, BIG)

        def score_chunk(aa):
            R = se2.rotmat(aa)                                  # (C,2,2)
            placed = jnp.einsum("nd,ced->cne", source, R) + t_offset
            d = jnp.sum(
                (placed[:, :, None, :] - tgt_i[None, None, :, :]) ** 2,
                axis=-1)
            dmin = jnp.min(d, axis=-1)
            return masked_mean(dmin, src_mask_[None, :], axis=-1)
        return lax.map(score_chunk, ap).reshape(-1)[:A]

    def body(c):
        a, acc = c
        s = sweep_bdiff(src_r, src_rm, tgt_r, tgt_rm, a, pose[:2, 2])
        return a + s[0] * 1e-12, acc + s[0]
    t = bench_rep(body, (angles, jnp.float32(0)))
    report("sweep bdiff  23 x 1024 x 8192", t)

    # compacted shapes (512 x 2048)
    src_c, src_cm = src_r[:512], src_rm[:512]
    tgt_c, tgt_cm = tgt_r[:2048], tgt_rm[:2048]

    def body(c):
        a, acc = c
        s = sweep_scores(src_c, src_cm, tgt_c, tgt_cm, a, pose[:2, 2])
        return a + s[0] * 1e-12, acc + s[0]
    t = bench_rep(body, (angles, jnp.float32(0)))
    report("sweep einsum 23 x 512 x 2048", t)

    # ── sort variants for the submap voxelize ────────────────────────────
    inv = 1.0 / float(cfg.submap_voxel)
    mb = jnp.min(jnp.where(flat_msk[:, None], flat_pts, jnp.inf), axis=0)
    coords = jnp.floor((flat_pts - mb) * inv).astype(jnp.int32)
    coords = jnp.where(flat_msk[:, None], coords, 2 ** 30)

    def body(c):
        cc, acc = c
        ops = lax.sort((cc[:, 0], cc[:, 1],
                        jnp.arange(cc.shape[0], dtype=jnp.int32)),
                       num_keys=2, is_stable=True)
        return cc + ops[0][0] * 0, acc + ops[0][0]
    t = bench_rep(body, (coords, jnp.int32(0)), k=8)
    report("sort 40960: 2 keys stable + perm", t)

    key1 = coords[:, 0] * 65536 + coords[:, 1]

    def body(c):
        kk, acc = c
        ops = lax.sort((kk, flat_pts[:, 0], flat_pts[:, 1]),
                       num_keys=1, is_stable=False)
        return kk + ops[0][0] * 0, acc + ops[0][0]
    t = bench_rep(body, (key1, jnp.int32(0)), k=8)
    report("sort 40960: 1 fused key unstable + xy", t)

    def body(c):
        kk, acc = c
        ops = lax.sort((kk, flat_pts[:, 0], flat_pts[:, 1]),
                       num_keys=1, is_stable=False)
        return kk + ops[0][0] * 0, acc + ops[0][0]
    t = bench_rep(body, (key1.astype(jnp.float32), jnp.float32(0)), k=8)
    report("sort 40960: 1 f32 key unstable + xy", t)


if __name__ == "__main__":
    main()
