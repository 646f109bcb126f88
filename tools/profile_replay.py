"""Replay-throughput profile: keyframes/s of the post-BA sharded-map
repaint (ScaledPipeline._replay_set) vs replay_chunk, on the current
backend. The 50k-keyframe round-4 run paid 118 s for a full 50k repaint
(~423 kf/s); this isolates whether the bound is dispatch count (tunnel
latency x n_chunks), host-side chunk assembly, or device raytrace time.

Run:  python tools/profile_replay.py            (real chip)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.scaled import ScaledPipeline

    n_kf = int(os.environ.get("PROF_REPLAY_KF", 512))
    kf_pts = int(os.environ.get("PROF_REPLAY_PTS", 1500))
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)

    for chunk in (8, 16, 32, 64, 128):
        pipe = ScaledPipeline(
            mesh, scan_capacity=8192, extent=100.0, map_resolution=0.25,
            map_margin=10.0, max_range=35.0,
            map_ray_stride=8, kf_capacity=8192, kf_voxel=0.3,
            submap_keyframes=8, replay_chunk=chunk)
        # synthetic keyframes: ring of wall samples within sensor range
        ang = rng.uniform(0, 2 * np.pi, (n_kf, kf_pts))
        r = rng.uniform(5.0, 34.0, (n_kf, kf_pts))
        pts = np.stack([r * np.cos(ang), r * np.sin(ang)],
                       axis=-1).astype(np.float32)
        pipe.kf_points = [pts[k] for k in range(n_kf)]
        poses = []
        for k in range(n_kf):
            th = 0.001 * k
            c, s = np.cos(th), np.sin(th)
            T = np.array([[c, -s, 0.01 * k], [s, c, 0.0], [0, 0, 1]],
                         np.float32)
            poses.append(T)
        pipe.trajectory = poses

        # warm (compile) on a small slice
        pipe._replay_set(list(range(min(chunk, n_kf))), poses, 1.0)
        jax.block_until_ready(pipe.log_odds)

        t0 = time.perf_counter()
        pipe._replay_set(list(range(n_kf)), poses, 1.0)
        jax.block_until_ready(pipe.log_odds)
        wall = time.perf_counter() - t0
        print(f"chunk {chunk:4d}: {n_kf / wall:8.1f} kf/s  "
              f"({wall * 1000 / n_kf:6.2f} ms/kf, {wall:.2f}s total, "
              f"{-(-n_kf // chunk)} dispatches)", flush=True)


if __name__ == "__main__":
    main()
