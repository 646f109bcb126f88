"""Per-stage wall profile of the feature-alignment pipeline on the live
backend (run on TPU; the CPU picture is misleading — (N,N) elementwise
passes dominate on CPU while sequential lax.scan latency dominates on TPU).

Note (BENCHMARKS.md): on the network-attached TPU, block_until_ready does
not block — every timing fetches a result element to host instead.
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
import jax
import jax.numpy as jnp


def fetch(r):
    for leaf in jax.tree.leaves(r):
        np.asarray(leaf[(0,) * leaf.ndim]) if leaf.ndim else np.asarray(leaf)
    return r


def t(f, *a, reps=30, **k):
    fetch(f(*a, **k))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a, **k)
    fetch(r)
    return (time.perf_counter() - t0) / reps * 1000, r


def main():
    from icp_tpu.models.features import (
        extract_keypoints, compute_descriptors, match_descriptors,
        compact_matches, feature_based_alignment)
    from icp_tpu.ops.eig2 import compute_curvature
    from icp_tpu.ops.voxel import voxel_downsample
    from icp_tpu.ops.ransac import ransac_align

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    n = int(os.environ.get("N", 768))
    pts = jnp.asarray(rng.normal(0, 3, (n, 2)).astype(np.float32))
    mask = jnp.ones(n, bool)
    key = jax.random.PRNGKey(0)

    ms, _ = t(feature_based_alignment, pts, mask, pts, mask, key,
              voxel_size=0.1, k_curvature=10, top_n=100, min_kp_dist=0.2,
              k_descriptor=16, ratio_threshold=0.8, ransac_iterations=512,
              inlier_threshold=0.3)
    print(f"end-to-end: {ms:7.3f} ms")

    ms, (vp, vm) = t(voxel_downsample, pts, mask, 0.1)
    print(f"voxel:      {ms:7.3f} ms")
    ms, curv = t(compute_curvature, vp, vm, k=10)
    print(f"curvature:  {ms:7.3f} ms")
    ms, (ki, km) = t(extract_keypoints, vp, vm, curv, top_n=100,
                     min_dist=0.2)
    print(f"nms:        {ms:7.3f} ms")
    ms, ds = t(compute_descriptors, vp, vm, ki, km, k=16)
    print(f"desc:       {ms:7.3f} ms")
    ms, (mj, mm) = t(match_descriptors, ds, km, ds, km, 0.8)
    print(f"match:      {ms:7.3f} ms")
    src, dst, pm = compact_matches(vp[ki], vp[ki], mj, mm)
    ms, _ = t(ransac_align, src, dst, pm, key, n_iter=512,
              inlier_thresh=0.3)
    print(f"ransac:     {ms:7.3f} ms")


if __name__ == "__main__":
    main()
