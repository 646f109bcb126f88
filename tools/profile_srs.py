"""Submap-rotation-search internals timing at bench shapes."""
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
from jax import lax

from icp_tpu.ops.sweep import sweep_scores
from icp_tpu.ops.nn import nn_query
from icp_tpu.models.prealign import submap_rotation_search

K = 16


def bench_rep(make_body, carry0, n=5, k=K):
    @jax.jit
    def run(c):
        c, _ = lax.scan(lambda cc, _: (make_body(cc), None), c, None,
                        length=k)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x), c)

    out = run(carry0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
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
    rng = np.random.default_rng(0)
    N, M = 512, 2048
    src = jnp.asarray(rng.normal(0, 5, (N, 2)), jnp.float32)
    sm = jnp.asarray(rng.random(N) < 0.7)
    tgt = jnp.asarray(rng.normal(0, 5, (M, 2)), jnp.float32)
    tm = jnp.asarray(rng.random(M) < 0.6)
    coarse = jnp.asarray(np.deg2rad(np.arange(-60, 60.8, 0.8)), jnp.float32)
    fine = jnp.asarray(np.deg2rad(np.arange(-0.8, 0.8, 0.1)), jnp.float32)
    t_off = jnp.zeros(2, jnp.float32)
    pred = jnp.eye(3, dtype=jnp.float32)

    fl = floor_time()
    print(f"floor {fl*1e3:.2f} ms  angles={coarse.shape[0]}", flush=True)

    def report(name, t, k=K):
        print(f"{name:44s} {(t - fl)/k*1e3:8.3f} ms", flush=True)

    def mk_sweep(angles, chunk):
        def body(c):
            s, acc = c
            sc = sweep_scores(s, sm, tgt, tm, angles + acc * 1e-30, t_off,
                              chunk=chunk)
            return s, acc + sc[0]
        return body

    for chunk in (8, 16, 32):
        report(f"coarse sweep 151 ang chunk={chunk}",
               bench_rep(mk_sweep(coarse, chunk), (src, jnp.float32(0))))
    report("fine sweep 16 ang",
           bench_rep(mk_sweep(fine, 8), (src, jnp.float32(0))))

    def body_nn(c):
        s, acc = c
        d, i = nn_query(s + acc * 1e-30, tgt, tm, sm)
        return s, acc + d[0] + i[0]
    report("nn_query 512x2048 (+gather)", bench_rep(body_nn, (src, jnp.float32(0))))

    def body_full(c):
        s, acc = c
        R, t = submap_rotation_search(
            s + acc * 1e-30, sm, tgt, tm, pred,
            angle_range=60.0, angle_step=0.8, fine_step=0.1,
            voxel_size=0.2, src_cap=512, tgt_cap=2048)
        return s, acc + t[0]
    report("submap_rotation_search full (incl voxel)",
           bench_rep(body_full, (src, jnp.float32(0))))


if __name__ == "__main__":
    main()
