"""Raytrace/scatter design-space timing on the real TPU.

Measures, at bench shapes (grid 2365x2485, N=1024 rays, S=640 steps):
  * raytrace_update (current: windowed if 2*max_steps < grid)
  * full-grid scatter variant (pre-window behavior)
  * raw scatter cost into operands of different sizes
  * 655k-element 1-key sort (for a compaction design)
  * emission (bresenham_cells) alone

Usage: python tools/profile_raytrace.py
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
from jax import lax

from icp_tpu.ops.raytrace import bresenham_cells, raytrace_update

K = 32


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
    ny, nx = 2365, 2485
    N, S = 1024, 640
    rng = np.random.default_rng(0)
    grid = jnp.zeros((ny, nx), jnp.float32)
    origin = jnp.asarray([1200, 1240], jnp.int32)
    # realistic ray-length mix: mean ~8 m (160 cells), max ~438
    r = np.minimum(rng.gamma(3.0, 60.0, N), 438).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, N)
    hits = (np.asarray(origin)[None, :]
            + np.stack([r * np.cos(th), r * np.sin(th)], 1)).astype(np.int32)
    hits = jnp.asarray(hits)
    valid = jnp.ones(N, bool)
    args = (jnp.float32(0.85), jnp.float32(-0.4),
            jnp.float32(-8.0), jnp.float32(8.0))
    fl = floor_time()
    print(f"floor {fl*1e3:.2f} ms; mean ray {r.mean():.0f} cells, "
          f"max {r.max():.0f}", flush=True)

    def report(name, t, k=K):
        print(f"{name:44s} {(t - fl)/k*1e3:8.3f} ms", flush=True)

    # current raytrace_update (windowed, W=1280)
    def body(g):
        return raytrace_update(g, origin, hits, valid, *args, max_steps=S)
    report("raytrace_update windowed S=640", bench_rep(body, grid))

    def body(g):
        return raytrace_update(g, origin, hits, valid, *args, max_steps=256)
    report("raytrace_update windowed S=256", bench_rep(body, grid))

    # full-grid scatter variant (original)
    def rt_full(log_odds, origin_cell, hit_cells, valid_, lh, lm, lo, hi,
                max_steps):
        ny_, nx_ = log_odds.shape
        hx, hy = hit_cells[:, 0], hit_cells[:, 1]
        hit_in = valid_ & (hx >= 0) & (hx < nx_) & (hy >= 0) & (hy < ny_)
        hx_s = jnp.where(hit_in, hx, nx_)
        log_odds = log_odds.at[hy, hx_s].add(
            jnp.where(hit_in, lh, 0.0), mode="drop")
        cells, active = bresenham_cells(origin_cell, hit_cells, valid_,
                                        max_steps=max_steps)
        fx = cells[..., 0].reshape(-1)
        fy = cells[..., 1].reshape(-1)
        act = active.reshape(-1)
        in_b = act & (fx >= 0) & (fx < nx_) & (fy >= 0) & (fy < ny_)
        fx_s = jnp.where(in_b, fx, nx_)
        log_odds = log_odds.at[fy, fx_s].add(
            jnp.where(in_b, lm, 0.0), mode="drop")
        return jnp.clip(log_odds, lo, hi)

    def body(g):
        return rt_full(g, origin, hits, valid, *args, S)
    report("raytrace full-grid scatter S=640", bench_rep(body, grid))

    # emission alone
    def body(c):
        h, acc = c
        cells, active = bresenham_cells(origin, h, valid, max_steps=S)
        return h + cells[0, 0] * 0 + jnp.int32(acc * 0), acc + cells[0, 0, 0]
    report("bresenham emission alone S=640",
           bench_rep(body, (hits, jnp.int32(0))))

    # raw scatter: 655k updates into operands of various sizes
    cells, active = bresenham_cells(origin, hits, valid, max_steps=S)
    E = S * N
    for Wop in (512, 1280, None):
        if Wop is None:
            tgt_shape, name = (ny, nx), f"raw scatter {E} -> full grid"
            fy = cells[..., 1].reshape(-1)
            fx = cells[..., 0].reshape(-1)
        else:
            tgt_shape = (Wop, Wop)
            name = f"raw scatter {E} -> ({Wop},{Wop})"
            fy = cells[..., 1].reshape(-1) % Wop
            fx = cells[..., 0].reshape(-1) % Wop
        act = active.reshape(-1)
        fx_s = jnp.where(act, fx, tgt_shape[1])
        vals = jnp.where(act, -0.4, 0.0)

        def body(c):
            d, acc = c
            d2 = d.at[fy, fx_s].add(vals + acc * 0, mode="drop")
            return d2 * 0.5, acc + d2[0, 0]
        report(name, bench_rep(
            body, (jnp.zeros(tgt_shape, jnp.float32), jnp.float32(0)), k=8),
            k=8)

    # 1D scatter (flat indices) into full grid
    flat = (cells[..., 1].reshape(-1).astype(jnp.int64) * nx
            + cells[..., 0].reshape(-1))
    act = active.reshape(-1)
    flat_s = jnp.where(act, flat, ny * nx).astype(jnp.int32)
    vals = jnp.where(act, -0.4, 0.0)

    def body(c):
        d, acc = c
        d2 = d.at[flat_s].add(vals + acc * 0, mode="drop")
        return d2 * 0.5, acc + d2[0]
    report(f"raw 1D scatter {E} -> flat grid", bench_rep(
        body, (jnp.zeros(ny * nx, jnp.float32), jnp.float32(0)), k=8), k=8)

    # sort cost: 655k 1-key with 1 payload (compaction feasibility)
    keys = jnp.asarray(rng.integers(0, 1 << 30, E), jnp.int32)
    pay = jnp.asarray(rng.integers(0, 1 << 30, E), jnp.int32)

    def body(c):
        kk, acc = c
        s = lax.sort((kk, pay), num_keys=1, is_stable=False)
        return kk + jnp.int32(acc * 0) + s[0] * 0 + (s[0][0] - s[0][0]), \
            acc + s[0][0] + s[1][0]
    # note: dependency via acc uses s[0][0]; the *0 trick is avoided
    def body(c):
        kk, acc = c
        s = lax.sort((kk + jnp.int32(acc % 2), pay), num_keys=1,
                     is_stable=False)
        return kk, acc + s[0][0] + s[1][0]
    report(f"sort {E} 1-key + payload", bench_rep(
        body, (keys, jnp.int32(0)), k=4), k=4)


if __name__ == "__main__":
    main()
